"""Goal-distance (registration) network training.

Self-supervised: sample frame pairs (I_t, I_{t+k}) from trajectories, predict
the flow warping I_t onto I_{t+k}, minimize photometric error + flow
smoothness (the training the reference outsourced with its external
``registration_network`` package).

CLI::

    python -m visual_foresight_tpu.training.train_gdn --data_dir <records> \
        --model_dir <ckpts> [--steps N]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visual_foresight_tpu.models.gdn import GoalDistanceNet
from visual_foresight_tpu.prediction import checkpoints


def smoothness_loss(flow):
    dr = jnp.diff(flow, axis=1)
    dc = jnp.diff(flow, axis=2)
    return jnp.mean(jnp.abs(dr)) + jnp.mean(jnp.abs(dc))


def make_train_step(model, tx, smooth_weight=0.01):
    def loss_fn(params, current, reference):
        warped, flow, _ = model.apply(params, current, reference)
        photo = jnp.mean(jnp.abs(warped - reference))
        loss = photo + smooth_weight * smoothness_loss(flow)
        return loss, {'loss': loss, 'photometric': photo}

    def step(params, opt_state, current, reference):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, current, reference)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step)


def frame_pair_batches(args):
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(args.data_dir, args.batch_size)
    rng = np.random.RandomState(args.seed)
    for batch in ds.numpy_iterator(keys=('images',)):
        images = batch['images'].astype(np.float32) / 255.0
        B, T = images.shape[:2]
        t0 = rng.randint(0, T - args.max_dt, size=B)
        dt = rng.randint(1, args.max_dt + 1, size=B)
        idx = np.arange(B)
        yield (images[idx, t0, args.camera],
               images[idx, np.minimum(t0 + dt, T - 1), args.camera])


def synthetic_pairs(args, seed=0):
    rng = np.random.RandomState(seed)
    h, w = args.image_height, args.image_width
    while True:
        cur = np.full((args.batch_size, h, w, 3), 0.1, np.float32)
        ref = np.full((args.batch_size, h, w, 3), 0.1, np.float32)
        for b in range(args.batch_size):
            r, c = rng.randint(2, h - 8), rng.randint(2, w - 8)
            dr, dc = rng.randint(-2, 3, 2)
            color = rng.rand(3)
            cur[b, r:r + 4, c:c + 4] = color
            ref[b, r + dr:r + dr + 4, c + dc:c + dc + 4] = color
        yield cur, ref


def train(args):
    model = GoalDistanceNet()
    key = jax.random.PRNGKey(args.seed)
    h, w = args.image_height, args.image_width
    params = model.init(key, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, args.smooth_weight)

    batches = frame_pair_batches(args) if args.data_dir else \
        synthetic_pairs(args)
    t0 = time.time()
    history = []
    for step in range(args.steps):
        cur, ref = next(batches)
        params, opt_state, metrics = step_fn(params, opt_state,
                                             jnp.asarray(cur),
                                             jnp.asarray(ref))
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sec=round(time.time() - t0, 1))
            history.append(m)
            print(json.dumps(m))

    if args.model_dir:
        path = checkpoints.save_params(jax.device_get(params),
                                       args.model_dir, args.steps)
        print('saved GDN checkpoint to', path)
    return history, params


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, default='')
    p.add_argument('--model_dir', type=str, default='')
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--batch_size', type=int, default=32)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--image_height', type=int, default=48)
    p.add_argument('--image_width', type=int, default=64)
    p.add_argument('--max_dt', type=int, default=8)
    p.add_argument('--camera', type=int, default=0)
    p.add_argument('--smooth_weight', type=float, default=0.01)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--log_every', type=int, default=50)
    return p


if __name__ == '__main__':
    train(build_argparser().parse_args())
