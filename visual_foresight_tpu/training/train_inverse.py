"""Inverse-model training: (frame_t, frame_{t+plan_T}, context) -> actions.

Internalizes the RoboNet ``ActionInferenceInterface`` training the reference
outsourced for its inverse-model experiments
(``experiments/robonet/inverse_model/*.py``,
``policy/inverse_models/inverse_model_base_controller.py:30-44``): windows
are sampled from collected trajectories, the goal frame is the frame
``plan_T`` steps ahead, and the loss is the action-sequence MSE.  The
trained checkpoint is what ``JAXInverseModel.restore`` serves inside
``InvModelBaseController``.

CLI::

    python -m visual_foresight_tpu.training.train_inverse \
        --data_dir <records> --model_dir <ckpts> --adim 3 [--steps N]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visual_foresight_tpu.models.inverse import InverseNet
from visual_foresight_tpu.prediction import checkpoints


def window_batches(args, seed=None):
    """Sample (current, goal, context frames, context actions, target
    actions) windows from collected trajectories."""
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(args.data_dir, args.batch_size)
    rng = np.random.RandomState(args.seed if seed is None else seed)
    nc, pt, cam = args.num_context, args.plan_T, args.camera
    for batch in ds.numpy_iterator(keys=('images', 'actions')):
        images = batch['images'].astype(np.float32) / 255.0
        actions = batch['actions'].astype(np.float32)[..., :args.adim]
        b, T = images.shape[:2]
        if T < nc + pt + 1:
            raise ValueError(
                'trajectories too short: T=%d < num_context+plan_T+1=%d'
                % (T, nc + pt + 1))
        ts = rng.randint(nc, T - pt, size=b)
        idx = np.arange(b)
        cur = images[idx, ts, cam]
        goal = images[idx, ts + pt, cam]
        ctx_f = np.stack([images[idx, ts - nc + i, cam] for i in range(nc)],
                         axis=1)
        ctx_a = np.stack([actions[idx, ts - nc + i] for i in range(nc)],
                         axis=1)
        tgt = np.stack([actions[idx, ts + i] for i in range(pt)], axis=1)
        yield cur, goal, ctx_f, ctx_a, tgt


def synthetic_window_batches(args, seed=0):
    """Synthetic quality gate: a square moves by each action's (dx, dy); the
    inverse model must read the displacement from (current, goal).  A model
    that ignores the frames cannot beat the zero-prediction baseline."""
    rng = np.random.RandomState(seed)
    h, w = args.image_height, args.image_width
    nc, pt = args.num_context, args.plan_T
    step_px = 2.0

    def draw(r, c):
        f = np.zeros((h, w, 3), np.float32)
        r, c = int(round(r)) % (h - 8), int(round(c)) % (w - 8)
        f[r:r + 8, c:c + 8] = 1.0
        return f

    while True:
        cur = np.empty((args.batch_size, h, w, 3), np.float32)
        goal = np.empty_like(cur)
        ctx_f = np.empty((args.batch_size, nc, h, w, 3), np.float32)
        ctx_a = rng.uniform(-1, 1, (args.batch_size, nc, args.adim)) \
            .astype(np.float32)
        tgt = np.zeros((args.batch_size, pt, args.adim), np.float32)
        for i in range(args.batch_size):
            r, c = rng.randint(8, h - 16), rng.randint(8, w - 16)
            # constant per-window action: displacement / plan_T
            a = rng.uniform(-1, 1, 2).astype(np.float32)
            tgt[i, :, :2] = a
            for j in range(nc):
                ctx_f[i, j] = draw(r - (nc - j) * a[0] * step_px,
                                   c - (nc - j) * a[1] * step_px)
            cur[i] = draw(r, c)
            goal[i] = draw(r + pt * a[0] * step_px, c + pt * a[1] * step_px)
        yield cur, goal, ctx_f, ctx_a, tgt


def train_inverse(args):
    model = InverseNet(args.adim, args.plan_T)
    h, w = args.image_height, args.image_width
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
                        jnp.zeros((1, args.num_context, h, w, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, cur, goal, ctx_f, tgt):
        pred = model.apply(params, cur, goal, ctx_f)
        loss = jnp.mean((pred - tgt) ** 2)
        # zero-prediction baseline: what "ignore the frames" scores
        return loss, {'loss': loss, 'zero_mse': jnp.mean(tgt ** 2)}

    @jax.jit
    def step_fn(params, opt_state, cur, goal, ctx_f, tgt):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cur, goal, ctx_f, tgt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    batches = window_batches(args) if args.data_dir else \
        synthetic_window_batches(args)
    t0 = time.time()
    history = []
    for step in range(args.steps):
        cur, goal, ctx_f, _, tgt = next(batches)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(cur), jnp.asarray(goal),
            jnp.asarray(ctx_f), jnp.asarray(tgt))
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sec=round(time.time() - t0, 1))
            history.append(m)
            print(json.dumps(m))
        # periodic checkpoints: wall-clock-budgeted runs (timeout in a
        # chain script) must still leave a servable model behind
        ckpt_every = getattr(args, 'ckpt_every', 0)
        if args.model_dir and ckpt_every and step and \
                step % ckpt_every == 0:
            checkpoints.save_params(jax.device_get(params), args.model_dir,
                                    step)
    if args.model_dir:
        print('saved to', checkpoints.save_params(
            jax.device_get(params), args.model_dir, args.steps))
    return history, params


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data_dir', default='',
                   help='records dir; synthetic task when empty')
    p.add_argument('--model_dir', default='')
    p.add_argument('--steps', type=int, default=3000)
    p.add_argument('--batch_size', type=int, default=32)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--adim', type=int, default=3)
    p.add_argument('--plan_T', type=int, default=7)
    p.add_argument('--num_context', type=int, default=2)
    p.add_argument('--camera', type=int, default=0)
    p.add_argument('--image_height', type=int, default=48)
    p.add_argument('--image_width', type=int, default=64)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--log_every', type=int, default=50)
    p.add_argument('--ckpt_every', type=int, default=500)
    train_inverse(p.parse_args())


if __name__ == '__main__':
    main()
