"""Success-classifier / NCE-embedding training.

Internalizes the ``control_embedding`` models the reference imported
externally for its classifier/NCE planning costs.  Labels come from the
``goal_reached`` metadata of collected trajectories (classifier) or from
temporal-proximity positives (NCE).

CLI::

    python -m visual_foresight_tpu.training.train_classifier \
        --data_dir <records> --model_dir <ckpts> [--mode classifier|nce]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visual_foresight_tpu.models.classifier import NCEEmbedding, SuccessClassifier
from visual_foresight_tpu.prediction import checkpoints


def classifier_batches(args):
    """Legacy 'lift' labels: goal_reached metadata, first frame as the goal
    proxy.  Position-blind by construction (the quality tests demonstrate
    it), kept only for comparison runs — prefer ``--label_mode goal``."""
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(args.data_dir, args.batch_size)
    for batch in ds.numpy_iterator(keys=('images', 'goal_reached')):
        images = batch['images'].astype(np.float32) / 255.0
        labels = np.asarray(batch['goal_reached']).reshape(-1).astype(
            np.float32)
        # final frame vs first frame (as goal proxy)
        yield (images[:, -1, args.camera], images[:, 0, args.camera], labels,
               np.ones_like(labels))


def goal_conditioned_batches(args, seed=None):
    """Towel-classifier-shaped labels (reference
    ``experiments/sawyer/towel_classifier/conf.py:18``): success means the
    scene matches *this* goal image, generated self-supervised from
    collected trajectories —

    * positive: a late frame paired with a goal frame from the same
      trajectory's tail (the scene IS at that goal);
    * temporal negative: the first frame against the same trajectory's final
      frame (the scene is NOT yet at the goal);
    * cross negative: a late frame against another trajectory's goal.

    Negatives where the two frames barely differ (the trajectory moved
    nothing, or two trajectories ended identically) are ambiguous and get
    weight 0 rather than a noisy label.
    """
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(args.data_dir, args.batch_size)
    rng = np.random.RandomState(args.seed if seed is None else seed)
    min_diff = args.ambiguous_pixel_diff
    for batch in ds.numpy_iterator(keys=('images',)):
        images = batch['images'].astype(np.float32) / 255.0
        b, T = images.shape[:2]
        cur = np.empty((b,) + images.shape[3:], np.float32)
        goal = np.empty_like(cur)
        labels = np.zeros(b, np.float32)
        weights = np.ones(b, np.float32)
        kinds = rng.randint(0, 4, b)       # 0/1 positive, 2 temporal, 3 cross
        perm = rng.permutation(b)
        for i in range(b):
            cam = args.camera
            if kinds[i] <= 1:
                t_cur = T - 1 - rng.randint(0, min(2, T - 1))
                t_goal = T - 1 - rng.randint(0, min(3, T - 1))
                cur[i], goal[i] = images[i, t_cur, cam], images[i, t_goal, cam]
                labels[i] = 1.0
            elif kinds[i] == 2:
                cur[i], goal[i] = images[i, 0, cam], images[i, T - 1, cam]
            else:
                j = perm[i] if perm[i] != i else (i + 1) % b
                cur[i], goal[i] = images[i, T - 1, cam], images[j, T - 1, cam]
            if labels[i] == 0.0 and \
                    np.abs(cur[i] - goal[i]).mean() < min_diff:
                weights[i] = 0.0           # ambiguous negative
        yield cur, goal, labels, weights


def synthetic_goal_batches(args, seed=0):
    """Synthetic goal-conditioned task: a bright square at a random cell;
    success iff the frame's square sits at the GOAL's cell.  A position-blind
    classifier cannot beat chance here — the quality gate for the recipe."""
    rng = np.random.RandomState(seed)
    h, w = args.image_height, args.image_width
    # shrink the square on tiny frames so at least two DISJOINT cells exist
    s = 8 if min(h, w) >= 16 else max(2, min(h, w) // 2)
    cells = [(r, c) for r in range(0, h - s, 12) for c in range(0, w - s, 16)]
    if len(cells) < 2:
        # corner cells: disjoint by construction since s <= min(h, w) // 2
        cells = sorted({(r, c) for r in (0, max(h - s, 0))
                        for c in (0, max(w - s, 0))})
    assert len(cells) >= 2, 'frame too small for a goal-conditioned task'
    while True:
        cur = rng.rand(args.batch_size, h, w, 3).astype(np.float32) * 0.2
        goal = rng.rand(args.batch_size, h, w, 3).astype(np.float32) * 0.2
        labels = (rng.rand(args.batch_size) > 0.5).astype(np.float32)
        for i in range(args.batch_size):
            gi = rng.randint(len(cells))
            ci = gi if labels[i] > 0.5 else \
                (gi + 1 + rng.randint(len(cells) - 1)) % len(cells)
            r, c = cells[ci]
            cur[i, r:r + s, c:c + s] += 0.7
            r, c = cells[gi]
            goal[i, r:r + s, c:c + s] += 0.7
        yield cur, goal, labels, np.ones_like(labels)


def synthetic_classifier_batches(args, seed=0):
    rng = np.random.RandomState(seed)
    h, w = args.image_height, args.image_width
    while True:
        frames = rng.rand(args.batch_size, h, w, 3).astype(np.float32) * 0.2
        labels = (rng.rand(args.batch_size) > 0.5).astype(np.float32)
        frames[labels > 0.5, :8, :8] += 0.7   # learnable success cue
        goals = rng.rand(args.batch_size, h, w, 3).astype(np.float32) * 0.2
        yield frames, goals, labels, np.ones_like(labels)


def train_classifier(args):
    model = SuccessClassifier()
    key = jax.random.PRNGKey(args.seed)
    h, w = args.image_height, args.image_width
    params = model.init(key, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, frames, goals, labels, weights):
        logits = model.apply(params, frames, goals)
        per = optax.sigmoid_binary_cross_entropy(logits, labels) * weights
        loss = jnp.sum(per) / jnp.maximum(jnp.sum(weights), 1.0)
        acc = jnp.sum(((logits > 0) == (labels > 0.5)) * weights) / \
            jnp.maximum(jnp.sum(weights), 1.0)
        return loss, {'loss': loss, 'acc': acc}

    @jax.jit
    def step_fn(params, opt_state, frames, goals, labels, weights):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, goals, labels, weights)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    if args.data_dir:
        batches = goal_conditioned_batches(args) \
            if args.label_mode == 'goal' else classifier_batches(args)
    else:
        batches = synthetic_goal_batches(args) \
            if args.label_mode == 'goal' else \
            synthetic_classifier_batches(args)
    t0 = time.time()
    history = []
    for step in range(args.steps):
        frames, goals, labels, weights = next(batches)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(frames), jnp.asarray(goals),
            jnp.asarray(labels), jnp.asarray(weights))
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sec=round(time.time() - t0, 1))
            history.append(m)
            print(json.dumps(m))
    if args.model_dir:
        print('saved to', checkpoints.save_params(
            jax.device_get(params), args.model_dir, args.steps))
    return history, params


def train_nce(args):
    """InfoNCE over (frame_t, frame_{t+1}) positives within a batch."""
    model = NCEEmbedding()
    key = jax.random.PRNGKey(args.seed)
    h, w = args.image_height, args.image_width
    params = model.init(key, jnp.zeros((1, h, w, 3)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, anchors, positives, temp=0.1):
        za = model.apply(params, anchors)
        zp = model.apply(params, positives)
        logits = za @ zp.T / temp
        labels = jnp.arange(anchors.shape[0])
        loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, {'loss': loss, 'acc': acc}

    @jax.jit
    def step_fn(params, opt_state, anchors, positives):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, anchors, positives)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def batches():
        if args.data_dir:
            from visual_foresight_tpu.data.dataset_reader import (
                BaseVideoDataset)
            ds = BaseVideoDataset(args.data_dir, args.batch_size)
            rng = np.random.RandomState(args.seed)
            for batch in ds.numpy_iterator(keys=('images',)):
                images = batch['images'].astype(np.float32) / 255.0
                T = images.shape[1]
                t = rng.randint(0, T - 1)
                yield images[:, t, args.camera], images[:, t + 1, args.camera]
        else:
            rng = np.random.RandomState(args.seed)
            while True:
                base = rng.rand(args.batch_size, h, w, 3).astype(np.float32)
                noise = rng.randn(args.batch_size, h, w,
                                  3).astype(np.float32) * 0.05
                yield base, np.clip(base + noise, 0, 1)

    gen = batches()
    t0 = time.time()
    history = []
    for step in range(args.steps):
        anchors, positives = next(gen)
        params, opt_state, metrics = step_fn(params, opt_state,
                                             jnp.asarray(anchors),
                                             jnp.asarray(positives))
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sec=round(time.time() - t0, 1))
            history.append(m)
            print(json.dumps(m))
    if args.model_dir:
        print('saved to', checkpoints.save_params(
            jax.device_get(params), args.model_dir, args.steps))
    return history, params


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument('--mode', type=str, default='classifier',
                   choices=['classifier', 'nce'])
    p.add_argument('--data_dir', type=str, default='')
    p.add_argument('--model_dir', type=str, default='')
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--batch_size', type=int, default=32)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--image_height', type=int, default=48)
    p.add_argument('--image_width', type=int, default=64)
    p.add_argument('--camera', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--log_every', type=int, default=50)
    p.add_argument('--label_mode', type=str, default='goal',
                   choices=['goal', 'lift'],
                   help="'goal' = goal-conditioned towel-classifier labels "
                        "(success iff the scene matches THIS goal); 'lift' = "
                        'legacy position-blind goal_reached labels')
    p.add_argument('--ambiguous_pixel_diff', type=float, default=0.01,
                   help='negatives whose frame/goal mean abs pixel gap is '
                        'below this are weight-0 (ambiguous)')
    return p


if __name__ == '__main__':
    args = build_argparser().parse_args()
    if args.mode == 'classifier':
        train_classifier(args)
    else:
        train_nce(args)
