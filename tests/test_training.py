"""Training-loop correctness on CPU: loss decreases on a fixed synthetic
batch; scheduled sampling decays; GDN and classifier trainers learn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_scheduled_sampling_decay():
    from visual_foresight_tpu.training.train_predictor import (
        scheduled_sampling_mask)
    key = jax.random.PRNGKey(0)
    early = scheduled_sampling_mask(key, jnp.asarray(0.0), 10, 64, 2, k=100.0)
    late = scheduled_sampling_mask(key, jnp.asarray(2000.0), 10, 64, 2, k=100.0)
    # context steps always forced
    assert float(early[:, :2].min()) == 1.0
    assert float(late[:, :2].min()) == 1.0
    # autoregressive fraction rises over training
    assert float(late[:, 2:].mean()) < float(early[:, 2:].mean())
    assert float(late[:, 2:].mean()) < 0.05


def test_predictor_overfits_fixed_batch():
    import optax

    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.training.train_predictor import make_train_step

    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=0, sdim=3,
                          adim=3, enc_features=(8, 16, 32))
    rng = np.random.RandomState(0)
    B, T, H, W = 4, 5, 16, 24
    batch = {
        'images': jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32),
        'actions': jnp.asarray(rng.randn(B, T - 1, 3) * 0.1, jnp.float32),
        'states': jnp.asarray(rng.randn(B, T, 3) * 0.1, jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch['images'][:, :2],
                        batch['actions'], batch['states'][:, :2])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(model, tx, n_context=2))

    losses = []
    key = jax.random.PRNGKey(1)
    for step in range(40):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub,
                                             jnp.asarray(0.0))
        losses.append(float(metrics['loss']))
    # targets are random noise warped from random frames, so loss has a large
    # irreducible floor — check steady optimization, not full overfit
    assert losses[-1] < 0.85 * losses[0], losses[::10]
    assert losses[-1] == min(losses[-5:]) or losses[-1] < losses[0]


def test_gdn_trainer_learns_synthetic():
    from visual_foresight_tpu.training.train_gdn import build_argparser, train
    args = build_argparser().parse_args(
        ['--steps', '30', '--batch_size', '8', '--image_height', '16',
         '--image_width', '24', '--log_every', '29'])
    history, _ = train(args)
    assert history[-1]['photometric'] < history[0]['photometric']


def test_classifier_trainer_learns_synthetic():
    from visual_foresight_tpu.training.train_classifier import (
        build_argparser, train_classifier)
    args = build_argparser().parse_args(
        ['--steps', '60', '--batch_size', '16', '--image_height', '16',
         '--image_width', '24', '--log_every', '59'])
    history, _ = train_classifier(args)
    assert history[-1]['acc'] > 0.8
