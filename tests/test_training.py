"""Training-loop correctness on CPU: loss decreases on a fixed synthetic
batch; scheduled sampling decays; GDN and classifier trainers learn."""

import os

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


def test_train_step_dp_sharded_matches_single_device():
    """The dp-sharded train step (batch axis over the 8-device CPU mesh,
    params/opt replicated, XLA-inserted gradient all-reduce) produces the
    same loss and updated params as the unsharded program."""
    import optax

    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                    replicate, replicated,
                                                    shard_batch)
    from visual_foresight_tpu.training.train_predictor import make_train_step

    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=0, sdim=3,
                          adim=3, enc_features=(8, 16, 32))
    rng = np.random.RandomState(0)
    B, T, H, W = 8, 4, 16, 24
    batch = {
        'images': jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32),
        'actions': jnp.asarray(rng.randn(B, T - 1, 3) * 0.1, jnp.float32),
        'states': jnp.asarray(rng.randn(B, T, 3) * 0.1, jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch['images'][:, :2],
                        batch['actions'], batch['states'][:, :2])
    tx = optax.adam(1e-3)
    step = make_train_step(model, tx, n_context=2)
    key = jax.random.PRNGKey(1)

    p1, _, m1 = jax.jit(step)(params, tx.init(params), batch, key,
                              jnp.asarray(0.0))

    mesh = make_mesh(8)
    assert len(mesh.devices.ravel()) == 8
    bsh, rsh = batch_sharding(mesh), replicated(mesh)
    sharded_step = jax.jit(step, in_shardings=(rsh, rsh, bsh, rsh, rsh),
                           out_shardings=(rsh, rsh, rsh))
    p2, _, m2 = sharded_step(replicate(mesh, params),
                             replicate(mesh, tx.init(params)),
                             shard_batch(mesh, batch),
                             jax.device_put(key, rsh), jnp.asarray(0.0))
    assert np.allclose(float(m1['loss']), float(m2['loss']), atol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


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


def test_train_resume_restores_opt_state(tmp_path, capsys):
    """--resume continues from the saved step with the optimizer state
    restored (not a fresh Adam with a reset schedule — the round-1 advisory
    fix)."""
    from visual_foresight_tpu.training.train_predictor import (build_argparser,
                                                               train)
    common = ['--model_dir', str(tmp_path), '--batch_size', '2',
              '--sequence_length', '5', '--image_height', '16',
              '--image_width', '16', '--num_masks', '2',
              '--enc_features', '8', '16', '16', '--log_every', '1',
              '--n_devices', '1']
    args = build_argparser().parse_args(common + ['--steps', '3',
                                                  '--ckpt_every', '2'])
    train(args)
    assert os.path.isdir(os.path.join(str(tmp_path), 'opt'))

    args2 = build_argparser().parse_args(common + ['--steps', '5',
                                                   '--resume'])
    history, _ = train(args2)
    out = capsys.readouterr().out
    assert 'resumed opt state at step 3' in out
    # continued from step 3: only steps 3 and 4 run
    steps = [h['step'] for h in history]
    assert steps[0] >= 3 and steps[-1] == 4
