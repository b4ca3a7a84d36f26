"""Variational (SV2P-semantics) stochastic predictor tests.

The reference's served models are stochastic SAVP/SV2P video predictors
(``visual_mpc/video_prediction/vpred_model_interface.py:52-66``): a latent
sampled per rollout lets one action sequence produce several plausible
futures, and CEM plans under that uncertainty.  Round 2 shipped the latent
input but trained with pure L2 — a latent the loss ignores.  These tests pin
the round-3 fix: with the posterior encoder + KL (``models/latent.py``,
``train_predictor --stochastic``) the latent must demonstrably carry
information about the future.

The quality test trains on a synthetic dataset whose future is genuinely
multi-modal given the context: a square sits still through both context
frames, then moves left or right with a per-sequence coin flip the actions
do not reveal.  A deterministic model can only predict the mean (a smeared
double-image); a working variational model splits the modes across latent
samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visual_foresight_tpu.models.cdna import CDNAPredictor
from visual_foresight_tpu.models.latent import (PosteriorEncoder,
                                                kl_to_standard_normal,
                                                reparameterize)
from visual_foresight_tpu.training.train_predictor import (kl_beta_schedule,
                                                           make_train_step)

H = W = 16
T = 6          # frames per sequence
ADIM = SDIM = 2


def _model(latent_dim):
    return CDNAPredictor(n_context=2, num_masks=4, kernel_size=3, sna=False,
                         latent_dim=latent_dim, num_distribs=0, sdim=SDIM,
                         adim=ADIM, enc_features=(8, 16, 16), lstm_kernel=3,
                         separable_lstm=True, std_factor=4)


def _bimodal_batch(rng, batch):
    """Square still for 2 context frames, then moves +/-2 px per step in x —
    the sign is a per-sequence coin flip, invisible to context and actions."""
    imgs = np.zeros((batch, T, H, W, 3), np.float32)
    states = np.zeros((batch, T, SDIM), np.float32)
    actions = np.zeros((batch, T - 1, ADIM), np.float32)
    signs = rng.randint(0, 2, batch) * 2 - 1
    for b in range(batch):
        r, c = H // 2 - 1, W // 2 - 1
        for t in range(T):
            imgs[b, t, :] = 0.05
            imgs[b, t, r:r + 3, c:c + 3] = (0.9, 0.8, 0.2)
            states[b, t] = (r / H, c / W)
            if t >= 1:            # context frames 0 and 1 are identical
                c = int(np.clip(c + 2 * signs[b], 0, W - 3))
    return ({'images': jnp.asarray(imgs), 'actions': jnp.asarray(actions),
             'states': jnp.asarray(states)}, signs)


def test_kl_beta_schedule_ramp():
    beta = 0.01
    assert float(kl_beta_schedule(0.0, beta, 100.0, 200.0)) == 0.0
    assert float(kl_beta_schedule(150.0, beta, 100.0, 200.0)) == \
        pytest.approx(beta / 2)
    assert float(kl_beta_schedule(500.0, beta, 100.0, 200.0)) == \
        pytest.approx(beta)


def test_explicit_latent_plumbs_through():
    """Same latent -> identical rollout; different latent -> different."""
    model = _model(latent_dim=4)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 2, H, W, 3), jnp.float32)
    acts = jnp.asarray(rng.randn(2, T - 1, ADIM) * 0.1, jnp.float32)
    states = jnp.asarray(rng.randn(2, 2, SDIM) * 0.1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, acts, states)

    z1 = jnp.ones((2, 4)) * 1.5
    z2 = -jnp.ones((2, 4)) * 1.5
    out_a = model.apply(params, imgs, acts, states, latent=z1)['gen_images']
    out_b = model.apply(params, imgs, acts, states, latent=z1)['gen_images']
    out_c = model.apply(params, imgs, acts, states, latent=z2)['gen_images']
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))


def test_posterior_encoder_shapes_and_kl():
    post = PosteriorEncoder(latent_dim=3)
    imgs = jnp.zeros((4, T, H, W, 3))
    params = post.init(jax.random.PRNGKey(0), imgs)
    mu, log_var = post.apply(params, imgs)
    assert mu.shape == (4, 3) and log_var.shape == (4, 3)
    # KL of an exact standard normal is 0; grows with |mu|
    assert float(kl_to_standard_normal(jnp.zeros((4, 3)),
                                       jnp.zeros((4, 3)))) == 0.0
    assert float(kl_to_standard_normal(jnp.ones((4, 3)),
                                       jnp.zeros((4, 3)))) == pytest.approx(1.5)
    z = reparameterize(jax.random.PRNGKey(1), mu, log_var)
    assert z.shape == mu.shape


def test_variational_latent_carries_information():
    """End-to-end quality gate: after variational training (free-bits KL,
    the shipped recipe) on the bimodal dataset, (a) the KL sits near the
    free-bits floor rather than collapsing to 0, (b) the posterior mean
    separates the two motion modes, (c) posterior-sampled reconstruction
    beats an average prior draw, and (d) prior samples spread across the
    modes (best-of-N recovers the posterior's advantage)."""
    latent_dim = 2
    model = _model(latent_dim)
    posterior = PosteriorEncoder(latent_dim=latent_dim, features=(8, 16, 16))

    rng = np.random.RandomState(0)
    batch0, _ = _bimodal_batch(rng, 16)
    params = {
        'model': model.init(jax.random.PRNGKey(0), batch0['images'][:, :2],
                            batch0['actions'], batch0['states'][:, :2]),
        'posterior': posterior.init(jax.random.PRNGKey(1), batch0['images']),
    }
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    # ss_k tiny -> autoregressive after context from step 0 (the ambiguity
    # lives after the context window, so no teacher-forcing crutch)
    step_fn = jax.jit(make_train_step(
        model, tx, n_context=2, ss_k=1e-3, posterior=posterior,
        kl_beta=1e-3, kl_anneal=(40.0, 120.0), kl_free_nats=1.0))

    key = jax.random.PRNGKey(2)
    metrics = {}
    for step in range(800):
        batch, _ = _bimodal_batch(rng, 16)
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub,
                                             jnp.asarray(step, jnp.float32))
    # (a) no posterior collapse: KL holds near the 1-nat free-bits floor
    assert float(metrics['kl']) > 0.5, \
        'posterior collapsed to the prior: kl={}'.format(metrics['kl'])

    # --- held-out comparison -------------------------------------------------
    val, signs = _bimodal_batch(np.random.RandomState(123), 16)
    target = val['images'][:, 1:]
    ctx_mask = (jnp.arange(T - 1) < 2).astype(jnp.float32)

    def recon_err(latent):
        out = model.apply(params['model'], val['images'], val['actions'],
                          val['states'], gt_mask=ctx_mask, latent=latent)
        return jnp.mean(jnp.square(out['gen_images'] - target),
                        axis=(1, 2, 3, 4))         # (B,)

    mu, log_var = posterior.apply(params['posterior'], val['images'])
    # (b) the posterior mean separates the coin flip the context/actions
    # cannot reveal — the latent IS the mode variable
    gap = np.abs(np.asarray(mu[signs > 0].mean(0)) -
                 np.asarray(mu[signs < 0].mean(0))).max()
    assert gap > 0.5, 'posterior does not separate the modes: gap={}'.format(gap)

    post_err = recon_err(mu)                       # posterior mean latent
    prior_errs = jnp.stack([
        recon_err(jax.random.normal(jax.random.PRNGKey(7 + i),
                                    (16, latent_dim)))
        for i in range(8)])                        # (8, B)
    mean_prior = float(jnp.mean(prior_errs))
    best_prior = float(jnp.mean(jnp.min(prior_errs, axis=0)))
    post = float(jnp.mean(post_err))

    # (c) the posterior latent reconstructs the actual future better than an
    # average prior draw — the latent carries information (the margin is
    # diluted by the static background's irreducible error)
    assert post < 0.85 * mean_prior, (post, mean_prior)
    # (d) prior draws cover the modes: picking the best of 8 recovers most of
    # the posterior's advantage
    assert best_prior < 0.85 * mean_prior, (best_prior, mean_prior)
