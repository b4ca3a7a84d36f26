"""SV2P-style inference network for the stochastic video predictor.

The reference serves stochastic SAVP/SV2P checkpoints
(``visual_mpc/video_prediction/vpred_model_interface.py:52-66`` instantiates
``SAVPVideoPredictionModel``); the capability they provide is planning under
*multi-modal* model uncertainty: a per-rollout latent ``z`` lets one action
sequence produce several plausible futures.  Training that latent to carry
information requires variational inference (Babaeizadeh et al. 2018, SV2P):

* a **posterior encoder** ``q(z | x_{0:T})`` over the full trajectory —
  a conv tower pooled over space and time into ``(mu, log_var)``;
* the reparameterized sample ``z = mu + sigma * eps`` conditions the
  conv-LSTM rollout during training (``CDNAPredictor(..., latent=z)``);
* a **KL(q || N(0,1))** penalty (annealed; ``train_predictor.py``) keeps the
  posterior close enough to the prior that planning-time prior samples
  (``rollout_from`` with an rng) cover the learned modes.

The tower is per-frame + mean-pool over time, so one parameter set serves any
sequence length — unlike SV2P's channel-stacked input it never bakes ``T``
into parameter shapes.  It is a training-only artifact: serving checkpoints
(``view0``) hold just the generative model, and the posterior parameters live
next to them under ``posterior/``.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from visual_foresight_tpu.models.layers import LayerNorm


class PosteriorEncoder(nn.Module):
    """q(z | x_{0:T}): full-trajectory conv tower -> (mu, log_var).

    Input ``images``: (B, T, H, W, C) float in [0, 1].  Frame pairs are
    stacked channel-wise (frame t with frame t+1) before the tower so motion
    — the thing the latent must explain — is visible to the first conv, not
    just appearance.
    """

    latent_dim: int
    features: Tuple[int, ...] = (32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        b, t = images.shape[:2]
        # adjacent-frame pairs: (B, T-1, H, W, 2C); a single-frame sequence
        # degenerates to (frame, frame) which still exposes appearance
        if t > 1:
            pairs = jnp.concatenate([images[:, :-1], images[:, 1:]], axis=-1)
        else:
            pairs = jnp.concatenate([images, images], axis=-1)
        tp = pairs.shape[1]
        x = pairs.reshape((b * tp,) + pairs.shape[2:]).astype(self.dtype)
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=self.dtype, name='conv{}'.format(i))(x)
            x = LayerNorm(name='ln{}'.format(i))(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                   # spatial pool
        x = x.reshape(b, tp, -1).mean(axis=1)          # time pool
        x = x.astype(jnp.float32)
        mu = nn.Dense(self.latent_dim, name='mu')(x)
        log_var = nn.Dense(self.latent_dim, name='log_var')(x)
        # clamp for numerical safety early in training
        log_var = jnp.clip(log_var, -10.0, 10.0)
        return mu, log_var


def kl_to_standard_normal(mu, log_var):
    """Mean-over-batch KL( N(mu, diag exp(log_var)) || N(0, I) ), in nats."""
    kl = 0.5 * jnp.sum(jnp.exp(log_var) + jnp.square(mu) - 1.0 - log_var,
                       axis=-1)
    return jnp.mean(kl)


def reparameterize(rng, mu, log_var):
    """z = mu + sigma * eps with eps ~ N(0, I)."""
    import jax
    eps = jax.random.normal(rng, mu.shape)
    return mu + jnp.exp(0.5 * log_var) * eps
