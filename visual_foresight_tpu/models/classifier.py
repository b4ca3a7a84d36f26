"""Planning-cost scoring models: success classifier and NCE embedding.

The reference scored predicted frames with external ``control_embedding``
meta-classifier / NCE models (``variants/classifier_controller.py:33-36``,
``variants/nce_cost_controller.py:33-35``).  These are their native JAX
equivalents: small conv networks that run INSIDE the fused CEM program, so
classifier-cost planning also needs zero host round trips.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvEncoder(nn.Module):
    """Shared conv trunk: 4 stride-2 conv blocks + global pool."""

    features: Tuple[int, ...] = (32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=self.dtype, name='conv{}'.format(i))(x)
            x = nn.gelu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, C)


class SuccessClassifier(nn.Module):
    """p(success | frame, goal frame) as a single logit.

    Conditioning on the goal is optional (pass ``goal=None`` for
    goal-independent task classifiers such as the towel-fold model).
    """

    features: Tuple[int, ...] = (32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame, goal=None):
        x = frame if goal is None else jnp.concatenate([frame, goal], axis=-1)
        h = ConvEncoder(self.features, self.dtype, name='enc')(x)
        h = nn.Dense(128, name='fc1')(h)
        h = nn.gelu(h)
        return nn.Dense(1, name='logit')(h)[..., 0]   # (B,)


class NCEEmbedding(nn.Module):
    """Contrastive embedding; cost = -<emb(frame), emb(goal)> after L2 norm
    (the dot-product scoring of ``variants/nce_cost_controller.py:83-164``)."""

    features: Tuple[int, ...] = (32, 64, 128, 256)
    embed_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame):
        h = ConvEncoder(self.features, self.dtype, name='enc')(frame)
        z = nn.Dense(self.embed_dim, name='proj')(h)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                               1e-8)

    @staticmethod
    def score(emb_a, emb_b):
        """Similarity in [-1, 1]; planning cost is its negative."""
        return jnp.sum(emb_a * emb_b, axis=-1)
