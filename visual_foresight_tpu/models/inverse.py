"""Inverse dynamics model: (current frame, goal frame, context frames) ->
action sequence.

Native JAX replacement for the external RoboNet ``ActionInferenceInterface``
the reference's inverse-model controllers load
(``visual_mpc/policy/inverse_models/inverse_model_base_controller.py:30-44``,
``experiments/robonet/inverse_model/*.py``).  One conv trunk over the
channel-stacked frames feeds a dense head that emits the whole ``plan_T``
action plan in a single forward pass — on TPU the entire controller step is
one small fused program (no per-step decoding), so a replan costs one
device round-trip.
"""

import flax.linen as nn
import jax.numpy as jnp


class InverseNet(nn.Module):
    """Conv trunk over (current, goal, context...) stacked on channels ->
    global average pool -> dense action-sequence head."""

    adim: int
    plan_T: int

    @nn.compact
    def __call__(self, current, goal, context_frames):
        x = jnp.concatenate(
            [current, goal] + [context_frames[:, i] for i in
                               range(context_frames.shape[1])], -1)
        for i, f in enumerate((32, 64, 128)):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                        name='c{}'.format(i))(x)
            x = nn.gelu(x)
        h = jnp.mean(x, axis=(1, 2))
        h = nn.gelu(nn.Dense(256, name='fc1')(h))
        out = nn.Dense(self.plan_T * self.adim, name='head')(h)
        return out.reshape(-1, self.plan_T, self.adim)
