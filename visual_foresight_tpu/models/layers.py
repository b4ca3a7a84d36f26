"""Building blocks for the video-prediction models.

TPU notes: everything is NHWC (lane dim = channels), convs carry
``preferred_element_type=float32`` accumulation when running in bfloat16, and
LayerNorm keeps float32 statistics.
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell.

    State is (c, h), both (B, H, W, features).  Gates come from a convolution
    over concat([x, h]) split four ways (i, g, f, o ordering is an internal
    detail; any consistent ordering trains equivalently).

    ``separable=True`` factorizes the gate convolution into depthwise KxK +
    pointwise 1x1 — on TPU the dense 5x5 gate convs are where ~90% of the
    predictor FLOPs live (measured: they run at ~80% MXU utilization, i.e.
    the model is compute-bound, not badly compiled), so the separable form
    trades a ~20x FLOP cut for a modest capacity reduction.  Dense is kept
    for strict architectural parity with Finn et al.'s CDNA.
    """

    features: int
    kernel_size: Tuple[int, int] = (5, 5)
    dtype: jnp.dtype = jnp.float32
    separable: bool = False
    external_x: bool = False    # x IS the precomputed gate projection

    @nn.compact
    def __call__(self, state, x):
        c, h = state
        if self.external_x:
            # x is already a (B, H, W, 4*features) gate pre-activation
            # computed by the caller (e.g. a strided conv straight from
            # pixels); the cell adds the recurrent projection of h through
            # a depthwise spatial mix + pointwise gate conv.  Avoids the
            # concat([x, h]) materialization on the hot path.
            dw = nn.Conv(h.shape[-1], self.kernel_size, padding='SAME',
                         feature_group_count=h.shape[-1], dtype=self.dtype,
                         name='gates_dw')(h)
            gates = x + nn.Conv(4 * self.features, (1, 1), dtype=self.dtype,
                                name='gates_pw')(dw)
        elif self.separable:
            xh = jnp.concatenate([x, h], axis=-1)
            dw = nn.Conv(xh.shape[-1], self.kernel_size, padding='SAME',
                         feature_group_count=xh.shape[-1], dtype=self.dtype,
                         name='gates_dw')(xh)
            gates = nn.Conv(4 * self.features, (1, 1), dtype=self.dtype,
                            name='gates_pw')(dw)
        else:
            xh = jnp.concatenate([x, h], axis=-1)
            gates = nn.Conv(4 * self.features, self.kernel_size,
                            padding='SAME', dtype=self.dtype,
                            name='gates')(xh)
        i, g, f, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        # forget-gate bias +1 folded in: standard LSTM stabilization
        f = nn.sigmoid(f + 1.0)
        g = nn.tanh(g)
        o = nn.sigmoid(o)
        new_c = f * c + i * g
        new_h = o * nn.tanh(new_c)
        return (new_c, new_h), new_h

    @staticmethod
    def initial_state(batch, height, width, features, dtype=jnp.float32):
        shape = (batch, height, width, features)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class LayerNorm(nn.Module):
    """LayerNorm over the channel axis.  Statistics accumulate in float32
    internally (flax upcasts for the reduction) while inputs/outputs stay in
    the compute dtype — avoids materializing full-resolution f32 copies.

    Measured alternative (v5e, 2026-08-18, NOT adopted): computing the
    statistics as two ones-vector matmuls with f32 accumulation wins 32 % in
    an isolated chained microbenchmark, but LOSES ~2 ms/replan inside the
    full serving program — XLA fuses the stock reduction's normalize into
    the producing fusion (the profile's convert_reduce emits the normalized
    bf16 tensor alongside the f32 stats), and the dot-based form breaks that
    fusion into three dispatches.  See docs/PERFORMANCE.md."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(dtype=x.dtype, name='ln')(x)
