"""Goal-distance network (GDN): learned image registration via dense flow.

The reference loaded an external registration network to warp the current
frame onto start/goal images and derive per-camera/task confidence tradeoffs
(``register_gtruth_controller.py:54-111``, imports the missing
``visual_mpc.registration_network`` package).  This is the native JAX
implementation: a small conv U-net predicts a dense warp-point field; bilinear
sampling produces the warped image.  Trained self-supervised with a
photometric loss on frame pairs (``training/train_gdn.py``).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(image, coords):
    """Sample ``image`` (B, H, W, C) at continuous ``coords`` (B, H, W, 2)
    given as (row, col); zero padding outside."""
    b, h, w, c = image.shape
    rows = coords[..., 0]
    cols = coords[..., 1]

    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    dr = rows - r0
    dc = cols - c0

    def gather(ri, ci):
        valid = ((ri >= 0) & (ri <= h - 1) & (ci >= 0) & (ci <= w - 1))
        ri_c = jnp.clip(ri, 0, h - 1).astype(jnp.int32)
        ci_c = jnp.clip(ci, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = image[batch_idx, ri_c, ci_c]          # (B,H,W,C)
        return vals * valid[..., None]

    top_left = gather(r0, c0)
    top_right = gather(r0, c0 + 1)
    bot_left = gather(r0 + 1, c0)
    bot_right = gather(r0 + 1, c0 + 1)

    top = top_left * (1 - dc)[..., None] + top_right * dc[..., None]
    bot = bot_left * (1 - dc)[..., None] + bot_right * dc[..., None]
    return top * (1 - dr)[..., None] + bot * dr[..., None]


class GoalDistanceNet(nn.Module):
    """U-net flow predictor: (current I0, reference I1) -> warp points such
    that I0 sampled at the warp points reconstructs I1."""

    features: Tuple[int, ...] = (32, 64, 128)
    flow_scale: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, current, reference):
        """
        :param current: (B, H, W, 3) float [0,1] — the image to warp FROM
        :param reference: (B, H, W, 3) — the image to match
        :return: (warped, flow, warp_pts) where warp_pts (B, H, W, 2) holds
            (row, col) source coordinates per output pixel
        """
        b, h, w, _ = current.shape
        x = jnp.concatenate([current, reference], axis=-1).astype(self.dtype)

        skips = []
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=self.dtype, name='down{}'.format(i))(x)
            x = nn.gelu(x)
            skips.append(x)

        for i, f in enumerate(reversed(self.features[:-1])):
            x = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding='SAME',
                                 dtype=self.dtype, name='up{}'.format(i))(x)
            x = nn.gelu(x)
            skip = skips[len(self.features) - 2 - i]
            x = jnp.concatenate([x, skip], axis=-1)

        x = nn.ConvTranspose(16, (3, 3), strides=(2, 2), padding='SAME',
                             dtype=self.dtype, name='up_final')(x)
        x = nn.gelu(x)
        flow = nn.Conv(2, (3, 3), padding='SAME', name='flow_head')(
            x.astype(jnp.float32)) * self.flow_scale   # (B,H,W,2) (drow, dcol)

        rr = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        cc = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        warp_pts = jnp.stack(
            [jnp.broadcast_to(rr, (b, h, w)) + flow[..., 0],
             jnp.broadcast_to(cc, (b, h, w)) + flow[..., 1]], axis=-1)

        warped = bilinear_sample(current.astype(jnp.float32), warp_pts)
        return warped, flow, warp_pts
