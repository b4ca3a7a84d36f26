"""Pallas-fused CDNA warp + composite kernel.

Fuses the entire motion-transform tail of a predictor step — effective-kernel
contraction (masks x CDNA kernels on the MXU), 2-D transformed convolution of
the previous frame AND the pixel distributions, and background compositing —
into one VMEM-resident kernel.  The XLA path (``cdna_warp.py``) materializes
the patch tensor (B,H,W,C*K*K) and the effective-kernel field in HBM between
ops; here everything after the masks/kernels stays on-chip.

Layout notes (see pallas_guide):
- grid over sample blocks; per-program buffers are (BB, H, W, C) with W=64
  landing on the lane dimension.
- the mask-kernel contraction is a (BB*H*W, M) x (M, K*K) matmul -> MXU.
- the 25 shifted-window accumulations are static slices of a zero-padded
  VMEM scratch -> VPU multiply-adds, no gather.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(prev_ref, first_ref, distrib_ref, fdistrib_ref, kern_ref,
                 masks_ref, img_out_ref, distrib_out_ref, pad_scratch,
                 *, ksize, num_masks, sna, n_channels, n_distribs):
    bb, h, w, _ = prev_ref.shape
    kk = ksize * ksize
    offset = 2 if sna else 1
    pad = ksize // 2

    # ---- effective per-pixel kernels: (BB*H*W, M) @ (M, KK) on the MXU
    masks = masks_ref[:]                                    # (BB,H,W,M+off)
    tmasks = masks[..., offset:].reshape(bb * h * w, num_masks)
    kflat = kern_ref[:].reshape(bb, kk, num_masks)
    # per-sample contraction; BB is small and static -> unrolled
    eff_list = []
    for s in range(bb):
        eff_s = jax.lax.dot_general(
            tmasks.reshape(bb, h * w, num_masks)[s], kflat[s].T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (H*W, KK)
        eff_list.append(eff_s)
    eff = jnp.stack(eff_list).reshape(bb, h, w, kk)

    def shifted_accumulate(src_ref, out_shape_c):
        """Zero-pad src into scratch, then accumulate the 25 shifted windows
        weighted by the effective kernels."""
        total = jnp.zeros((bb, h, w, out_shape_c), jnp.float32)
        pad_scratch[:] = jnp.zeros_like(pad_scratch)
        pad_scratch[:, pad:pad + h, pad:pad + w, :out_shape_c] = \
            src_ref[:].astype(jnp.float32)
        for kh in range(ksize):
            for kw in range(ksize):
                window = pad_scratch[:, kh:kh + h, kw:kw + w, :out_shape_c]
                weight = eff[..., kh * ksize + kw][..., None]
                total = total + window * weight
        return total

    prev = prev_ref[:].astype(jnp.float32)
    first = first_ref[:].astype(jnp.float32)
    m0 = masks[..., 0:1]

    warped_img = shifted_accumulate(prev_ref, n_channels)
    gen_image = prev * m0 + warped_img
    if sna:
        gen_image = gen_image + first * masks[..., 1:2]
    img_out_ref[:] = gen_image.astype(img_out_ref.dtype)

    if n_distribs:
        pd = distrib_ref[:].astype(jnp.float32)
        warped_pd = shifted_accumulate(distrib_ref, n_distribs)
        gd = pd * m0 + warped_pd
        if sna:
            gd = gd + fdistrib_ref[:].astype(jnp.float32) * masks[..., 1:2]
        distrib_out_ref[:] = gd.astype(distrib_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('sna', 'block_b', 'interpret'))
def fused_warp_composite(prev_img, first_img, prev_distrib, first_distrib,
                         kernels, masks, sna=True, block_b=8,
                         interpret=False):
    """Fused CDNA warp + composite.

    :param prev_img: (B, H, W, C)
    :param first_img: (B, H, W, C) SNA background (ignored if sna=False)
    :param prev_distrib: (B, H, W, P) pixel distributions (P may be 0)
    :param first_distrib: (B, H, W, P)
    :param kernels: (B, K, K, M) normalized CDNA kernels
    :param masks: (B, H, W, M + (2 if sna else 1))
    :return: (gen_image (B,H,W,C), gen_distrib_unnormalized (B,H,W,P))
    """
    b, h, w, c = prev_img.shape
    p = prev_distrib.shape[-1]
    ksize, num_masks = kernels.shape[1], kernels.shape[3]
    assert b % block_b == 0, 'batch must divide block_b'
    pad = ksize // 2
    max_c = max(c, p)

    kernel = functools.partial(
        _warp_kernel, ksize=ksize, num_masks=num_masks, sna=sna,
        n_channels=c, n_distribs=p)

    grid = (b // block_b,)
    bspec = lambda ch: pl.BlockSpec((block_b, h, w, ch),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((block_b, ksize, ksize, num_masks),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    gen_image, gen_distrib = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(c), bspec(c), bspec(p), bspec(p), kspec,
                  bspec(masks.shape[-1])],
        out_specs=(bspec(c), bspec(p)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, c), prev_img.dtype),
                   jax.ShapeDtypeStruct((b, h, w, p), prev_distrib.dtype)),
        scratch_shapes=[pltpu.VMEM((block_b, h + 2 * pad, w + 2 * pad, max_c),
                                   jnp.float32)],
        interpret=interpret,
    )(prev_img, first_img, prev_distrib, first_distrib, kernels, masks)
    return gen_image, gen_distrib
