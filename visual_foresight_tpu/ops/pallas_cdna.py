"""Pallas-fused CDNA warp + composite kernel.

Fuses the motion-transform tail of a predictor step — the 2-D transformed
convolution of the previous frame AND the pixel distributions by per-pixel
effective kernels, plus background compositing — into one VMEM-resident
kernel.  The XLA lowering of this tail materializes an f32 patch tensor
(B,H,W,C*K*K) plus relayout copies in HBM (profiled at ~1.6 ms/step at the
bench operating point); here the 25 shifted-window accumulations run out of a
zero-padded VMEM scratch with no HBM intermediates.

The (cheap, MXU-friendly) contraction of compositing masks against CDNA
kernels stays in XLA (`cdna_warp.effective_pixel_kernels`) — Mosaic's vector
layout rules reject the reshapes it needs, and XLA already emits it well.

Layout notes (see pallas_guide):
- grid over sample blocks; per-program buffers are (BB, H, W, C) with W=64
  landing on the lane dimension,
- the shifted windows are static slices of padded VMEM scratch -> VPU
  multiply-adds, no gather, no patch tensor.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(prev_ref, first_ref, distrib_ref, fdistrib_ref, eff_ref,
                 bgmasks_ref, img_out_ref, distrib_out_ref, pad_scratch,
                 *, ksize, sna, n_channels, n_distribs):
    bb, h, w, _ = prev_ref.shape
    pad = ksize // 2

    def shifted_accumulate(src_ref, n_ch):
        """Zero-pad src into scratch, then accumulate the KxK shifted windows
        weighted by the effective per-pixel kernels."""
        pad_scratch[:] = jnp.zeros_like(pad_scratch)
        pad_scratch[:, pad:pad + h, pad:pad + w, :n_ch] = \
            src_ref[:].astype(jnp.float32)
        total = jnp.zeros((bb, h, w, n_ch), jnp.float32)
        for kh in range(ksize):
            for kw in range(ksize):
                window = pad_scratch[:, kh:kh + h, kw:kw + w, :n_ch]
                weight = eff_ref[:, :, :, kh * ksize + kw].astype(
                    jnp.float32)[..., None]
                total = total + window * weight
        return total

    prev = prev_ref[:].astype(jnp.float32)
    m0 = bgmasks_ref[:, :, :, 0:1].astype(jnp.float32)

    gen_image = prev * m0 + shifted_accumulate(prev_ref, n_channels)
    if sna:
        gen_image = gen_image + first_ref[:].astype(jnp.float32) * \
            bgmasks_ref[:, :, :, 1:2].astype(jnp.float32)
    img_out_ref[:] = gen_image.astype(img_out_ref.dtype)

    if n_distribs:
        pd = distrib_ref[:].astype(jnp.float32)
        gd = pd * m0 + shifted_accumulate(distrib_ref, n_distribs)
        if sna:
            gd = gd + fdistrib_ref[:].astype(jnp.float32) * \
                bgmasks_ref[:, :, :, 1:2].astype(jnp.float32)
        distrib_out_ref[:] = gd.astype(distrib_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('sna', 'block_b', 'interpret',
                                             'vmem_limit_bytes'))
def fused_warp_composite_eff(prev_img, first_img, prev_distrib, first_distrib,
                             eff_kernels, bg_masks, sna=True, block_b=8,
                             interpret=False, vmem_limit_bytes=None):
    """Fused warp + composite from per-pixel effective kernels.

    :param prev_img: (B, H, W, C)
    :param first_img: (B, H, W, C) SNA background (ignored if sna=False)
    :param prev_distrib: (B, H, W, P) pixel distributions (P may be 0)
    :param first_distrib: (B, H, W, P)
    :param eff_kernels: (B, H, W, K*K) per-pixel effective kernels
        (see ``cdna_warp.effective_pixel_kernels``)
    :param bg_masks: (B, H, W, 2 if sna else 1) background mask channels
    :return: (gen_image (B,H,W,C), gen_distrib_unnormalized (B,H,W,P))
    """
    b, h, w, c = prev_img.shape
    p = prev_distrib.shape[-1]
    kk = eff_kernels.shape[-1]
    ksize = int(round(kk ** 0.5))
    assert b % block_b == 0, 'batch must divide block_b'
    pad = ksize // 2
    max_c = max(c, p)

    kernel = functools.partial(_warp_kernel, ksize=ksize, sna=sna,
                               n_channels=c, n_distribs=p)

    grid = (b // block_b,)
    bspec = lambda ch: pl.BlockSpec((block_b, h, w, ch),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)

    gen_image, gen_distrib = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(c), bspec(c), bspec(p), bspec(p), bspec(kk),
                  bspec(bg_masks.shape[-1])],
        out_specs=(bspec(c), bspec(p)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, c), prev_img.dtype),
                   jax.ShapeDtypeStruct((b, h, w, p), prev_distrib.dtype)),
        scratch_shapes=[pltpu.VMEM((block_b, h + 2 * pad, w + 2 * pad, max_c),
                                   jnp.float32)],
        # channel-minor refs tile as T(8,128) with C in the lane dim, so
        # every (BB,H,W,3) temporary physically occupies lane-padded
        # (BB,H,W,128) VMEM — the default 16 MiB scoped budget OOMs at the
        # 200x48x64 operating point (measured round 4; the layout-correct
        # kernel is fused_warp_composite_chw below)
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(prev_img, first_img, prev_distrib, first_distrib, eff_kernels, bg_masks)
    return gen_image, gen_distrib


def fused_warp_composite(prev_img, first_img, prev_distrib, first_distrib,
                         kernels, masks, sna=True, block_b=8, interpret=False):
    """Convenience wrapper taking raw CDNA kernels + full mask stack: contracts
    masks x kernels in XLA (MXU) then runs the fused pallas warp."""
    from visual_foresight_tpu.ops.cdna_warp import effective_pixel_kernels
    offset = 2 if sna else 1
    eff = effective_pixel_kernels(kernels, masks, offset).astype(
        prev_img.dtype)
    return fused_warp_composite_eff(prev_img, first_img, prev_distrib,
                                    first_distrib, eff,
                                    masks[..., :offset].astype(prev_img.dtype),
                                    sna=sna, block_b=block_b,
                                    interpret=interpret)


# ---------------------------------------------------------------------------
# Layout-correct variant: channels ride the SUBLANE-adjacent major dims.
#
# The NHWC kernel above keeps C (3) / P (1) in the minor (lane) dimension,
# so Mosaic tiles every (BB, H, W, C) buffer as T(8,128) with the 3-wide
# channel axis padded to 128 lanes: ~42x VMEM inflation (the 200x48x64
# operating point OOMs the 16 MiB scoped budget: 25.8 MiB, measured round 4)
# and 125/128 of every VPU op wasted.  Here the kernel operates on
# (BB, C, H, W): W=64 is the lane dim, H=48 the sublane dim, C/B are
# untiled major dims — a (1, 3, 48, 64) f32 buffer is 73 KiB instead of
# 1.57 MiB.  The NHWC<->NCHW transposes run in XLA outside the kernel.
# ---------------------------------------------------------------------------


def _warp_kernel_chw(prev_ref, first_ref, distrib_ref, fdistrib_ref, eff_ref,
                     bgmasks_ref, img_out_ref, distrib_out_ref, pad_scratch,
                     *, ksize, sna, n_channels, n_distribs):
    bb, _, h, w = prev_ref.shape
    pad = ksize // 2

    def shifted_accumulate(src_ref, n_ch):
        pad_scratch[:] = jnp.zeros_like(pad_scratch)
        pad_scratch[:, :n_ch, pad:pad + h, pad:pad + w] = \
            src_ref[:].astype(jnp.float32)
        total = jnp.zeros((bb, n_ch, h, w), jnp.float32)
        for kh in range(ksize):
            for kw in range(ksize):
                window = pad_scratch[:, :n_ch, kh:kh + h, kw:kw + w]
                weight = eff_ref[:, kh * ksize + kw:kh * ksize + kw + 1,
                                 :, :].astype(jnp.float32)
                total = total + window * weight
        return total

    prev = prev_ref[:].astype(jnp.float32)
    m0 = bgmasks_ref[:, 0:1, :, :].astype(jnp.float32)

    gen_image = prev * m0 + shifted_accumulate(prev_ref, n_channels)
    if sna:
        gen_image = gen_image + first_ref[:].astype(jnp.float32) * \
            bgmasks_ref[:, 1:2, :, :].astype(jnp.float32)
    img_out_ref[:] = gen_image.astype(img_out_ref.dtype)

    if n_distribs:
        pd = distrib_ref[:].astype(jnp.float32)
        gd = pd * m0 + shifted_accumulate(distrib_ref, n_distribs)
        if sna:
            gd = gd + fdistrib_ref[:].astype(jnp.float32) * \
                bgmasks_ref[:, 1:2, :, :].astype(jnp.float32)
        distrib_out_ref[:] = gd.astype(distrib_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('sna', 'block_b', 'interpret',
                                             'vmem_limit_bytes'))
def fused_warp_composite_chw(prev_img, first_img, prev_distrib, first_distrib,
                             eff_kernels, bg_masks, sna=True, block_b=8,
                             interpret=False, vmem_limit_bytes=None):
    """Same contract as :func:`fused_warp_composite_eff` (NHWC in/out), with
    the kernel computing in channel-major (B, C, H, W) layout."""
    b, h, w, c = prev_img.shape
    p = prev_distrib.shape[-1]
    kk = eff_kernels.shape[-1]
    ksize = int(round(kk ** 0.5))
    assert b % block_b == 0, 'batch must divide block_b'
    pad = ksize // 2
    max_c = max(c, p)

    to_chw = lambda x: jnp.transpose(x, (0, 3, 1, 2))
    args = tuple(to_chw(a) for a in (prev_img, first_img, prev_distrib,
                                     first_distrib, eff_kernels, bg_masks))

    kernel = functools.partial(_warp_kernel_chw, ksize=ksize, sna=sna,
                               n_channels=c, n_distribs=p)

    grid = (b // block_b,)
    bspec = lambda ch: pl.BlockSpec((block_b, ch, h, w),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)

    gen_image, gen_distrib = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(c), bspec(c), bspec(p), bspec(p), bspec(kk),
                  bspec(bg_masks.shape[-1])],
        out_specs=(bspec(c), bspec(p)),
        out_shape=(jax.ShapeDtypeStruct((b, c, h, w), prev_img.dtype),
                   jax.ShapeDtypeStruct((b, p, h, w), prev_distrib.dtype)),
        scratch_shapes=[pltpu.VMEM((block_b, max_c, h + 2 * pad, w + 2 * pad),
                                   jnp.float32)],
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(*args)
    from_chw = lambda x: jnp.transpose(x, (0, 2, 3, 1))
    return from_chw(gen_image), from_chw(gen_distrib)
