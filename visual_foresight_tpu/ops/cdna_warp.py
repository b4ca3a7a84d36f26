"""CDNA transformed-convolution warp.

The core op of the CDNA/SNA video predictor family (Finn et al. 2016; served —
not implemented — by the reference via external SAVP checkpoints, see
``visual_mpc/video_prediction/vpred_model_interface.py``): every sample in the
batch predicts its OWN set of ``M`` small (K x K) convolution kernels, each of
which warps the previous frame into a candidate next frame; predicted
compositing masks then blend the candidates.  The same kernels/masks warp the
designated-pixel probability distributions, which is what gives visual-MPC its
planning cost.

Batch-varying kernels defeat stock convolution primitives (which share weights
across the batch).  TPU-first formulation: extract image patches once, then
contract patches against per-sample kernels as a batched matmul — this lands on
the MXU and fuses with the mask blend.  A fused Pallas kernel
(``pallas_cdna.py``) covers the largest shapes; this XLA path is the reference
implementation and fallback.
"""

import jax
import jax.numpy as jnp
from jax import lax

RELU_SHIFT = 1e-12


def normalize_kernels(raw_kernels):
    """ReLU + eps, normalized so each kernel sums to 1.

    raw_kernels: (B, K, K, M) -> same shape, sum over (K, K) == 1.
    """
    k = jax.nn.relu(raw_kernels - RELU_SHIFT) + RELU_SHIFT
    norm = jnp.sum(k, axis=(1, 2), keepdims=True)
    return k / norm


def _exact_precision(dtype):
    """Patch extraction / warp contractions must not silently round inputs:
    TPU default precision computes f32 convs in bf16, so f32 inputs need
    HIGHEST; bf16 inputs are already exact at DEFAULT (and HIGHEST would
    force an f32 upcast of the big patch tensors — measured as the single
    largest HBM-traffic op in the predictor step)."""
    return lax.Precision.HIGHEST if dtype == jnp.float32 else \
        lax.Precision.DEFAULT


def extract_patches(images, ksize):
    """(B, H, W, C) -> (B, H, W, C, ksize*ksize) patches with SAME padding.

    Patch layout matches ``lax.conv_general_dilated_patches``: the channel
    dimension of the output is ordered C-major (c * KK + patch_index).
    """
    b, h, w, c = images.shape
    patches = lax.conv_general_dilated_patches(
        images,
        filter_shape=(ksize, ksize),
        window_strides=(1, 1),
        padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=_exact_precision(images.dtype),
    )  # (B, H, W, C*K*K), ordered [c, kh, kw]
    return patches.reshape(b, h, w, c, ksize * ksize)


def cdna_warp(images, kernels):
    """Apply per-sample CDNA kernels to images.

    :param images: (B, H, W, C) previous frames (any float dtype)
    :param kernels: (B, K, K, M) normalized transformation kernels
    :return: (B, H, W, C, M) transformed candidate frames
    """
    ksize = kernels.shape[1]
    m = kernels.shape[3]
    patches = extract_patches(images, ksize)                # (B,H,W,C,KK)
    # kernels flattened (kh, kw) must match patch index order (kh*K + kw).
    # CDNA correlates (no kernel flip), matching the TF reference's
    # depthwise_conv2d formulation.
    kflat = kernels.reshape(kernels.shape[0], ksize * ksize, m)  # (B,KK,M)
    # batched contraction over KK -> MXU
    out = jnp.einsum('bhwck,bkm->bhwcm', patches, kflat,
                     preferred_element_type=jnp.float32,
                     precision=_exact_precision(patches.dtype))
    return out.astype(images.dtype)


def effective_pixel_kernels(kernels, masks, mask_offset):
    """Collapse per-sample CDNA kernels and compositing masks into per-pixel
    effective kernels.

    Because compositing is linear, ``sum_m mask_m * (k_m corr I) ==
    (sum_m mask_m * k_m) corr I`` pointwise — so instead of materializing M
    warped candidate frames (the (B,H,W,C,M) tensor dominates HBM traffic at
    48x64), we contract masks against kernels FIRST, producing a (B,H,W,KK)
    per-pixel kernel field that warps the frame AND the pixel distributions in
    one cheap pass.  This is the single biggest memory-traffic optimization in
    the predictor step.

    :param kernels: (B, K, K, M) normalized CDNA kernels
    :param masks: (B, H, W, num_candidates) softmax masks
    :param mask_offset: index of the first transform mask (1, or 2 with SNA)
    :return: (B, H, W, K*K) effective kernels (NOT normalized per pixel —
        their per-pixel sum equals the total transform-mask weight, which is
        exactly the compositing semantics)
    """
    b, ksize = kernels.shape[0], kernels.shape[1]
    m = kernels.shape[3]
    # Unrolled elementwise accumulation over the M kernels instead of an
    # einsum: the dot_general/conv lowering of the (tiny, M<=10) contraction
    # forces layout copies of the full-resolution mask tensor (measured
    # ~13 ms/replan at 48x64/B=200); M broadcast-multiplies fuse into one
    # loop fusion with no relayout.  Accumulate in the mask dtype: for bf16
    # models the f32 accumulator forced f32 intermediates through the fusion
    # (measured ~1.3 ms/replan at 48x64/B=200); the 10-term sum of [0,1]
    # products loses <0.5% in bf16, well inside planning-cost noise.
    kflat = kernels.reshape(b, ksize * ksize, m).astype(masks.dtype)
    out = jnp.zeros(masks.shape[:3] + (ksize * ksize,), masks.dtype)
    for i in range(m):
        out = out + masks[..., mask_offset + i, None] * \
            kflat[:, None, None, :, i]
    return out


def dna_warp(images, pixel_kernels):
    """DNA variant: a distinct kernel per output pixel.

    Shift-and-accumulate formulation: ``out[h,w] = sum_(i,j)
    img[h+i-pad, w+j-pad] * k[h,w,i*K+j]``, unrolled over the K*K taps so XLA
    compiles ONE loop fusion that never materializes a patch tensor.  The
    im2col alternative (``extract_patches`` + einsum) materializes a
    (B,H,W,C*KK) float tensor — measured at 48x64/B=200 as ~100 ms/replan of
    HBM traffic + relayout copies, vs ~2 ms for this form.

    :param images: (B, H, W, C)
    :param pixel_kernels: (B, H, W, K*K) normalized per-pixel kernels
    :return: (B, H, W, C)
    """
    ksize = int(round(pixel_kernels.shape[-1] ** 0.5))
    pad = ksize // 2
    b, h, w, c = images.shape
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # Accumulate in the image dtype: the f32 accumulator forced every one of
    # the K*K fused taps through f32 intermediates (measured ~3 ms/replan in
    # bf16 at 48x64/B=200).  A 25-term convex combination of [0,1] pixels in
    # bf16 is exact to ~3 decimal places; f32 models keep f32 accumulation.
    out = jnp.zeros((b, h, w, c), images.dtype)
    for i in range(ksize):
        for j in range(ksize):
            tap = pixel_kernels[..., i * ksize + j, None]
            out = out + x[:, i:i + h, j:j + w, :] * tap.astype(images.dtype)
    return out


def _sub_shift(x6, d, cell_axis, sub_axis):
    """Shift a space-to-depth tensor by ``d`` FULL-RESOLUTION pixels along one
    spatial dimension, with zero padding at the full-res boundary.

    ``x6`` carries that dimension split as (cells, subpixels): output subpixel
    ``s`` reads input subpixel ``(s + d) % r`` from cell offset
    ``(s + d) // r`` — so for |d| < r the result is a concat of two slices of
    the same tensor (one of them cell-shifted), which XLA fuses into the
    consuming elementwise op.
    """
    r = x6.shape[sub_axis]
    assert -r < d < r
    if d == 0:
        return x6

    def cell_shifted(o):
        """x6 shifted o cells (o in {-1, 0, 1}), zero-padded."""
        if o == 0:
            return x6
        pad = [(0, 0)] * x6.ndim
        idx = [slice(None)] * x6.ndim
        if o > 0:
            idx[cell_axis] = slice(1, None)
            pad[cell_axis] = (0, 1)
        else:
            idx[cell_axis] = slice(None, -1)
            pad[cell_axis] = (1, 0)
        return jnp.pad(x6[tuple(idx)], pad)

    def sub(t, lo, hi):
        idx = [slice(None)] * x6.ndim
        idx[sub_axis] = slice(lo, hi)
        return t[tuple(idx)]

    if d > 0:
        # out s in [0, r-d): same cell, s' = s + d; s in [r-d, r): next cell
        return jnp.concatenate(
            [sub(x6, d, r), sub(cell_shifted(1), 0, d)], axis=sub_axis)
    # d < 0: out s in [0, -d): previous cell, s' = s + d + r; rest same cell
    return jnp.concatenate(
        [sub(cell_shifted(-1), r + d, r), sub(x6, 0, r + d)], axis=sub_axis)


def dna_warp_s2d(x6, ek6):
    """``dna_warp`` evaluated entirely in space-to-depth coordinates.

    Identical arithmetic to ``dna_warp(depth_to_space(x), depth_to_space(ek))``
    but every tap is a WIDE elementwise op: at 48x64/r=4 the full-res tensors
    have only C(=3..4) lane channels (3% lane utilization on the VPU), while
    the s2d form runs r*r*C(=48..64)-wide lanes and the per-pixel kernel
    field is consumed lane-packed without ever existing at full resolution.

    :param x6: (B, HL, WL, r, r, C) space-to-depth image
        (``x6[b, hl, wl, si, sj] == x[b, r*hl+si, r*wl+sj]``)
    :param ek6: (B, HL, WL, r, r, K*K) per-pixel effective kernels, same
        subpixel layout
    :return: (B, HL, WL, r, r, C)
    """
    ksize = int(round(ek6.shape[-1] ** 0.5))
    pad = ksize // 2
    assert pad < x6.shape[3], 's2d warp requires kernel radius < block size'
    out = jnp.zeros(x6.shape[:5] + (x6.shape[5],), x6.dtype)
    for i in range(ksize):
        di = i - pad
        row = _sub_shift(x6, di, cell_axis=1, sub_axis=3)
        for j in range(ksize):
            dj = j - pad
            src = _sub_shift(row, dj, cell_axis=2, sub_axis=4)
            tap = ek6[..., i * ksize + j, None]
            out = out + src * tap.astype(x6.dtype)
    return out


def composite(background, transformed, masks):
    """Blend candidates with compositing masks.

    :param background: (B, H, W, C) static/background candidate (e.g. the
        previous frame for CDNA, the first context frame for SNA)
    :param transformed: (B, H, W, C, M) warped candidates
    :param masks: (B, H, W, M+1) softmax masks; channel 0 is the background
    :return: (B, H, W, C)
    """
    out = background * masks[..., 0:1]
    out = out + jnp.einsum('bhwcm,bhwm->bhwc', transformed, masks[..., 1:],
                           preferred_element_type=jnp.float32).astype(background.dtype)
    return out


def warp_and_composite(prev_image, background, kernels, masks):
    """Fused helper: warp ``prev_image`` with ``kernels`` then composite."""
    transformed = cdna_warp(prev_image, kernels)
    return composite(background, transformed, masks)


def warp_distribution(prev_distrib, background_distrib, kernels, masks,
                      renormalize=True):
    """Warp pixel probability distributions with the same kernels/masks.

    :param prev_distrib: (B, H, W, P) probability maps (P designated pixels)
    :param background_distrib: (B, H, W, P) distribution blended under mask 0
    :return: (B, H, W, P), renormalized to sum 1 over (H, W) when requested
        (keeps the autoregressive rollout numerically stable; the reference
        normalizes at cost time, ``pixel_cost_controller.py:180``)
    """
    warped = warp_and_composite(prev_distrib, background_distrib, kernels, masks)
    if renormalize:
        total = jnp.sum(warped, axis=(1, 2), keepdims=True)
        warped = warped / jnp.maximum(total, 1e-12)
    return warped
