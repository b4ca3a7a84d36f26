"""Action-conditioned conv-LSTM video predictor with CDNA/DNA/SNA motion
transforms, built TPU-first in flax.

This internalizes the model the reference only *served* from external TF1
checkpoints (``visual_mpc/video_prediction/vpred_model_interface.py:52-88``,
operating points from ``experiments/*/conf.py``: 48x64 RGB, context_frames=2,
sequence_length 13-15, CDNA with 10 kernels).  Architecture follows Finn et
al. 2016 ("Unsupervised Learning for Physical Interaction through Video
Prediction") with the SNA background-compositing option of Ebert et al. 2017:

- 3-scale conv-LSTM encoder/decoder with skip connections
- action/state "smear" conditioning at the bottleneck
- per-sample CDNA kernels warp the previous frame; softmax masks composite
- the SAME kernels/masks warp designated-pixel probability maps
- linear state-propagation head
- optional per-rollout latent (SV2P/SAVP-style stochasticity) so CEM can plan
  under model uncertainty

The whole horizon is ONE ``nn.scan`` with per-step teacher-forcing flags: the
same compiled program serves planning (context teacher-forced, then
autoregressive) and training (scheduled sampling).  The CEM sample batch is the
leading axis, so hundreds of candidates roll out in a single device program.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from visual_foresight_tpu.models.layers import ConvLSTMCell, LayerNorm
from visual_foresight_tpu.ops.cdna_warp import (dna_warp, dna_warp_s2d,
                                                effective_pixel_kernels,
                                                normalize_kernels)


def _pallas_block(batch):
    """Largest divisor of batch that is <= 8 (pallas grid block size)."""
    for cand in (8, 5, 4, 2, 1):
        if batch % cand == 0:
            return cand
    return 1


def space_to_depth(x, r):
    """(B, H, W, C) -> (B, H/r, W/r, C*r*r); lossless resolution fold."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // r, w // r, r * r * c)


def depth_to_space(x, r):
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h * r, w * r, c // (r * r))


def to_blocks(x, r):
    """(B, H, W, C) -> (B, H/r, W/r, r, r, C) subpixel-block layout (the
    6-D form :func:`dna_warp_s2d` consumes)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5))


def from_blocks(x6):
    """Inverse of :func:`to_blocks`; accepts arbitrary leading axes."""
    lead = x6.shape[:-5]
    hl, wl, ri, rj, c = x6.shape[-5:]
    x = jnp.moveaxis(x6, -3, -4)         # (..., hl, ri, wl, rj, c)
    return x.reshape(lead + (hl * ri, wl * rj, c))


class _BlockConv(nn.Module):
    """Param-compatible twin of the full-resolution ``nn.Conv(features,
    (r, r), strides=(r, r), padding='VALID')`` input projection, applied to
    an already space-to-depth input: same kernel/bias shapes (so checkpoints
    bind unchanged), contraction as one lane-aligned matmul."""

    features: int
    r: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x6):
        b, hl, wl, ri, rj, cin = x6.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (self.r, self.r, self.in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        k2 = kernel.reshape(-1, self.features).astype(self.dtype)
        flat = x6.reshape(b, hl, wl, ri * rj * cin).astype(self.dtype)
        out = jax.lax.dot_general(flat, k2, (((3,), (0,)), ((), ())))
        return out + bias.astype(self.dtype)


class _Conv1x1Params(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(features, (1, 1), name=...)``:
    declares the identical kernel/bias (same names, shapes, and init), but
    returns them instead of applying the convolution, so a caller can
    compose several 1x1 projections into one matmul while checkpoints bind
    unchanged."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return kernel, bias


class _SubpixelHead(nn.Module):
    """Param-compatible twin of ``nn.Conv(r*r*cand, (1,1), name=...)`` +
    :func:`depth_to_space`: the subpixel-conv/transposed-conv equivalence
    folds the channel->space shuffle into the convolution itself.
    Kernel/bias shapes match the 1x1 conv exactly, so checkpoints bind
    unchanged.

    NEGATIVE RESULT (v5e, 2026-08-18, kept unwired): swapping this in for
    the flagship's fullres mask head moved the replan from 45.6 ms to
    62.3 ms — XLA lowers the stride-4 ``conv_transpose`` as an input-dilated
    convolution whose cost dwarfs the d2s layout copies it saves (an
    isolated chained microbenchmark says 22 % FASTER, but in-program the
    conv+d2s copies overlap/fuse with neighbors and the dilated conv does
    not).  See docs/PERFORMANCE.md 'measured dead ends'."""

    r: int
    cand: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r, cand = self.r, self.cand
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, r * r * cand))
        bias = self.param('bias', nn.initializers.zeros, (r * r * cand,))
        # 1x1-conv channel (i*r + j)*cand + m lands at subpixel (i, j),
        # feature m after depth_to_space -> transposed-conv kernel (i, j,
        # in, m); the per-(subpixel, feature) bias becomes a (r, r, cand)
        # spatially periodic additive term
        kt = kernel[0, 0].reshape(self.in_features, r, r, cand)
        # conv_transpose (transpose_kernel=False) applies the kernel
        # spatially flipped relative to the subpixel index — pre-flip so
        # subpixel (i, j) lands at output offset (i, j) exactly like
        # depth_to_space (verified bit-exact vs conv + depth_to_space)
        kt = jnp.transpose(kt, (1, 2, 0, 3))[::-1, ::-1].astype(self.dtype)
        out = jax.lax.conv_transpose(
            x.astype(self.dtype), kt, strides=(r, r), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        b, hl, wl = x.shape[:3]
        bias_full = jnp.tile(bias.reshape(r, r, cand).astype(self.dtype),
                             (hl, wl, 1))
        return out + bias_full[None]


class CDNAStep(nn.Module):
    """One prediction step with nn.scan-compatible (carry, x) signature."""

    num_masks: int = 10
    kernel_size: int = 5
    sna: bool = True            # composite the first context frame as well
    dna: bool = False           # per-pixel kernels instead of CDNA
    num_distribs: int = 0       # designated-pixel channels (0 = skip)
    sdim: int = 3
    dtype: Any = jnp.float32
    enc_features: Tuple[int, int, int] = (32, 64, 128)
    lstm_kernel: int = 5
    separable_lstm: bool = False
    use_pallas_warp: bool = False   # fused VMEM warp kernel (TPU only)
    std_factor: int = 0         # >0: space-to-depth backbone (TPU fast path)
    plan_mode: bool = False     # no teacher forcing: x carries ONLY actions
    renorm_distribs: bool = True  # renormalize warped distributions per step
    s2d_tail: bool = False      # plan-mode: warp tail in s2d coordinates
    # std backbone: compose dec1 + depth_to_space + dec1_gates into one
    # matmul at the H/(2r) grid (identical params; fp-reassociation-level
    # output change) — serving-side choice, see docs/PERFORMANCE.md
    fuse_decode: bool = False
    # where the std-backbone mask softmax runs — identical math either way
    # (softmax is over the candidate axis, and depth_to_space only relocates
    # (subpixel, candidate) groups), but the op ordering changes what XLA can
    # fuse: 'fullres' moves the raw logits through depth_to_space first so
    # the exp/sum/divide chain fuses into the transpose and the
    # effective-kernel consumer instead of forcing a standalone low-res
    # softmax bracketed by layout copies (measured ~108 us/step of the ~1 ms
    # serving step at 48x64/B=200 on v5e — see docs/PERFORMANCE.md)
    mask_softmax: str = 'lowres'

    @property
    def _s2d_active(self):
        """The s2d tail runs the ENTIRE step (backbone input, masks, CDNA
        warp, compositing) in space-to-depth coordinates — nothing touches
        full resolution inside the scan; the rollout converts once at the
        boundary.  Plan-mode CDNA only (training keeps the reference-shaped
        tail; DNA kernels and the pallas path have their own formulations).
        """
        return (self.s2d_tail and self.plan_mode and bool(self.std_factor)
                and not self.dna and not self.use_pallas_warp)

    def _backbone_std(self, lstm_states, prev_img, cond):
        """Space-to-depth backbone: the ENTIRE conv-LSTM stack runs at
        (H/r, W/r) with wide (>=128) channel dims — every gate conv becomes
        a lane-aligned matmul with tens of thousands of rows, which is the
        shape the MXU wants.  ``space_to_depth`` is lossless, and the CDNA
        warp/compositing still happens at full resolution, so motion
        semantics are unchanged; only the features live on a coarser grid.

        Returns (new_lstm_states, h3, mask_logits_fullres, dna_logits)."""
        r = self.std_factor
        f1, f2 = self.enc_features[0], self.enc_features[1]
        num_candidates = self.num_masks + (2 if self.sna else 1)
        conv = lambda feat, k, s, name: nn.Conv(
            feat, (k, k), strides=(s, s), padding='SAME', dtype=self.dtype,
            name=name)
        lstm = lambda feat, name: ConvLSTMCell(
            feat, (self.lstm_kernel, self.lstm_kernel), dtype=self.dtype,
            separable=self.separable_lstm, external_x=True, name=name)
        (s1, s3, s4) = lstm_states

        # lstm1's input projection is a 4x4/stride-4 conv straight from
        # full-res pixels — mathematically identical to space_to_depth + a
        # 1x1 projection, but the conv machinery tiles it on the MXU with no
        # explicit lane-crossing transpose op on the hot path.  In s2d-tail
        # mode the input already lives in block layout, so the same kernel
        # applies as one matmul (param shapes identical).
        if self._s2d_active:
            xg = _BlockConv(4 * f1, r, prev_img.shape[-1], dtype=self.dtype,
                            name='enc0')(prev_img.astype(self.dtype))
        else:
            xg = nn.Conv(4 * f1, (r, r), strides=(r, r), padding='VALID',
                         dtype=self.dtype, name='enc0')(
                             prev_img.astype(self.dtype))          # H/r
        s1, h1 = lstm(f1, 'lstm1')(s1, xg)
        h1 = LayerNorm(name='ln1')(h1)

        # action/state conditioning enters as an additive projection — exactly
        # as expressive as the reference's concat+1x1 "smear" (the 1x1 mixing
        # matrix merges into the gate projection) at one less matmul; the
        # 3x3 conv bottlenecks at f2 before the 1x1 widens to the gates
        enc1 = conv(f2, 3, 2, 'enc1')(h1)                         # H/(2r)
        enc3 = conv(4 * f2, 1, 1, 'enc3')(enc1) + \
            nn.Dense(4 * f2, dtype=self.dtype, name='cond_proj')(
                cond.astype(self.dtype))[:, None, None, :]
        s3, h3 = lstm(f2, 'lstm3')(s3, enc3)
        h3 = LayerNorm(name='ln3')(h3)

        # decode back to H/r: 1x1 conv + depth_to_space at the NARROW width
        # (f1 per subpixel — the lane-crossing d2s transpose is the cost, so
        # keep its tensor small), then a 1x1 widens to the lstm4 gates; the
        # h1 skip enters additively through its own 1x1 projection
        if self.fuse_decode:
            # dec1 + depth_to_space + dec1_gates compose into ONE matmul at
            # the H/(2r) grid: d2s only relocates (subpixel, feature) channel
            # blocks, so W[m, (ab)G+o] = sum_c Wd[m, (ab)f1+c] * Wg[c, o]
            # and the dec1 bias flows through the gate projection.  Param
            # names/shapes match the unfused convs exactly (checkpoints bind
            # unchanged); the composition depends only on params, so XLA
            # hoists it out of the plan-mode time scan.
            G = 4 * f1
            kd, bd = _Conv1x1Params(f2, G, name='dec1')()
            kg, bg = _Conv1x1Params(f1, G, name='dec1_gates')()
            wd = kd[0, 0].astype(self.dtype).reshape(f2, 4, f1)
            wg = kg[0, 0].astype(self.dtype)
            wc = jnp.einsum('msc,co->mso', wd, wg).reshape(f2, 4 * G)
            bc = (bg.astype(self.dtype)[None, :] +
                  bd.astype(self.dtype).reshape(4, f1) @ wg).reshape(-1)
            z = jax.lax.dot_general(h3.astype(self.dtype), wc,
                                    (((3,), (0,)), ((), ()))) + bc
            gate_in = depth_to_space(z, 2) + conv(4 * f1, 1, 1, 'skip1')(h1)
        else:
            up = depth_to_space(conv(4 * f1, 1, 1, 'dec1')(h3), 2)     # H/r
            gate_in = conv(4 * f1, 1, 1, 'dec1_gates')(up) + \
                conv(4 * f1, 1, 1, 'skip1')(h1)
        s4, h4 = lstm(f1, 'lstm4')(s4, gate_in)
        h4 = LayerNorm(name='ln4')(h4)

        # softmax BEFORE depth_to_space, grouped over the candidate axis of
        # the (r*r, num_candidates) channel blocks — at (H/r, W/r) this is
        # ~r^2 x less softmax traffic than at full resolution and the result
        # moves to full res already normalized.  The s2d tail never moves
        # them to full res at all: it consumes the (r*r, candidates) form.
        ml = conv(r * r * num_candidates, 1, 1, 'mask_head')(h4)
        bm, hm, wm = ml.shape[:3]
        if self.mask_softmax == 'fullres' and not self._s2d_active:
            masks = jax.nn.softmax(
                depth_to_space(ml, r), axis=-1).astype(self.dtype)
        else:
            ml = ml.reshape(bm, hm, wm, r * r, num_candidates)
            masks = jax.nn.softmax(ml, axis=-1).astype(self.dtype)
            if not self._s2d_active:
                masks = depth_to_space(masks.reshape(bm, hm, wm, -1), r)
        dna_logits = None
        if self.dna:
            dna_logits = depth_to_space(
                conv(r * r * self.kernel_size ** 2, 1, 1, 'dna_head')(h4), r)
        return (s1, s3, s4), h3, masks, dna_logits

    def _backbone_classic(self, lstm_states, prev_img, cond):
        """Finn-CDNA 3-scale encoder/decoder (architectural parity path)."""
        f1, f2, f3 = self.enc_features
        num_candidates = self.num_masks + (2 if self.sna else 1)
        conv = lambda feat, k, s, name: nn.Conv(
            feat, (k, k), strides=(s, s), padding='SAME', dtype=self.dtype,
            name=name)
        deconv = lambda feat, name: nn.ConvTranspose(
            feat, (3, 3), strides=(2, 2), padding='SAME', dtype=self.dtype,
            name=name)
        lstm = lambda feat, name: ConvLSTMCell(
            feat, (self.lstm_kernel, self.lstm_kernel), dtype=self.dtype,
            separable=self.separable_lstm, name=name)
        (s1, s2, s3, s4, s5) = lstm_states

        enc0 = conv(f1, 5, 2, 'enc0')(prev_img.astype(self.dtype))     # H/2
        enc0 = LayerNorm(name='ln0')(enc0)

        s1, h1 = lstm(f1, 'lstm1')(s1, enc0)
        h1 = LayerNorm(name='ln1')(h1)

        enc1 = conv(f2, 3, 2, 'enc1')(h1)                               # H/4
        s2, h2 = lstm(f2, 'lstm2')(s2, enc1)
        h2 = LayerNorm(name='ln2')(h2)

        enc2 = conv(f3, 3, 2, 'enc2')(h2)                               # H/8

        smear = jnp.tile(cond.astype(self.dtype)[:, None, None, :],
                         (1, enc2.shape[1], enc2.shape[2], 1))
        enc3 = conv(f3, 1, 1, 'enc3')(jnp.concatenate([enc2, smear], axis=-1))

        s3, h3 = lstm(f3, 'lstm3')(s3, enc3)
        h3 = LayerNorm(name='ln3')(h3)

        dec1 = deconv(f2, 'dec1')(h3)                                   # H/4
        s4, h4 = lstm(f2, 'lstm4')(
            s4, jnp.concatenate([dec1, enc1], axis=-1))
        h4 = LayerNorm(name='ln4')(h4)

        dec2 = deconv(f1, 'dec2')(h4)                                   # H/2
        s5, h5 = lstm(f1, 'lstm5')(
            s5, jnp.concatenate([dec2, enc0], axis=-1))
        h5 = LayerNorm(name='ln5')(h5)

        dec3 = deconv(f1, 'dec3')(h5)                                   # H
        dec3 = LayerNorm(name='ln6')(dec3)

        mask_logits = nn.Conv(num_candidates, (1, 1), dtype=self.dtype,
                              name='mask_head')(dec3)
        masks = jax.nn.softmax(mask_logits.astype(jnp.float32), axis=-1)
        dna_logits = None
        if self.dna:
            dna_logits = nn.Conv(self.kernel_size ** 2, (1, 1),
                                 dtype=self.dtype, name='dna_head')(dec3)
        return (s1, s2, s3, s4, s5), h3, masks, dna_logits

    @nn.compact
    def __call__(self, carry, x):
        (lstm_states, prev_img, prev_distrib, prev_state,
         first_image, first_distrib, latent) = carry
        if self.plan_mode:
            # autoregressive planning: the carry already holds the input frame
            # (encode_context seeds it with the final context frame), so the
            # scan xs carry ONLY actions — no (T, B, H, W, C) ground-truth
            # streams get broadcast/sliced per step.
            action = x[0] if isinstance(x, tuple) else x
        else:
            action, gt_image, gt_distrib, gt_state, use_gt = x

            # teacher forcing / scheduled sampling: pick the network input
            use_img = use_gt[:, None, None, None].astype(prev_img.dtype)
            prev_img = use_img * gt_image.astype(prev_img.dtype) + \
                (1.0 - use_img) * prev_img
            prev_state = use_gt[:, None] * gt_state + \
                (1.0 - use_gt[:, None]) * prev_state
            if self.num_distribs:
                prev_distrib = use_img.astype(prev_distrib.dtype) * \
                    gt_distrib.astype(prev_distrib.dtype) + \
                    (1.0 - use_img).astype(prev_distrib.dtype) * prev_distrib

        sa = jnp.concatenate([prev_state, action], axis=-1)
        cond = sa if latent is None else jnp.concatenate([sa, latent], -1)

        backbone = self._backbone_std if self.std_factor else \
            self._backbone_classic
        lstm_states, h3, masks, dna_logits = backbone(
            lstm_states, prev_img, cond)

        # -- heads -------------------------------------------------------------
        b = prev_img.shape[0]

        if self._s2d_active:
            # Whole tail in s2d coordinates: kernels/masks contract into the
            # per-pixel kernel field as ONE lane-aligned matmul at (H/r, W/r),
            # the K*K warp taps are r*r*C-wide elementwise ops
            # (ops/cdna_warp.dna_warp_s2d), and nothing is materialized at
            # full resolution inside the scan.
            r = self.std_factor
            hl, wl = masks.shape[1], masks.shape[2]
            offset = 2 if self.sna else 1
            flat = h3.astype(jnp.float32).reshape(b, -1)
            raw = nn.Dense(self.num_masks * self.kernel_size ** 2,
                           name='cdna_head')(flat)
            kernels = normalize_kernels(
                raw.reshape(b, self.kernel_size, self.kernel_size,
                            self.num_masks))
            kflat = kernels.reshape(b, self.kernel_size ** 2,
                                    self.num_masks).astype(self.dtype)
            ek6 = jnp.einsum('bhwsm,bkm->bhwsk', masks[..., offset:],
                             kflat).reshape(
                                 b, hl, wl, r, r, self.kernel_size ** 2)
            x6 = prev_img
            if self.num_distribs:
                x6 = jnp.concatenate(
                    [prev_img, prev_distrib.astype(self.dtype)], axis=-1)
            warped6 = dna_warp_s2d(x6, ek6)
            m0 = masks[..., 0].reshape(b, hl, wl, r, r, 1)
            gen_image = prev_img * m0
            gd = None
            if self.num_distribs:
                gd = prev_distrib.astype(self.dtype) * m0
            if self.sna:
                m1 = masks[..., 1].reshape(b, hl, wl, r, r, 1)
                gen_image = gen_image + first_image.astype(self.dtype) * m1
                if self.num_distribs:
                    gd = gd + first_distrib.astype(self.dtype) * m1
            nc = prev_img.shape[-1]
            gen_image = gen_image + warped6[..., :nc]
            gen_distrib = prev_distrib
            if self.num_distribs:
                gd = gd + warped6[..., nc:]
                if self.renorm_distribs:
                    total = jnp.sum(gd.astype(jnp.float32),
                                    axis=(1, 2, 3, 4), keepdims=True)
                    gen_distrib = (gd.astype(jnp.float32) /
                                   jnp.maximum(total, 1e-12)).astype(
                                       self.dtype)
                else:
                    gen_distrib = gd

            state_delta = nn.Dense(self.sdim, name='state_head')(
                sa.astype(jnp.float32))
            gen_state = prev_state + state_delta
            new_carry = (lstm_states, gen_image, gen_distrib, gen_state,
                         first_image, first_distrib, latent)
            outs = (gen_image,
                    gen_distrib if self.num_distribs else 0.0, gen_state)
            return new_carry, outs

        # Collapse kernels + masks into one per-pixel effective kernel field —
        # compositing is linear, so this is exact and avoids materializing the
        # (B,H,W,C,M) candidate tensor (dominant HBM traffic at 48x64).  All
        # full-resolution tensors stay in the compute dtype; only kernel/mask
        # normalizations and the distribution renorm accumulate in f32.
        offset = 2 if self.sna else 1
        prev_c = prev_img.astype(self.dtype)
        eff_kernels, kernels = None, None
        if self.dna:
            pk = dna_logits
            pk = jax.nn.relu(pk.astype(jnp.float32) - 1e-12) + 1e-12
            pk = pk / jnp.sum(pk, -1, keepdims=True)
            eff_kernels = (pk * jnp.sum(masks[..., offset:], -1,
                                        keepdims=True)).astype(self.dtype)
        else:
            flat = h3.astype(jnp.float32).reshape(b, -1)
            raw = nn.Dense(self.num_masks * self.kernel_size ** 2,
                           name='cdna_head')(flat)
            kernels = normalize_kernels(
                raw.reshape(b, self.kernel_size, self.kernel_size,
                            self.num_masks))
            if not self.use_pallas_warp:
                eff_kernels = effective_pixel_kernels(
                    kernels, masks, offset).astype(self.dtype)

        gen_distrib = prev_distrib
        if self.use_pallas_warp and not self.dna:
            # fused VMEM kernel: effective-kernel contraction + warp of frame
            # AND distributions + compositing, no HBM intermediates
            from visual_foresight_tpu.ops.pallas_cdna import (
                fused_warp_composite)
            pd = prev_distrib.astype(self.dtype) if self.num_distribs else \
                jnp.zeros(prev_c.shape[:3] + (0,), self.dtype)
            fd = first_distrib.astype(self.dtype) if self.num_distribs else pd
            gen_image, gd = fused_warp_composite(
                prev_c, first_image.astype(self.dtype), pd, fd,
                kernels.astype(self.dtype), masks.astype(self.dtype),
                sna=self.sna, block_b=_pallas_block(b))
            if self.num_distribs:
                total = jnp.sum(gd.astype(jnp.float32), axis=(1, 2),
                                keepdims=True)
                gen_distrib = (gd.astype(jnp.float32) /
                               jnp.maximum(total, 1e-12)).astype(self.dtype)
        else:
            masks_c = masks.astype(self.dtype)
            gen_image = prev_c * masks_c[..., 0:1]
            if self.sna:
                gen_image = gen_image + \
                    first_image.astype(self.dtype) * masks_c[..., 1:2]
            if self.num_distribs:
                # one patch extraction/contraction for frame + distributions
                pd = prev_distrib.astype(self.dtype)
                warped = dna_warp(jnp.concatenate([prev_c, pd], axis=-1),
                                  eff_kernels)
                gen_image = gen_image + warped[..., :prev_c.shape[-1]]
                gd = pd * masks_c[..., 0:1]
                if self.sna:
                    gd = gd + first_distrib.astype(self.dtype) * \
                        masks_c[..., 1:2]
                gd = gd + warped[..., prev_c.shape[-1]:]
                if self.renorm_distribs:
                    total = jnp.sum(gd.astype(jnp.float32), axis=(1, 2),
                                    keepdims=True)
                    gen_distrib = (gd.astype(jnp.float32) /
                                   jnp.maximum(total, 1e-12)).astype(self.dtype)
                else:
                    # the planning cost normalizes per step anyway (reference
                    # normalizes at cost time, pixel_cost_controller.py:180);
                    # skipping the per-step full-res reduce saves HBM passes
                    gen_distrib = gd
            else:
                gen_image = gen_image + dna_warp(prev_c, eff_kernels)

        state_delta = nn.Dense(self.sdim, name='state_head')(
            sa.astype(jnp.float32))
        gen_state = prev_state + state_delta

        new_carry = (lstm_states, gen_image, gen_distrib, gen_state,
                     first_image, first_distrib, latent)
        outs = (gen_image, gen_distrib if self.num_distribs else 0.0, gen_state)
        return new_carry, outs


class CDNAPredictor(nn.Module):
    """Full-horizon rollout (single nn.scan over time).

    Inputs (batch-leading):
      images:   (B, n_in, H, W, C) float in [0, 1]; n_in >= n_context.  During
                planning n_in == n_context; during training n_in == T+1 (full
                trajectory, consumed per the teacher-forcing schedule).
      actions:  (B, T, adim)
      states:   (B, n_in, sdim) or None
      distribs: (B, n_in, H, W, P) or None (P must equal num_distribs)
      rng:      PRNG key for the stochastic latent (latent_dim > 0)
      gt_mask:  optional (T,) or (B, T) float teacher-forcing schedule;
                default = force the first n_context-1 steps, autoregress after

    Returns dict: 'gen_images' (B, T, H, W, C), 'gen_states' (B, T, sdim),
    'gen_distribs' (B, T, H, W, P).  Output index t predicts frame t+1; the
    planner slices the tail [n_context-1:] which matches the reference
    predictor contract (predictions strictly after the context window,
    ``vpred_model_interface.py:75-88``).
    """

    n_context: int = 2
    num_masks: int = 10
    kernel_size: int = 5
    sna: bool = True
    dna: bool = False
    latent_dim: int = 0
    num_distribs: int = 0
    sdim: int = 3
    adim: int = 3
    dtype: Any = jnp.float32
    enc_features: Tuple[int, int, int] = (32, 64, 128)
    lstm_kernel: int = 5
    separable_lstm: bool = False
    use_pallas_warp: bool = False
    std_factor: int = 0
    renorm_distribs: bool = True
    s2d_tail: bool = False
    scan_unroll: int = 1        # XLA loop unroll of the plan-mode time scan
    mask_softmax: str = 'lowres'  # see CDNAStep.mask_softmax
    fuse_decode: bool = False   # see CDNAStep.fuse_decode

    @property
    def _s2d_active(self):
        return (self.s2d_tail and bool(self.std_factor) and not self.dna
                and not self.use_pallas_warp)

    def _make_step(self, plan_mode=False):
        # Unrolling applies to the serving rollout only: training keeps the
        # step-per-iteration scan (rematerialization-friendly), while the
        # plan-mode scan trades compile time for fewer loop trips and
        # cross-step fusion opportunities.
        ScannedStep = nn.scan(
            CDNAStep,
            variable_broadcast='params',
            split_rngs={'params': False},
            in_axes=0, out_axes=0,
            unroll=self.scan_unroll if plan_mode else 1)
        # plan_mode changes only the xs structure (no parameters), so both
        # variants share the 'step' parameter scope.
        return ScannedStep(num_masks=self.num_masks,
                           kernel_size=self.kernel_size, sna=self.sna,
                           dna=self.dna, num_distribs=self.num_distribs,
                           sdim=self.sdim, dtype=self.dtype,
                           enc_features=self.enc_features,
                           lstm_kernel=self.lstm_kernel,
                           separable_lstm=self.separable_lstm,
                           use_pallas_warp=self.use_pallas_warp,
                           std_factor=self.std_factor,
                           plan_mode=plan_mode,
                           renorm_distribs=self.renorm_distribs,
                           s2d_tail=self.s2d_tail,
                           mask_softmax=self.mask_softmax,
                           fuse_decode=self.fuse_decode, name='step')

    def _initial_lstm_states(self, b, h, w):
        init = ConvLSTMCell.initial_state
        if self.std_factor:
            r = self.std_factor
            f1, f2 = self.enc_features[0], self.enc_features[1]
            return (init(b, h // r, w // r, f1, self.dtype),
                    init(b, h // (2 * r), w // (2 * r), f2, self.dtype),
                    init(b, h // r, w // r, f1, self.dtype))
        f1, f2, f3 = self.enc_features
        return (init(b, h // 2, w // 2, f1, self.dtype),
                init(b, h // 4, w // 4, f2, self.dtype),
                init(b, h // 8, w // 8, f3, self.dtype),
                init(b, h // 4, w // 4, f2, self.dtype),
                init(b, h // 2, w // 2, f1, self.dtype))

    @nn.compact
    def encode_context(self, images, actions, states=None, distribs=None):
        """Consume the context frames only; return the post-context carry.

        Runs the n_context teacher-forced steps once (typically at batch 1)
        so the CEM loop can broadcast the resulting recurrent state across
        all samples instead of re-rolling identical context work per sample
        per iteration.  ``actions`` needs >= n_context - 1 entries (the
        executed actions between the context frames) — the n_context-th
        step's action comes from the candidate plan, so the carry returned
        here is the state *after consuming frame n_context-1*.
        """
        b, n_in, h, w, _ = images.shape
        assert n_in >= self.n_context
        n_pre = self.n_context - 1   # steps fully determined by context
        if states is None:
            states = jnp.zeros((b, n_in, self.sdim), jnp.float32)

        lstm_states = self._initial_lstm_states(b, h, w)
        first_image = images[:, 0].astype(self.dtype)
        first_distrib = distribs[:, 0].astype(self.dtype) \
            if self.num_distribs else jnp.zeros((b, h, w, 0), self.dtype)
        latent = jnp.zeros((b, self.latent_dim), jnp.float32) \
            if self.latent_dim else None
        carry = (lstm_states, first_image, first_distrib,
                 states[:, 0].astype(jnp.float32), first_image, first_distrib,
                 latent)
        if n_pre == 0:
            return carry

        xs = (
            jnp.swapaxes(actions.astype(jnp.float32)[:, :n_pre], 0, 1),
            jnp.swapaxes(images.astype(self.dtype)[:, :n_pre], 0, 1),
            jnp.swapaxes(distribs.astype(self.dtype)[:, :n_pre], 0, 1)
            if self.num_distribs else jnp.zeros((n_pre, b, 0), self.dtype),
            jnp.swapaxes(states.astype(jnp.float32)[:, :n_pre], 0, 1),
            jnp.ones((n_pre, b), jnp.float32),   # context: teacher-forced
        )
        carry, _ = self._make_step()(carry, xs)
        # the NEXT step must consume the final context frame (teacher-forced
        # input), so overwrite the generated fields with ground truth
        (lstm_states, _, _, _, fi, fd, lat) = carry
        last = self.n_context - 1
        carry = (lstm_states, images[:, last].astype(self.dtype),
                 distribs[:, last].astype(self.dtype) if self.num_distribs
                 else fd, states[:, last].astype(jnp.float32), fi, fd, lat)
        return carry

    @nn.compact
    def rollout_from(self, carry, actions, rng=None, latent=None):
        """Autoregressive rollout from an ``encode_context`` carry.

        :param actions: (B, T_plan, adim) — first entry is the action paired
            with the final context frame
        :param rng: sample the per-rollout latent from the prior N(0, I)
            (planning under model uncertainty — SV2P/SAVP semantics)
        :param latent: explicit (B, latent_dim) latent overriding the prior
            sample (training feeds the posterior sample through this)
        :return: dict of gen_images / gen_states / gen_distribs, T_plan steps
        """
        (lstm_states, prev_img, prev_distrib, prev_state, fi, fd,
         carry_latent) = carry
        b = prev_img.shape[0]
        T = actions.shape[1]
        h, w = prev_img.shape[1:3]
        if self.latent_dim and latent is None and rng is not None:
            latent = jax.random.normal(rng, (b, self.latent_dim))
        if self.latent_dim and latent is not None:
            carry = (lstm_states, prev_img, prev_distrib, prev_state, fi, fd,
                     latent)

        if self._s2d_active:
            # s2d fast path: convert the frame/distribution carry to block
            # layout ONCE at the boundary; every step of the scan then runs
            # entirely in s2d coordinates, and the stacked outputs convert
            # back in one pass (cheap: a single transpose over (B, T, ...)
            # instead of one full-resolution tail per step).
            r = self.std_factor
            (ls, pi, pd, ps, fi, fd, lat) = carry
            carry = (ls, to_blocks(pi.astype(self.dtype), r),
                     to_blocks(pd.astype(self.dtype), r)
                     if self.num_distribs else pd,
                     ps, to_blocks(fi.astype(self.dtype), r),
                     to_blocks(fd.astype(self.dtype), r)
                     if self.num_distribs else fd, lat)

        # plan-mode scan: xs carries ONLY the actions — the first input frame
        # comes from the carry (encode_context seeded it with the final
        # context frame), so no (T, B, H, W, C) ground-truth stream is ever
        # broadcast into the scan.
        xs = (jnp.swapaxes(actions.astype(jnp.float32), 0, 1),)
        _, (imgs_tm, distribs_tm, states_tm) = \
            self._make_step(plan_mode=True)(carry, xs)
        if self._s2d_active:
            imgs_tm = from_blocks(imgs_tm)
            if self.num_distribs:
                distribs_tm = from_blocks(distribs_tm)
        result = {
            'gen_images': jnp.swapaxes(imgs_tm, 0, 1).astype(jnp.float32),
            'gen_states': jnp.swapaxes(states_tm, 0, 1).astype(jnp.float32),
            # time-major compute-dtype view: consumers that only need a few
            # rollouts (the planner's n_vis elite videos) gather here BEFORE
            # the batch-major transpose + f32 convert, so XLA dead-code-
            # eliminates the full-batch f32 video entirely
            'gen_images_tm': imgs_tm,
        }
        if self.num_distribs:
            result['gen_distribs'] = jnp.swapaxes(
                distribs_tm, 0, 1).astype(jnp.float32)
        return result

    @nn.compact
    def __call__(self, images, actions, states=None, distribs=None, rng=None,
                 gt_mask=None, latent=None):
        b, n_in, h, w, c = images.shape
        T = actions.shape[1]
        if states is None:
            states = jnp.zeros((b, n_in, self.sdim), jnp.float32)
        if self.num_distribs:
            assert distribs is not None and distribs.shape[-1] == self.num_distribs

        # pad ground-truth streams along time to T (masked off past n_in)
        def pad_time(x, target):
            pad = target - x.shape[1]
            if pad <= 0:
                return x[:, :target]
            zeros = jnp.zeros((x.shape[0], pad) + x.shape[2:], x.dtype)
            return jnp.concatenate([x, zeros], axis=1)

        gt_images = pad_time(images.astype(self.dtype), T)
        gt_states = pad_time(states.astype(jnp.float32), T)
        gt_distribs = pad_time(distribs.astype(self.dtype), T) \
            if self.num_distribs else jnp.zeros((b, T, 0), self.dtype)

        if gt_mask is None:
            # plan mode: teacher-force while context frames remain (step t
            # consumes frame t, so steps 0..n_context-1 take ground truth)
            m = (jnp.arange(T) < self.n_context).astype(jnp.float32)
            gt_mask = jnp.tile(m[None], (b, 1))
        elif gt_mask.ndim == 1:
            gt_mask = jnp.tile(gt_mask[None], (b, 1))
        # the first step always consumes the first ground-truth frame
        gt_mask = gt_mask.at[:, 0].set(1.0)

        if self.latent_dim > 0:
            if latent is not None:
                # explicit latent (the variational trainer's posterior sample
                # z = mu + sigma*eps — see models/latent.py)
                latent = latent.astype(jnp.float32)
            elif rng is None:
                latent = jnp.zeros((b, self.latent_dim), jnp.float32)
            else:
                latent = jax.random.normal(rng, (b, self.latent_dim))
        else:
            latent = None

        lstm_states = self._initial_lstm_states(b, h, w)

        first_image = images[:, 0].astype(self.dtype)
        first_distrib = distribs[:, 0].astype(self.dtype) \
            if self.num_distribs else jnp.zeros((b, h, w, 0), self.dtype)

        init_carry = (lstm_states, first_image,
                      first_distrib, states[:, 0].astype(jnp.float32),
                      first_image, first_distrib, latent)

        xs = (
            jnp.swapaxes(actions.astype(jnp.float32), 0, 1),   # (T,B,adim)
            jnp.swapaxes(gt_images, 0, 1),
            jnp.swapaxes(gt_distribs, 0, 1) if self.num_distribs
            else jnp.zeros((T, b, 0), self.dtype),
            jnp.swapaxes(gt_states, 0, 1),
            jnp.swapaxes(gt_mask, 0, 1),                        # (T,B)
        )

        _, (imgs_tm, distribs_tm, states_tm) = self._make_step()(init_carry, xs)

        result = {
            'gen_images': jnp.swapaxes(imgs_tm, 0, 1).astype(jnp.float32),
            'gen_states': jnp.swapaxes(states_tm, 0, 1).astype(jnp.float32),
        }
        if self.num_distribs:
            result['gen_distribs'] = jnp.swapaxes(
                distribs_tm, 0, 1).astype(jnp.float32)
        return result
