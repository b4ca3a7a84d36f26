"""Golden fixtures pinning the CDNA/SNA/DNA op semantics to the published
math (Finn et al. 2016 eq. 1-2; Ebert et al. 2017 SNA compositing), computed
with independent hand-written numpy loops — NOT by calling the jax ops with
different arguments.  This anchors predictor parity to the literature rather
than self-consistency (the reference's architecture contract lives at
``visual_mpc/video_prediction/setup_predictor.py:97-123`` but its model code
is external, so these fixtures are the ground truth the 1e-3 gate leans on).

Conventions verified:
* CDNA transforms are CORRELATIONS (no kernel flip), the TF
  ``depthwise_conv2d`` formulation Finn's released code uses:
  ``out[h, w] = sum_{i,j} I[h + i - pad, w + j - pad] * kappa[i, j]``.
* Kernels are ReLU'd and normalized to sum 1 (transport, not amplification).
* Compositing is a convex blend under softmax masks; SNA adds the first
  context frame as a static candidate (mask channel 1).
* The pixel-distribution warp uses the SAME kernels/masks as the frame warp.
* The effective-pixel-kernel fast path (contract masks into kernels first)
  is EXACT, not an approximation.
* Scheduled sampling: context frames are always teacher-forced; the
  ground-truth probability follows Finn's inverse-sigmoid decay.
* The rollout is causal: step t's prediction never sees frames > t.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_foresight_tpu.ops.cdna_warp import (cdna_warp, composite,
                                                dna_warp,
                                                effective_pixel_kernels,
                                                normalize_kernels,
                                                warp_distribution)


def _hand_correlate(img, kernel):
    """Literature form, dependent only on numpy: zero-padded correlation
    ``out[h,w] = sum_{i,j} img[h+i-pad, w+j-pad] * k[i,j]``."""
    K = kernel.shape[0]
    pad = K // 2
    H, W = img.shape
    padded = np.zeros((H + 2 * pad, W + 2 * pad))
    padded[pad:pad + H, pad:pad + W] = img
    out = np.zeros((H, W))
    for h in range(H):
        for w in range(W):
            for i in range(K):
                for j in range(K):
                    out[h, w] += padded[h + i, w + j] * kernel[i, j]
    return out


def test_cdna_warp_matches_hand_correlation():
    """5x5 image, two hand-written 3x3 kernels: the jax op must reproduce
    the looped correlation exactly."""
    rng = np.random.RandomState(0)
    img = rng.rand(5, 5).astype(np.float32)
    k1 = np.zeros((3, 3), np.float32)
    k1[0, 1] = 1.0                    # pure shift
    k2 = np.array([[0.0, 0.1, 0.0],
                   [0.1, 0.6, 0.1],
                   [0.0, 0.1, 0.0]], np.float32)   # diffusion
    kernels = jnp.asarray(np.stack([k1, k2], -1)[None])       # (1,3,3,2)
    out = np.asarray(cdna_warp(jnp.asarray(img[None, :, :, None]), kernels))
    assert out.shape == (1, 5, 5, 1, 2)
    np.testing.assert_allclose(out[0, :, :, 0, 0], _hand_correlate(img, k1),
                               atol=1e-6)
    np.testing.assert_allclose(out[0, :, :, 0, 1], _hand_correlate(img, k2),
                               atol=1e-6)


def test_shift_kernel_moves_bright_pixel_down():
    """A delta kernel at (0, 1) reads from one row ABOVE: the bright pixel
    at (2, 2) must appear at (3, 2) — pinning the direction convention."""
    img = np.zeros((5, 5), np.float32)
    img[2, 2] = 1.0
    k = np.zeros((3, 3), np.float32)
    k[0, 1] = 1.0
    out = np.asarray(cdna_warp(jnp.asarray(img[None, :, :, None]),
                               jnp.asarray(k[None, :, :, None])))[0, :, :, 0, 0]
    expect = np.zeros((5, 5), np.float32)
    expect[3, 2] = 1.0
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_normalize_kernels_golden():
    raw = jnp.asarray(np.array([[[[2.0], [-5.0]], [[2.0], [0.0]]]],
                               np.float32).reshape(1, 2, 2, 1))
    k = np.asarray(normalize_kernels(raw))[0, :, :, 0]
    # negatives clamp to ~0, positives split the mass evenly
    np.testing.assert_allclose(k, [[0.5, 0.0], [0.5, 0.0]], atol=1e-6)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)


def test_sna_composite_golden():
    """Convex blend: prev under mask0, first frame under mask1 (the SNA
    static candidate), transformed candidates after — hand-built blend."""
    rng = np.random.RandomState(1)
    prev = rng.rand(1, 4, 4, 3).astype(np.float32)
    first = rng.rand(1, 4, 4, 3).astype(np.float32)
    cand = rng.rand(1, 4, 4, 3, 2).astype(np.float32)
    logits = rng.rand(1, 4, 4, 4).astype(np.float32)
    masks = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # hand blend: candidates stacked (first, cand0, cand1) behind prev/mask0
    expect = prev * masks[..., 0:1] + first * masks[..., 1:2] + \
        cand[..., 0] * masks[..., 2:3] + cand[..., 1] * masks[..., 3:4]

    stacked = np.concatenate([first[..., None], cand], axis=-1)
    got = np.asarray(composite(jnp.asarray(prev * masks[..., 0:1] * 0
                                           + prev),  # background = prev
                               jnp.asarray(stacked), jnp.asarray(masks)))
    # composite() blends background under mask0 and the stack under 1..
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_sna_identity_when_first_mask_saturates():
    """If the softmax puts all mass on the SNA static candidate, the output
    IS the first context frame (Ebert et al.'s skip-to-background case)."""
    rng = np.random.RandomState(2)
    prev = rng.rand(1, 4, 4, 3).astype(np.float32)
    first = rng.rand(1, 4, 4, 3).astype(np.float32)
    cand = rng.rand(1, 4, 4, 3, 2).astype(np.float32)
    masks = np.zeros((1, 4, 4, 4), np.float32)
    masks[..., 1] = 1.0
    stacked = np.concatenate([first[..., None], cand], axis=-1)
    got = np.asarray(composite(jnp.asarray(prev), jnp.asarray(stacked),
                               jnp.asarray(masks)))
    np.testing.assert_allclose(got, first, atol=1e-6)


def test_effective_kernel_path_is_exact():
    """The HBM-saving fast path (contract masks into kernels, then one DNA
    warp) must equal the naive candidates-then-composite form bit-for-bit
    within float tolerance — it is claimed exact by linearity."""
    rng = np.random.RandomState(3)
    B, H, W, C, M, K = 2, 6, 7, 3, 4, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    kernels = np.asarray(normalize_kernels(
        jnp.asarray(rng.rand(B, K, K, M).astype(np.float32))))
    logits = rng.rand(B, H, W, M + 2).astype(np.float32)
    masks = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # naive: warp M candidates, weight by masks [2:]
    cands = np.asarray(cdna_warp(jnp.asarray(img), jnp.asarray(kernels)))
    naive = np.einsum('bhwcm,bhwm->bhwc', cands, masks[..., 2:])

    eff = effective_pixel_kernels(jnp.asarray(kernels), jnp.asarray(masks),
                                  mask_offset=2)
    fast = np.asarray(dna_warp(jnp.asarray(img), eff))
    np.testing.assert_allclose(fast, naive, atol=1e-5)


def test_distribution_warp_conserves_interior_mass():
    """Transport semantics: normalized kernels move probability mass without
    creating it.  With spatially-constant compositing weights (per-pixel
    masks deliberately REDISTRIBUTE mass — that is their job) and mass away
    from the border (no padding loss), the un-renormalized warp keeps total
    mass exactly 1: sum_m c_m * sum_x (kappa_m corr d)(x) = sum_m c_m = 1."""
    rng = np.random.RandomState(4)
    B, H, W = 1, 9, 9
    d = np.zeros((B, H, W, 1), np.float32)
    d[0, 4, 4, 0] = 0.7
    d[0, 3, 4, 0] = 0.3
    kernels = np.asarray(normalize_kernels(
        jnp.asarray(rng.rand(B, 3, 3, 2).astype(np.float32))))
    weights = np.array([0.2, 0.5, 0.3], np.float32)    # background, k0, k1
    masks = np.broadcast_to(weights, (B, H, W, 3)).copy()
    warped = np.asarray(warp_distribution(
        jnp.asarray(d), jnp.asarray(d), kernels, jnp.asarray(masks),
        renormalize=False))
    assert warped.sum() == pytest.approx(1.0, abs=1e-5)


def test_scheduled_sampling_semantics():
    """Finn's inverse-sigmoid decay: p = k/(k + exp(step/k)); context steps
    always teacher-forced regardless of p."""
    from visual_foresight_tpu.training.train_predictor import (
        scheduled_sampling_mask)
    key = jax.random.PRNGKey(0)
    k = 100.0
    # late in training p ~ 0: only context steps remain forced
    late = np.asarray(scheduled_sampling_mask(key, 5000.0, T=10, batch=64,
                                              n_context=2, k=k))
    assert late[:, :2].min() == 1.0
    assert late[:, 2:].mean() < 0.05
    # early: p = k/(k+1) ~ 1 -> nearly everything forced
    early = np.asarray(scheduled_sampling_mask(key, 0.0, T=10, batch=64,
                                               n_context=2, k=k))
    assert early.mean() > 0.95


def test_full_step_matches_vendored_numpy_reference():
    """The de-circularized parity gate: a 4-step rollout (2 teacher-forced +
    2 autoregressive) of the classic CDNA/SNA predictor must reproduce the
    VENDORED outputs of ``tests/numpy_cdna_ref.py`` — a pure-numpy
    implementation written from the paper equations that shares no code with
    ``models/cdna.py`` — within the 1e-3 gate (regenerate with
    ``python tests/gen_cdna_fixture.py``)."""
    import os

    from visual_foresight_tpu.models.cdna import CDNAPredictor

    path = os.path.join(os.path.dirname(__file__), 'assets',
                        'cdna_golden_full.npz')
    fx = np.load(path)

    def unflatten(flat):
        tree = {}
        for key, v in flat.items():
            parts = key.split('/')
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(v)
        return tree

    params = {'params': {'step': unflatten(
        {k[len('param:'):]: fx[k] for k in fx.files
         if k.startswith('param:')})}}

    model = CDNAPredictor(n_context=2, num_masks=4, kernel_size=3, sdim=3,
                          adim=3, enc_features=(8, 12, 16), num_distribs=1,
                          dtype=jnp.float32, std_factor=0,
                          separable_lstm=False, lstm_kernel=5, sna=True)
    out = model.apply(params, jnp.asarray(fx['images']),
                      jnp.asarray(fx['actions']), jnp.asarray(fx['states']),
                      jnp.asarray(fx['distribs']),
                      gt_mask=jnp.asarray(fx['gt_mask']))

    np.testing.assert_allclose(np.asarray(out['gen_images']),
                               fx['gen_images'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['gen_distribs']),
                               fx['gen_distribs'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['gen_states']),
                               fx['gen_states'], atol=1e-3)
    # the gate should in fact be much tighter than 1e-3 in f32 — record a
    # regression tripwire at 1e-4 on the frames
    assert float(np.abs(np.asarray(out['gen_images']) -
                        fx['gen_images']).max()) < 1e-4


def test_rollout_causality_under_teacher_forcing():
    """With full teacher forcing, the prediction at step t must not change
    when frames AFTER t+1 change (the scan consumes gt frame t at step t;
    output t predicts frame t+1)."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=0, sdim=2,
                          adim=2, enc_features=(8, 16, 16))
    rng = np.random.RandomState(5)
    B, T = 1, 5
    imgs = rng.rand(B, T, 8, 8, 3).astype(np.float32)
    acts = rng.randn(B, T - 1, 2).astype(np.float32) * 0.1
    states = rng.randn(B, T, 2).astype(np.float32) * 0.1
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:, :2]),
                        jnp.asarray(acts), jnp.asarray(states[:, :2]))
    force_all = jnp.ones((T - 1,), jnp.float32)

    out_a = model.apply(params, jnp.asarray(imgs), jnp.asarray(acts),
                        jnp.asarray(states), gt_mask=force_all)['gen_images']
    tampered = imgs.copy()
    tampered[:, 3:] = rng.rand(B, T - 3, 8, 8, 3)
    out_b = model.apply(params, jnp.asarray(tampered), jnp.asarray(acts),
                        jnp.asarray(states), gt_mask=force_all)['gen_images']
    # predictions for frames 1..3 (steps 0..2 consume frames 0..2) unchanged
    np.testing.assert_allclose(np.asarray(out_a)[:, :3],
                               np.asarray(out_b)[:, :3], atol=1e-6)
    # step 3 consumes tampered frame 3 -> must differ
    assert not np.allclose(np.asarray(out_a)[:, 3],
                           np.asarray(out_b)[:, 3], atol=1e-6)
