import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_foresight_tpu.models.cdna import CDNAPredictor
from visual_foresight_tpu.ops.cdna_warp import cdna_warp, normalize_kernels


@pytest.fixture(scope='module')
def tiny_model():
    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=3, enc_features=(8, 16, 32))
    key = jax.random.PRNGKey(0)
    B, T, H, W = 3, 6, 16, 24
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jax.random.normal(key, (B, 2, 3)) * 0.1
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, images, actions, states, distribs)
    return model, params, (images, actions, states, distribs)


def test_cdna_warp_matches_naive():
    rng = np.random.RandomState(0)
    B, H, W, C, K, M = 2, 6, 8, 3, 3, 4
    img = rng.randn(B, H, W, C).astype(np.float32)
    kern = np.asarray(normalize_kernels(
        jnp.asarray(rng.rand(B, K, K, M).astype(np.float32))))
    out = np.asarray(cdna_warp(jnp.asarray(img), jnp.asarray(kern)))

    pad = K // 2
    imgp = np.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    naive = np.zeros((B, H, W, C, M), np.float32)
    for b in range(B):
        for m in range(M):
            for i in range(H):
                for j in range(W):
                    naive[b, i, j, :, m] = np.tensordot(
                        kern[b, :, :, m], imgp[b, i:i + K, j:j + K, :],
                        axes=([0, 1], [0, 1]))
    assert np.abs(out - naive).max() < 2e-6


def test_kernel_normalization():
    raw = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 10))
    k = normalize_kernels(raw)
    sums = np.asarray(jnp.sum(k, axis=(1, 2)))
    assert np.allclose(sums, 1.0, atol=1e-5)
    assert np.all(np.asarray(k) >= 0)


def test_forward_shapes(tiny_model):
    model, params, (images, actions, states, distribs) = tiny_model
    out = model.apply(params, images, actions, states, distribs)
    assert out['gen_images'].shape == (3, 6, 16, 24, 3)
    assert out['gen_states'].shape == (3, 6, 3)
    assert out['gen_distribs'].shape == (3, 6, 16, 24, 1)


def test_distribs_stay_normalized(tiny_model):
    model, params, (images, actions, states, distribs) = tiny_model
    out = model.apply(params, images, actions, states, distribs)
    sums = np.asarray(jnp.sum(out['gen_distribs'], axis=(2, 3)))
    assert np.allclose(sums, 1.0, atol=1e-4)


def test_action_conditioning_matters(tiny_model):
    """Different action sequences must produce different predictions."""
    model, params, (images, actions, states, distribs) = tiny_model
    out1 = model.apply(params, images, actions, states, distribs)
    out2 = model.apply(params, images, actions * -1.0 + 0.3, states, distribs)
    diff = np.abs(np.asarray(out1['gen_images']) -
                  np.asarray(out2['gen_images'])).max()
    assert diff > 1e-5


def test_context_teacher_forcing(tiny_model):
    """The first prediction step consumes the first context frame; altering
    the second context frame must not change the FIRST output step (it is
    produced from frame 0) but must change later steps."""
    model, params, (images, actions, states, distribs) = tiny_model
    images2 = images.at[:, 1].set(jnp.roll(images[:, 1], 3, axis=2))
    out1 = model.apply(params, images, actions, states, distribs)
    out2 = model.apply(params, images2, actions, states, distribs)
    first_diff = np.abs(np.asarray(out1['gen_images'][:, 0]) -
                        np.asarray(out2['gen_images'][:, 0])).max()
    later_diff = np.abs(np.asarray(out1['gen_images'][:, 2:]) -
                        np.asarray(out2['gen_images'][:, 2:])).max()
    assert first_diff < 1e-6
    assert later_diff > 1e-6


def test_stochastic_latent_varies():
    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=3, latent_dim=8, enc_features=(8, 16, 32))
    key = jax.random.PRNGKey(0)
    B, T, H, W = 2, 5, 16, 24
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jnp.zeros((B, 2, 3))
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, images, actions, states, distribs)
    o1 = model.apply(params, images, actions, states, distribs,
                     rng=jax.random.PRNGKey(1))
    o2 = model.apply(params, images, actions, states, distribs,
                     rng=jax.random.PRNGKey(2))
    diff = np.abs(np.asarray(o1['gen_images']) -
                  np.asarray(o2['gen_images'])).max()
    assert diff > 1e-6


def test_s2d_tail_matches_classic_rollout():
    """The space-to-depth plan-mode tail (ops/cdna_warp.dna_warp_s2d + the
    low-res mask/kernel contraction) is the same arithmetic as the classic
    full-resolution tail — rollouts from the same carry must agree to fp
    reassociation noise."""
    kw = dict(n_context=2, num_masks=4, num_distribs=1, sdim=3, adim=3,
              enc_features=(8, 16, 16), std_factor=4, lstm_kernel=3,
              separable_lstm=True, renorm_distribs=False)
    classic = CDNAPredictor(s2d_tail=False, **kw)
    fast = CDNAPredictor(s2d_tail=True, **kw)
    key = jax.random.PRNGKey(0)
    B, T, H, W = 3, 5, 16, 24
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jax.random.normal(key, (B, 2, 3)) * 0.1
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = classic.init(key, images, actions, states, distribs)

    carry = classic.apply(params, images, actions[:, :1], states, distribs,
                          method='encode_context')
    out_c = classic.apply(params, carry, actions, method='rollout_from')
    out_f = fast.apply(params, carry, actions, method='rollout_from')
    np.testing.assert_allclose(np.asarray(out_f['gen_images']),
                               np.asarray(out_c['gen_images']),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f['gen_distribs']),
                               np.asarray(out_c['gen_distribs']),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f['gen_states']),
                               np.asarray(out_c['gen_states']),
                               atol=1e-5, rtol=1e-5)


def test_scan_unroll_parity():
    """``scan_unroll`` only changes XLA loop emission (fewer trips, unrolled
    bodies) — the plan-mode rollout must be bit-identical at any unroll,
    including one that does not divide the horizon."""
    kw = dict(n_context=2, num_masks=3, kernel_size=3, sna=True,
              num_distribs=1, sdim=3, adim=3, std_factor=4,
              enc_features=(16, 32, 32), separable_lstm=True, lstm_kernel=3)
    base = CDNAPredictor(scan_unroll=1, **kw)
    key = jax.random.PRNGKey(0)
    B, T, H, W = 2, 10, 16, 16
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jax.random.normal(key, (B, 2, 3)) * 0.1
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 5, 5, 0].set(1.0)
    params = base.init(key, images, actions, states, distribs)
    carry = base.apply(params, images, actions[:, :1], states, distribs,
                       method='encode_context')
    ref = base.apply(params, carry, actions, method='rollout_from')
    for unroll in (3, 5):
        out = CDNAPredictor(scan_unroll=unroll, **kw).apply(
            params, carry, actions, method='rollout_from')
        for k in ref:
            assert float(jnp.abs(ref[k] - out[k]).max()) == 0.0, (unroll, k)

def test_mask_softmax_placement_parity():
    """``mask_softmax='fullres'`` moves the std-backbone mask softmax after
    depth_to_space.  depth_to_space only relocates the (subpixel, candidate)
    groups and exp is elementwise, so the softmax runs over exactly the same
    candidate sets in the same order — outputs must be bit-identical (the
    placement exists purely so XLA fuses the exp/sum/divide into the
    transpose and the effective-kernel consumer instead of a standalone
    low-res softmax bracketed by layout copies; see docs/PERFORMANCE.md)."""
    kw = dict(n_context=2, num_masks=4, kernel_size=3, sna=True,
              num_distribs=1, sdim=3, adim=3, std_factor=4,
              enc_features=(16, 32, 32), separable_lstm=True, lstm_kernel=3,
              renorm_distribs=False)
    lowres = CDNAPredictor(mask_softmax='lowres', **kw)
    fullres = CDNAPredictor(mask_softmax='fullres', **kw)
    key = jax.random.PRNGKey(0)
    B, T, H, W = 2, 6, 16, 16
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jax.random.normal(key, (B, 2, 3)) * 0.1
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 5, 5, 0].set(1.0)
    params = lowres.init(key, images, actions, states, distribs)
    ref = lowres.apply(params, images, actions, states, distribs)
    out = fullres.apply(params, images, actions, states, distribs)
    for k in ('gen_images', 'gen_distribs', 'gen_states'):
        assert float(jnp.abs(ref[k] - out[k]).max()) == 0.0, k


def test_fuse_decode_parity():
    """``fuse_decode`` composes dec1 + depth_to_space + dec1_gates into one
    matmul at the H/(2r) grid.  depth_to_space only relocates (subpixel,
    feature) channel blocks, so the composed projection computes the same
    linear map over the same params — outputs must agree to fp-reassociation
    noise (the composed kernel reassociates the two contractions)."""
    kw = dict(n_context=2, num_masks=4, kernel_size=3, sna=True,
              num_distribs=1, sdim=3, adim=3, std_factor=4,
              enc_features=(16, 32, 32), separable_lstm=True, lstm_kernel=3,
              renorm_distribs=False)
    base = CDNAPredictor(fuse_decode=False, **kw)
    fused = CDNAPredictor(fuse_decode=True, **kw)
    key = jax.random.PRNGKey(0)
    B, T, H, W = 2, 6, 16, 16
    images = jax.random.uniform(key, (B, 2, H, W, 3))
    states = jax.random.normal(key, (B, 2, 3)) * 0.1
    actions = jax.random.normal(key, (B, T, 3)) * 0.1
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 5, 5, 0].set(1.0)
    params = base.init(key, images, actions, states, distribs)
    # identical param trees: the fused path binds the same names/shapes
    fused_params = fused.init(key, images, actions, states, distribs)
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(fused_params))
    ref = base.apply(params, images, actions, states, distribs)
    out = fused.apply(params, images, actions, states, distribs)
    for k in ('gen_images', 'gen_distribs', 'gen_states'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)
