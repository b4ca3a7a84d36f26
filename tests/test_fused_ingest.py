"""Native fused-ingest engine vs the pure-Python reader and ground truth.

Covers the scale path of the data pipeline (reference
``examples/dataset_reader.py:43-152``): GZIP TFRecord streaming, Example
parsing, raw and JPEG image decode, resize-on-ingest, shuffle/epoch
semantics, and the uint8 device-ingest contract.
"""

import numpy as np
import pytest

from visual_foresight_tpu.agent.utils.traj_saver import GeneralAgentSaver
from visual_foresight_tpu.data import fused_ingest

T, H, W, SDIM, ADIM = 5, 48, 64, 5, 4


def _traj(seed, ncam=1, smooth=False):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (T, ncam, H, W, 3), dtype=np.uint8)
    if smooth:  # JPEG-friendly content: blur away high-frequency noise
        import cv2
        images = np.stack([[cv2.GaussianBlur(images[t, c], (0, 0), 4)
                            for c in range(ncam)] for t in range(T)])
    obs = {
        'images': images,
        'state': rng.randn(T, SDIM).astype(np.float32),
    }
    policy_out = [{'actions': rng.randn(ADIM).astype(np.float32)}
                  for _ in range(T)]
    return obs, policy_out


def _write_dataset(directory, n_traj, ncam=1, image_coding='raw',
                   smooth=False):
    saver = GeneralAgentSaver(str(directory), T, traj_per_file=4,
                              split=(1.0, 0.0, 0.0), image_coding=image_coding)
    trajs = []
    for i in range(n_traj):
        obs, policy_out = _traj(i, ncam, smooth)
        saver.save_traj({'traj_index': i}, obs, policy_out)
        trajs.append((obs, policy_out))
    saver.flush()
    return trajs


@pytest.fixture(scope='module')
def native_lib():
    if not fused_ingest.native_available():
        pytest.skip('native ingest library unavailable')


def test_raw_roundtrip_exact(tmp_path, native_lib):
    trajs = _write_dataset(tmp_path, 8)
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=4,
                                          num_epochs=1, shuffle=False,
                                          threads=1)
    batches = list(loader)
    assert len(batches) == 2
    got_imgs = np.concatenate([b['images'] for b in batches])
    got_state = np.concatenate([b['state'] for b in batches])
    got_act = np.concatenate([b['actions'] for b in batches])
    for i, (obs, policy_out) in enumerate(trajs):
        np.testing.assert_array_equal(got_imgs[i], obs['images'])
        np.testing.assert_allclose(got_state[i], obs['state'], rtol=1e-6)
        np.testing.assert_allclose(
            got_act[i], np.stack([p['actions'] for p in policy_out]),
            rtol=1e-6)
    assert loader.frames_decoded() >= 8 * T


def test_two_camera_layout(tmp_path, native_lib):
    trajs = _write_dataset(tmp_path, 4, ncam=2)
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=4,
                                          num_epochs=1, shuffle=False,
                                          threads=1)
    batch = next(loader)
    assert batch['images'].shape == (4, T, 2, H, W, 3)
    for i, (obs, _) in enumerate(trajs):
        np.testing.assert_array_equal(batch['images'][i], obs['images'])


def test_jpeg_decode_close_to_source(tmp_path, native_lib):
    trajs = _write_dataset(tmp_path, 4, image_coding='jpeg', smooth=True)
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=4,
                                          num_epochs=1, shuffle=False,
                                          threads=1)
    batch = next(loader)
    # JPEG is lossy: check reconstruction error is in the compression regime
    src = np.stack([obs['images'] for obs, _ in trajs]).astype(np.float32)
    err = np.abs(batch['images'].astype(np.float32) - src).mean()
    assert err < 6.0, 'mean abs error {} too high for q92 JPEG'.format(err)


def test_jpeg_python_reader_agrees_with_native(tmp_path, native_lib):
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    _write_dataset(tmp_path, 4, image_coding='jpeg')
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=4,
                                          num_epochs=1, shuffle=False,
                                          threads=1)
    native_batch = next(loader)
    ds = BaseVideoDataset(str(tmp_path), 4, hparams_dict={'shuffle': False})
    py_imgs = ds['images', 'train']  # (B, T, ncam, H, W, 3)
    # same JPEG bytes through libjpeg (native) and OpenCV: tiny rounding skew
    diff = np.abs(native_batch['images'].astype(np.int16)
                  - py_imgs.astype(np.int16))
    assert diff.max() <= 2


def test_jpeg_resize_on_ingest(tmp_path, native_lib):
    import cv2
    rng = np.random.RandomState(0)
    # smooth (blurred) high-res frames so bilinear impl differences stay tiny
    hi = cv2.GaussianBlur(
        rng.randint(0, 255, (96, 128, 3), np.uint8), (0, 0), 3)
    obs = {'images': np.broadcast_to(hi, (T, 1, 96, 128, 3)).copy(),
           'state': np.zeros((T, SDIM), np.float32)}
    policy_out = [{'actions': np.zeros(ADIM, np.float32)} for _ in range(T)]
    saver = GeneralAgentSaver(str(tmp_path), T, traj_per_file=1,
                              split=(1.0, 0.0, 0.0), image_coding='jpeg')
    saver.save_traj({'traj_index': 0}, obs, policy_out)
    saver.flush()
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=1,
                                          num_epochs=1, shuffle=False,
                                          threads=1, image_hw=(48, 64))
    frame = next(loader)['images'][0, 0, 0].astype(np.float32)
    ref = cv2.resize(hi, (64, 48), interpolation=cv2.INTER_AREA)
    assert frame.shape == (48, 64, 3)
    assert np.abs(frame - ref.astype(np.float32)).mean() < 8.0


def test_shuffle_epoch_stream_covers_all(tmp_path, native_lib):
    _write_dataset(tmp_path, 8)
    loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=2,
                                          num_epochs=2, shuffle=True,
                                          threads=2, pool_size=4)
    seen = 0
    for batch in loader:
        assert batch['images'].shape == (2, T, 1, H, W, 3)
        seen += 2
    assert seen == 16  # 8 trajs x 2 epochs


def test_device_ingest_normalization():
    import jax
    import jax.numpy as jnp
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    out = jax.jit(lambda x: fused_ingest.device_ingest(x, jnp.float32))(u8)
    np.testing.assert_allclose(np.asarray(out), u8 / 255.0, atol=1e-6)
    assert out.dtype == jnp.float32


def test_make_loader_python_fallback(tmp_path):
    _write_dataset(tmp_path, 4)
    it = fused_ingest.make_loader(str(tmp_path), 2, prefer_native=False)
    batch = next(iter(it))
    assert batch['images'].dtype == np.uint8
    assert batch['images'].shape[0] == 2


def test_engine_reports_error_when_nothing_decodable(tmp_path, native_lib):
    """A dataset whose trajectories all fail to decode must surface an
    engine error instead of blocking vfi_next forever (infinite epochs)."""
    _write_dataset(tmp_path, 4)
    # claim a wrong resolution: raw frames can't resize, every traj rejected.
    # the engine error may surface at open (worker already swept the files)
    # or on the first batch draw — either way, never a hang.
    with pytest.raises((RuntimeError, StopIteration)):
        loader = fused_ingest.FusedTrajLoader(str(tmp_path), batch_size=2,
                                              threads=1, image_hw=(24, 32))
        try:
            next(loader)
        finally:
            loader.close()
