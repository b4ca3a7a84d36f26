"""RoboNet HDF5 ingestion: writer -> reader -> training round trip.

Covers benchmark config #5's data path (reference
``visual_mpc/utils/file_2_hdf5.py:15-42`` writes the RoboNet release
format; ``experiments/robonet/*`` consume it for training/planning).
"""

import numpy as np
import pytest

from visual_foresight_tpu.data.robonet_reader import RoboNetTrajReader, discover

T, NCAM, H, W = 6, 2, 32, 48
META = {'camera_configuration': 'multiview', 'policy_desc': 'random',
        'bin_type': 'none', 'bin_insert': 'none',
        'contains_annotation': False, 'robot': 'sim', 'gripper': 'none',
        'background': 'sim', 'action_space': 'xyz', 'object_classes': 'cube',
        'primitives': 'push', 'camera_type': 'sim'}


def _traj(seed):
    rng = np.random.RandomState(seed)
    import cv2
    frames = np.stack([
        [cv2.GaussianBlur(rng.randint(0, 255, (H, W, 3), np.uint8),
                          (0, 0), 3) for _ in range(NCAM)]
        for _ in range(T)])
    states = rng.randn(T, 5).astype(np.float32)
    actions = rng.randn(T, 4).astype(np.float32)
    return frames, states, actions


def _write_robonet_dir(directory, n, encoding='jpeg'):
    from visual_foresight_tpu.utils.file_2_hdf5 import save_hdf5
    trajs = []
    for i in range(n):
        frames, states, actions = _traj(i)
        save_hdf5(str(directory / 'traj{}.hdf5'.format(i)),
                  {'term_t': T - 1}, {'images': frames, 'state': states},
                  {'actions': actions}, dict(META),
                  video_encoding=encoding, t_index=i)
        trajs.append((frames, states, actions))
    return trajs


def test_robonet_jpeg_roundtrip(tmp_path):
    trajs = _write_robonet_dir(tmp_path, 4)
    layout, files = discover(str(tmp_path))
    assert layout == 'robonet' and len(files) == 4

    reader = RoboNetTrajReader(str(tmp_path), batch_size=4, num_epochs=1,
                               shuffle=False)
    batch = next(reader)
    assert batch['images'].shape == (4, T, NCAM, H, W, 3)
    assert batch['images'].dtype == np.uint8
    for i, (frames, states, actions) in enumerate(trajs):
        err = np.abs(batch['images'][i].astype(np.float32)
                     - frames.astype(np.float32)).mean()
        assert err < 3.0, 'jpeg decode error too high: {}'.format(err)
        np.testing.assert_allclose(batch['state'][i], states, rtol=1e-6)
        np.testing.assert_allclose(batch['actions'][i], actions, rtol=1e-6)
    with pytest.raises(StopIteration):
        next(reader)
    reader.close()


def test_robonet_mp4_roundtrip(tmp_path):
    pytest.importorskip('imageio_ffmpeg')
    trajs = _write_robonet_dir(tmp_path, 2, encoding='mp4')
    reader = RoboNetTrajReader(str(tmp_path), batch_size=2, num_epochs=1,
                               shuffle=False)
    batch = next(reader)
    assert batch['images'].shape == (2, T, NCAM, H, W, 3)
    err = np.abs(batch['images'][0].astype(np.float32)
                 - trajs[0][0].astype(np.float32)).mean()
    assert err < 12.0, 'mp4 decode error too high: {}'.format(err)
    reader.close()


def test_bucketed_hdf5_layout(tmp_path):
    from visual_foresight_tpu.agent.utils.hdf5_saver import HDF5Saver
    saver = HDF5Saver(str(tmp_path), {'max_num_actions': T}, {'T': T},
                      traj_per_file=2, split=(1.0, 0.0, 0.0))
    rng = np.random.RandomState(0)
    srcs = []
    for i in range(4):
        obs = {'images': rng.randint(0, 255, (T, NCAM, H, W, 3), np.uint8),
               'state': rng.randn(T, 5).astype(np.float32)}
        policy_out = [{'actions': rng.randn(4).astype(np.float32)}
                      for _ in range(T - 1)]
        saver.save_traj(i, {}, obs, policy_out)
        srcs.append(obs)

    layout, files = discover(str(tmp_path))
    assert layout == 'bucketed' and len(files) == 2

    # the saver pads to max_num_actions+1 frames; crop back via the reader
    reader = RoboNetTrajReader(str(tmp_path), batch_size=4, num_epochs=1,
                               shuffle=False, sequence_length=T)
    batch = next(reader)
    assert batch['images'].shape == (4, T, NCAM, H, W, 3)
    np.testing.assert_array_equal(batch['images'][0],
                                  srcs[0]['images'][:T])
    reader.close()


def test_training_consumes_hdf5(tmp_path):
    """train_predictor auto-detects an HDF5 data dir and optimizes on it."""
    _write_robonet_dir(tmp_path, 6)
    from visual_foresight_tpu.training.train_predictor import (build_argparser,
                                                               train)
    args = build_argparser().parse_args([
        '--data_dir', str(tmp_path), '--steps', '3', '--batch_size', '2',
        '--sequence_length', str(T), '--image_height', str(H),
        '--image_width', str(W), '--adim', '4', '--sdim', '5',
        '--num_masks', '2', '--camera', '0', '--log_every', '1',
        '--n_devices', '1'])
    history, _ = train(args)
    assert len(history) >= 2
    assert np.isfinite(history[-1]['loss'])

def test_jpeg_color_channels_not_swapped(tmp_path):
    """A pure-red scene must come back red — blurred-noise thresholds cannot
    catch an R/B swap, so pin the channel convention explicitly."""
    from visual_foresight_tpu.utils.file_2_hdf5 import save_hdf5
    frames = np.zeros((T, 1, H, W, 3), np.uint8)
    frames[..., 0] = 200  # strong red, zero blue
    save_hdf5(str(tmp_path / 'red.hdf5'), {'term_t': T - 1},
              {'images': frames, 'state': np.zeros((T, 5), np.float32)},
              {'actions': np.zeros((T, 4), np.float32)}, dict(META),
              video_encoding='jpeg', t_index=0)
    reader = RoboNetTrajReader(str(tmp_path), batch_size=1, num_epochs=1,
                               shuffle=False)
    img = next(reader)['images'][0, 0, 0].astype(np.float32)
    reader.close()
    assert img[..., 0].mean() > 150, 'red channel lost: R/B swapped'
    assert img[..., 2].mean() < 50, 'blue channel gained: R/B swapped'
