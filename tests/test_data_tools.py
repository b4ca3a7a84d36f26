"""Data-tool coverage: raw->TFRecord converter CLI, dataset QA helpers,
benchmark score reports, camera calibration homography."""

import os
import pickle as pkl

import cv2
import numpy as np


def _write_raw_traj(root, idx, T=4, ncam=1, h=16, w=20, seed=0):
    rng = np.random.RandomState(seed + idx)
    traj = os.path.join(root, 'traj_group0', 'traj{}'.format(idx))
    for n in range(ncam):
        os.makedirs(os.path.join(traj, 'images{}'.format(n)))
    for t in range(T):
        for n in range(ncam):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite('{}/images{}/im_{}.jpg'.format(traj, n, t),
                        img[:, :, ::-1])
    obs = {'state': rng.randn(T + 1, 3).astype(np.float64)}
    agent_data = {'term_t': T - 1, 'traj_ok': True}
    policy_out = [{'actions': rng.randn(3)} for _ in range(T)]
    for name, data in (('agent_data', agent_data), ('obs_dict', obs),
                       ('policy_out', policy_out)):
        with open('{}/{}.pkl'.format(traj, name), 'wb') as f:
            pkl.dump(data, f)
    return traj


def test_file_2_record_roundtrip(tmp_path):
    raw = tmp_path / 'raw'
    for i in range(3):
        _write_raw_traj(str(raw), i)

    out = tmp_path / 'records'
    from visual_foresight_tpu.utils.file_2_record import main
    main([str(out), str(raw), '20', '--T', '4', '--nworkers', '1',
          '--traj_per_file', '3', '--split', '1.0', '0.0', '0.0'])

    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(str(out), batch_size=3,
                          hparams_dict={'shuffle': False})
    images = ds.get('images', 'train')
    assert images.shape == (3, 4, 1, 16, 20, 3)
    actions = ds.get('actions', 'train')
    assert actions.shape == (3, 4, 3)


def test_check_dataset_helpers():
    from visual_foresight_tpu.utils.check_dataset import (action_stats,
                                                          lift_success_rate,
                                                          tile_frames)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 3, 1, 8, 10, 3), np.uint8)
    tiled = tile_frames(imgs)
    assert tiled.shape == (16, 30, 3)

    states = np.zeros((4, 5, 3))
    states[..., -1] = 1.0            # gripper open everywhere
    assert lift_success_rate(states) == 0.0
    states[0, 2, -1] = 0.5           # closed...
    states[0, 2, 1] = 0.05           # ...and high
    assert lift_success_rate(states) == 0.25

    stats = action_stats(rng.randn(2, 5, 3))
    assert len(stats['action_mean']) == 3


def test_write_and_combine_scores(tmp_path):
    import pickle
    from collections import OrderedDict

    from visual_foresight_tpu.sim.util.combine_score import (combine_scores,
                                                             write_scores)
    conf = {'agent': {'T': 5}, 'start_index': 0}
    stats = OrderedDict(improvement=np.array([0.1, 0.3, -0.05]),
                        final_dist=np.array([0.2, 0.05, 0.4]),
                        initial_dist=np.array([0.3, 0.35, 0.35]))
    write_scores(conf, str(tmp_path / 'results_0to2.txt'), stats)
    text = (tmp_path / 'results_0to2.txt').read_text()
    assert 'average pos improvement' in text

    with open(tmp_path / 'scores_0to2.pkl', 'wb') as f:
        pickle.dump(stats, f)
    combined = combine_scores(conf, str(tmp_path))
    assert (tmp_path / 'results_all.txt').exists()
    assert (tmp_path / 'improvement.png').exists()
    assert combined['improvement'].shape == (3,)


def test_camera_calibration_roundtrip():
    from visual_foresight_tpu.sim.util.camera_calib import CalibratedCamera
    rng = np.random.RandomState(0)
    # synthetic ground-truth homography
    H_true = np.array([[0.002, 0.0001, -0.3], [0.0002, -0.0025, 0.5],
                       [0.00001, 0.00002, 1.0]])
    pixels = rng.uniform(0, 480, (12, 2))
    homo = np.concatenate([pixels, np.ones((12, 1))], 1)
    world = (homo @ H_true.T)
    world = world[:, :2] / world[:, 2:3]

    cam = CalibratedCamera(pixels, world)
    got = cam.pixel_to_world(pixels)
    assert np.allclose(got, world, atol=1e-6)
    back = cam.world_to_pixel(world)
    assert np.allclose(back, pixels, atol=1e-4)


def test_make_transport_tasks_generate():
    """Goal-teleport task generation: start/goal snapshots, min-distance
    respected, objects at rest (no tunneling/explosion)."""
    import numpy as np
    from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
        AutograspCartgripperEnv)
    from visual_foresight_tpu.sim.util.make_transport_tasks import generate

    env = AutograspCartgripperEnv({
        'num_objects': 2, 'viewer_image_height': 48,
        'viewer_image_width': 64, 'cube_objects': True, 'ncam': 1,
        'autograsp': {'zthresh': -0.06, 'touchthresh': 0.0, 'reopen': True},
    })
    rng = np.random.RandomState(0)
    for _ in range(5):   # some random scenes legitimately fail the
        _, reset_state = env.reset()   # stability guard — that's its job
        try:
            rs, fs, fg, qpos2, dist = generate(env, reset_state, 0.2, rng,
                                               settle_steps=500)
            break
        except ValueError:
            continue
    else:
        raise AssertionError('no stable scene in 5 resets')
    assert qpos2.shape == (2, 2, 7)
    assert dist >= 0.15                          # settled near the target
    assert np.all(np.abs(qpos2[:, :, :3]) < 1.5)  # nothing exploded
    assert len(fs) == 1 and fs[0].shape == fg[0].shape
    # the distractor stays put
    assert np.linalg.norm(qpos2[1, 1, :2] - qpos2[0, 1, :2]) < 0.05


def test_merge_record_splits_multi_source(tmp_path):
    """Multi-root merge: shards from every source land collision-free,
    boost-good links only good/ train shards, manifest copied once."""
    import sys
    sys.path.insert(0, '/root/repo/scripts')
    from merge_record_splits import merge

    roots = []
    for si in range(2):
        root = tmp_path / 'camp{}'.format(si) / 'records'
        for half in ('good', 'bad'):
            for split in ('train', 'val'):
                d = root / half / split
                d.mkdir(parents=True)
                (d / 'traj_0_to_1.tfrecords').write_bytes(
                    b'shard-%d-%s-%s' % (si, half.encode(), split.encode()))
            (root / half / 'manifest.txt').write_text('# DATA MANIFEST\n')
        roots.append(str(root))

    out = merge(roots, boost_good=2, out_dir=str(tmp_path / 'merged'))
    train = sorted(os.listdir(os.path.join(out, 'train')))
    val = sorted(os.listdir(os.path.join(out, 'val')))
    # per source: 1 bad + 1 good + 2 boosted good = 4 train shards
    assert len(train) == 8 and len(val) == 4
    assert all(n.startswith(('src0_', 'src1_')) for n in train + val)
    assert sum('goodboost' in n for n in train) == 4
    assert not any('goodboost' in n for n in val)
    # hardlinks, not copies — and the manifest came along
    assert os.stat(os.path.join(out, 'train', train[0])).st_nlink == 2
    assert os.path.isfile(os.path.join(out, 'manifest.txt'))

    # single-root call keeps the legacy prefix-free naming
    out1 = merge(roots[0], out_dir=str(tmp_path / 'merged1'))
    names = sorted(os.listdir(os.path.join(out1, 'train')))
    assert names == ['bad_train_traj_0_to_1.tfrecords',
                     'good_train_traj_0_to_1.tfrecords']
