"""HDF5 export coverage: agent-side padded saver and the RoboNet-format
file exporter."""

import json
import os
import pickle as pkl

import h5py
import numpy as np


def test_hdf5_saver_pads_and_masks(tmp_path):
    from visual_foresight_tpu.agent.utils.hdf5_saver import (HDF5Saver,
                                                             get_pad_mask)
    rng = np.random.RandomState(0)
    T_max, T_actual = 6, 4
    saver = HDF5Saver(str(tmp_path), {}, {'T': T_max}, traj_per_file=1,
                      split=(1.0, 0.0, 0.0))
    obs = {'images': rng.randint(0, 255, (T_actual + 1, 1, 8, 10, 3),
                                 np.uint8),
           'state': rng.randn(T_actual + 1, 3)}
    policy_out = [{'actions': rng.randn(3)} for _ in range(T_actual)]
    saver.save_traj(0, {}, obs, policy_out)

    files = []
    for root, _, fs in os.walk(tmp_path):
        files += [os.path.join(root, f) for f in fs if f.endswith('.h5')]
    assert len(files) == 1
    with h5py.File(files[0], 'r') as F:
        traj = F['traj0']
        assert traj['images'].shape[0] == T_max + 1
        assert traj['actions'].shape == (T_max, 3)
        mask = np.asarray(traj['pad_mask'])
        assert mask.sum() == T_actual + 1

    assert np.array_equal(get_pad_mask(4, 6),
                          [1, 1, 1, 1, 1, 0, 0])


def test_file_2_hdf5_export(tmp_path):
    import cv2

    from visual_foresight_tpu.utils.file_2_hdf5 import MANDATORY_KEYS, main
    rng = np.random.RandomState(0)
    traj = tmp_path / 'raw' / 'traj_group0' / 'traj0'
    os.makedirs(traj / 'images0')
    for t in range(3):
        cv2.imwrite(str(traj / 'images0' / 'im_{}.png'.format(t)),
                    rng.randint(0, 255, (8, 10, 3), np.uint8))
    for name, data in (('agent_data', {'term_t': 2}),
                       ('obs_dict', {'state': rng.randn(4, 3)}),
                       ('policy_out', [{'actions': rng.randn(3)}
                                       for _ in range(3)])):
        with open(traj / '{}.pkl'.format(name), 'wb') as f:
            pkl.dump(data, f)

    meta = {k: 'test' for k in MANDATORY_KEYS}
    meta_path = tmp_path / 'meta.json'
    meta_path.write_text(json.dumps(meta))

    out = tmp_path / 'hdf5_out'
    main([str(out), str(tmp_path / 'raw'), '--metadata', str(meta_path)])
    files = list(out.glob('*.hdf5'))
    assert len(files) == 1
    with h5py.File(files[0], 'r') as F:
        assert 'env' in F and 'policy' in F and 'metadata' in F
        assert F['env'].attrs['n_cams'] == 1
        # jpeg-encoded frame decodes back to the right shape
        frame = cv2.imdecode(np.asarray(F['env/cam0_video/frame0']),
                             cv2.IMREAD_COLOR)
        assert frame.shape == (8, 10, 3)
