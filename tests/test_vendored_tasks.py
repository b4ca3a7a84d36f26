"""The vendored benchmark task sets are repo artifacts the EVAL campaigns
(and round-over-round comparability) depend on — guard their on-disk
contract (the format ``BenchmarkAgent._load_raw_data`` consumes)."""

import glob
import os
import pickle

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TASK_ROOT = os.path.join(REPO, 'benchmarks', 'tasks')

SETS = {
    'xz_lifting_bench20': dict(nobj=1, ntasks=20),
    'ag_bench20': dict(nobj=3, ntasks=20),
    'ag_bench20_hard': dict(nobj=3, ntasks=20, min_dist=0.25),
}


@pytest.mark.parametrize('name', sorted(SETS))
def test_task_set_contract(name):
    spec = SETS[name]
    trajs = sorted(glob.glob(os.path.join(TASK_ROOT, name,
                                          'traj_group0', 'traj*')))
    assert len(trajs) == spec['ntasks'], name

    dists = []
    for t in trajs:
        with open(os.path.join(t, 'agent_data.pkl'), 'rb') as f:
            agent_data = pickle.load(f)
        with open(os.path.join(t, 'obs_dict.pkl'), 'rb') as f:
            obs = pickle.load(f)
        assert 'reset_state' in agent_data
        qpos = np.asarray(obs['object_qpos'])
        # [start, goal] poses for every object
        assert qpos.shape == (2, spec['nobj'], 7)
        assert np.all(np.isfinite(qpos))
        # start + goal frame per camera
        ims = sorted(glob.glob(os.path.join(t, 'images0', 'im_*.png')))
        assert len(ims) == 2, t
        assert all(os.path.getsize(p) > 100 for p in ims)
        dists.append(float(np.max(
            np.linalg.norm(qpos[1, :, :2] - qpos[0, :, :2], axis=-1))))

    # a benchmark set must actually require object motion
    assert np.mean(dists) > 0.1, (name, np.mean(dists))
    if 'min_dist' in spec:
        assert min(dists) >= spec['min_dist'] - 1e-6, (name, min(dists))


def test_benchmark_configs_point_at_vendored_sets():
    for conf in ('xz_bench20', 'xz_bench20_random'):
        path = os.path.join(REPO, 'benchmarks', conf, 'hparams.py')
        src = open(path).read()
        assert 'xz_lifting_bench20' in src, conf
