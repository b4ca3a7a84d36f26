"""TFRecord writer <-> reader round trip: write synthetic trajectories through
GeneralAgentSaver, read them back with BaseVideoDataset, compare tensors."""

import numpy as np
import pytest

from visual_foresight_tpu.agent.utils.traj_saver import GeneralAgentSaver


def _synthetic_traj(T=4, ncam=1, h=8, w=12, adim=3, seed=0):
    rng = np.random.RandomState(seed)
    agent_data = {'term_t': T - 1, 'traj_ok': True}
    obs = {
        'images': rng.randint(0, 255, size=(T + 1, ncam, h, w, 3), dtype=np.uint8),
        'state': rng.randn(T + 1, adim).astype(np.float64),
    }
    policy_out = [{'actions': rng.randn(adim)} for _ in range(T)]
    return agent_data, obs, policy_out


@pytest.mark.slow
def test_roundtrip(tmp_path):
    T = 4
    saver = GeneralAgentSaver(str(tmp_path), T, seperate_good=False,
                              traj_per_file=2, split=(1.0, 0.0, 0.0))
    trajs = [_synthetic_traj(T, seed=s) for s in range(4)]
    for agent_data, obs, policy_out in trajs:
        saver.save_traj(dict(agent_data), obs, policy_out)
    saver.flush()

    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(str(tmp_path), batch_size=4,
                          hparams_dict={'shuffle': False})
    images = ds.get('images', 'train')
    states = ds.get('state', 'train')
    actions = ds.get('actions', 'train')

    assert images.shape == (4, T, 1, 8, 12, 3)
    assert states.shape == (4, T, 3)
    assert actions.shape == (4, T, 3)

    # order within a file is write order; verify against source trajectories
    written_imgs = np.stack([t[1]['images'][:T, 0] for t in trajs])
    got = images[:, :, 0]
    # batch rows may be file-ordered; check every written traj appears exactly
    matched = 0
    for wi in written_imgs:
        if any(np.array_equal(wi, got[b]) for b in range(4)):
            matched += 1
    assert matched == 4

    # per-key fetches come from the SAME batch: every (image, state) row
    # pairs up with one source trajectory consistently
    for b in range(4):
        src = next(i for i, t in enumerate(trajs)
                   if np.array_equal(t[1]['images'][:T, 0], got[b]))
        assert np.allclose(states[b], trajs[src][1]['state'][:T].astype(np.float32))
        assert np.allclose(
            actions[b],
            np.stack([p['actions'] for p in trajs[src][2]]).astype(np.float32))

    # requesting a served key again advances to a fresh batch with batch_size 2
    ds2 = BaseVideoDataset(str(tmp_path), batch_size=2,
                           hparams_dict={'shuffle': False})
    first = ds2.get('images', 'train')
    second = ds2.get('images', 'train')
    assert not np.array_equal(first, second)


def test_split_fractions_respect_weights(tmp_path, monkeypatch):
    """Regression: the empty-mode seeding must stop after ONE buffered traj
    per mode — gating on flushed-file counters alone force-fed val/test
    until each flushed a whole traj_per_file file (observed: 37% of a
    1,100-traj collection landed in val/test instead of ~10%)."""
    from visual_foresight_tpu.agent.utils import record_saver as rs

    monkeypatch.setattr(rs, 'save_tf_record', lambda *a, **k: None)
    saver = rs.RecordSaver(str(tmp_path), sequence_length=4,
                           traj_per_file=128)
    np.random.seed(0)
    n = 2000
    for _ in range(n):
        saver.add_traj({'dummy': 0})
    saver.flush()
    train_frac = saver._save_counters[0] / float(n)
    assert train_frac > 0.85, 'train starved: {:.2f}'.format(train_frac)
    # every mode still seeded
    assert all(c > 0 for c in saver._save_counters)
