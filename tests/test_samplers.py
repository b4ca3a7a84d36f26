"""Sampler ecosystem semantics."""

import numpy as np
import pytest

from visual_foresight_tpu.utils.hparams import HParams


def _hp(d):
    return HParams(**d)


def test_correlated_noise_smoothing():
    from visual_foresight_tpu.policy.cem_controllers.samplers.correlated_noise import (
        CorrelatedNoiseSampler)
    hp = _hp(CorrelatedNoiseSampler.get_default_hparams())
    s = CorrelatedNoiseSampler(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 64, None)
    assert acts.shape == (64, hp.nactions, 4)
    # AR(1) smoothing: adjacent-step correlation must be clearly positive
    flat = acts[:, :, 0]
    corr = np.corrcoef(flat[:, :-1].ravel(), flat[:, 1:].ravel())[0, 1]
    assert corr > 0.3

    # MPPI mean update: low-score (good) plans dominate the refit mean
    best = np.zeros((4, hp.nactions, 4))
    best[0] += 1.0   # plan 0 is distinct...
    scores = np.array([0.0, 100.0, 100.0, 100.0])  # ...and much better
    np.random.seed(1)
    nxt = s.sample_next_actions(64, best, scores)
    assert abs(nxt[:, 5:, :].mean() - 1.0) < 0.45


def test_autograsp_sampler_gripper_logic():
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_sampler import (
        AutograspSampler)
    hp_dict = AutograspSampler.get_default_hparams()
    hp_dict.update({'rejection_sampling': False, 'nactions': 4, 'repeat': 1,
                    'z_thresh': 0.0, 'action_order': None})
    hp = _hp(hp_dict)
    s = AutograspSampler(hp, 4, 4)   # adim incl. gripper
    np.random.seed(0)
    # current z = 1.0, z_thresh = 0: gripper opens unless cumulative z dips
    acts = s.sample_initial_actions(0, 32, np.array([0, 0, 1.0]))
    assert acts.shape == (32, 4, 4)
    grip = acts[..., -1]
    assert set(np.unique(grip)).issubset({-1.0, 1.0})
    # without reopen, once closed stays closed
    for b in range(32):
        closed = np.where(grip[b] == hp.gripper_close_cmd)[0]
        if len(closed):
            assert np.all(grip[b, closed[0]:] == hp.gripper_close_cmd)


def test_folding_sampler_shapes_and_clip():
    from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
        FoldingCEMSampler)
    hp = _hp(FoldingCEMSampler.get_default_hparams())
    s = FoldingCEMSampler(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 12, np.array([0.5, 0.5, 0.2, 0]))
    assert acts.shape == (12, hp.nactions * hp.repeat, 4)
    assert np.abs(acts[:, :, :3]).max() <= max(hp.max_shift) + 1e-9
    nxt = s.sample_next_actions(12, acts, np.arange(12.0))
    assert nxt.shape == acts.shape


def test_autograsp_epsilon_pivot_on_repeat_boundary():
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_epsilon import (
        AutograspEpsilon)
    hp_dict = AutograspEpsilon.get_default_hparams()
    hp_dict.update({'nactions': 4, 'repeat': 2, 'ag_epsilon': 0.0,
                    'action_order': None, 'ag_zthresh': 0.0})
    hp = _hp(hp_dict)
    s = AutograspEpsilon(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 16, np.array([0, 0, 1.0, 0]))
    assert acts.shape == (16, 8, 4)
    grip = acts[..., -1]
    # with epsilon 0: grip flips happen only on repeat boundaries
    for b in range(16):
        changes = np.where(np.diff(grip[b]) != 0)[0] + 1
        assert all(c % hp.repeat == 0 for c in changes)


def test_sampler_policy_plays_fixed_plan():
    from visual_foresight_tpu.policy.random.sampler_policy import SamplerPolicy
    np.random.seed(0)
    p = SamplerPolicy({'T': 6, 'adim': 4}, {'beta_0': 0.7, 'beta_1': 0.3})
    a0 = p.act(t=0)['actions']
    a1 = p.act(t=1)['actions']
    assert a0.shape == (4,)
    # replays the t=0 plan (no resampling mid-traj)
    a0_again = p.act(t=0)  # new traj -> new plan
    assert not np.allclose(a0, a1)
