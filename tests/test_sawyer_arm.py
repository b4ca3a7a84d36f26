"""Visible-arm Sawyer sim smoke tests: the 7-DoF arm renders in frame, the
IK servo tracks end-effector targets, and the obs dict honors the
agent-facing contract (reference parity target:
``visual_mpc/envs/mujoco_env/sawyer_env`` + ``robosuite_wrappers``)."""

import numpy as np
import pytest

from visual_foresight_tpu.envs.mujoco_env.sawyer_env.sawyer_arm_env import (
    SawyerArmEnv, low_bound, high_bound)

PARAMS = {'num_objects': 1, 'viewer_image_height': 48,
          'viewer_image_width': 64, 'cube_objects': True}


@pytest.fixture(scope='module')
def env():
    e = SawyerArmEnv(dict(PARAMS))
    e._rng = np.random.RandomState(7)
    return e


def test_reset_obs_contract(env):
    obs, reset_state = env.reset()
    assert obs['images'].shape == (2, 48, 64, 3)
    assert obs['state'].shape == (5,)
    assert obs['qpos'].shape == (9,)                  # 7 arm + 2 fingers
    assert obs['object_poses_full'].shape == (1, 7)
    assert obs['obj_image_locations'].shape == (2, 1, 2)
    assert obs['eef_pos'].shape == (3,) and obs['eef_quat'].shape == (4,)
    assert 'qpos_all' in reset_state and 'reset_xml' in reset_state
    assert env.adim == 5 and env.sdim == 5 and env.ncam == 2


def test_ik_servo_tracks_targets(env):
    env.reset()
    for i in range(3):
        obs = env.step(np.array([0.04 * (-1) ** i, -0.04, -0.02, 0.2, -1]))
        err = np.linalg.norm(obs['eef_pos'] - env._target_pose[:3])
        assert err < 0.01, 'gravity-compensated IK servo must track <1cm'
    assert np.all(env._target_pose >= low_bound - 1e-9)
    assert np.all(env._target_pose <= high_bound + 1e-9)
    assert env.valid_rollout()


def test_arm_is_rendered_in_frame(env):
    obs = env.current_obs()
    noarm = env.snapshot_noarm()
    diff = np.abs(obs['images'][0].astype(int) - noarm.astype(int)).mean()
    assert diff > 2.0, 'arm pixels must dominate the frame difference'


def test_reset_state_reproduces_scene(env):
    obs1, rs = env.reset()
    env2 = SawyerArmEnv(dict(PARAMS), reset_state=rs)
    obs2, _ = env2.reset(rs)
    np.testing.assert_allclose(obs2['qpos'][:7], obs1['qpos'][:7], atol=0.05)
    np.testing.assert_allclose(obs2['object_qpos'], obs1['object_qpos'],
                               atol=0.05)


def test_grip_binarization(env):
    env.reset()
    obs = env.step(np.array([0, 0, 0, 0, 0.3]))
    assert obs['state'][4] == 1.0          # >0 closes
    obs = env.step(np.array([0, 0, 0, 0, -0.3]))
    assert obs['state'][4] == -1.0
