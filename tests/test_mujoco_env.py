import numpy as np
import pytest

from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)

ENV_PARAMS = {'viewer_image_height': 96, 'viewer_image_width': 128,
              'cube_objects': True}


@pytest.fixture(scope='module')
def env():
    np.random.seed(0)
    return CartgripperXZGrasp(dict(ENV_PARAMS))


def test_reset_obs_contract(env):
    obs, reset_state = env.reset()
    assert obs['images'].shape == (1, 96, 128, 3)
    assert obs['images'].dtype == np.uint8
    assert obs['state'].shape == (3,)
    assert obs['qpos'].shape == (6,)
    assert obs['object_poses_full'].shape == (1, 7)
    assert obs['obj_image_locations'].shape == (1, 1, 2)
    assert 'reset_xml' in reset_state and 'qpos_all' in reset_state
    assert env.adim == 3 and env.sdim == 3 and env.ncam == 1


def test_step_tracks_target(env):
    obs, _ = env.reset()
    x0 = obs['state'][0]
    o = env.step(np.array([0.05, 0.0, -1.0]))
    assert abs(o['state'][0] - np.clip(x0 + 0.05, -0.4, 0.4)) < 0.02
    assert env.valid_rollout()


def test_reset_state_reproducible(env):
    _, reset_state = env.reset()
    obs2, _ = env.reset(reset_state)
    qpos = reset_state['qpos_all']
    assert np.allclose(obs2['qpos_full'][6:9], qpos[6:9], atol=5e-2)


def test_projection_matches_render(env):
    """The designated-pixel projection must land on the rendered object."""
    np.random.seed(3)
    env.reset()
    # move the arm out of the way so the cube is unoccluded
    env._data.qpos[0] = -0.39
    env._data.qpos[2] = 0.15
    env._forward()
    img = env.render()[0]
    spec = env._reset_xml[0]
    target = spec['color1'] * 255
    dist = np.linalg.norm(img.astype(float) - target[None, None], axis=-1)
    ys, xs = np.where(dist < 60)
    assert len(ys) > 10, 'cube not visible in render'
    row, col = env.project_point(env._data.qpos[6:9], 'cam0')
    assert abs(row - ys.mean()) < 8
    assert abs(col - xs.mean()) < 8


def test_grasp_goal_detection():
    """Teleport the cube into the closed gripper, lift, and expect goal_reached."""
    np.random.seed(1)
    env = CartgripperXZGrasp(dict(ENV_PARAMS))
    env.reset()
    env.generate_task()   # random arm move + block placed in gripper
    # after generate_task the block hangs in the gripper; lift and check
    env._init_dynamics()
    env._object_floors[:, 2] = -0.1  # pretend floor level so delta large
    env.step(np.array([0.0, 0.14, 1.0]))
    assert env.has_goal()


def test_autograsp_cartgripper_env():
    """Autograsp sim env: 4-dim actions, auto-close below zthresh, 2 cams,
    touch sensors present."""
    from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
        AutograspCartgripperEnv)
    np.random.seed(0)
    env = AutograspCartgripperEnv(dict(ENV_PARAMS))
    obs, _ = env.reset()
    assert env.adim == 4 and env.sdim == 5 and env.ncam == 2
    assert obs['images'].shape == (2, 96, 128, 3)
    assert 'finger_sensors' in obs
    assert not env._gripper_closed
    for _ in range(3):
        obs = env.step(np.array([0.0, 0.0, -0.1, 0.0]))
    assert env._gripper_closed        # dropped below zthresh
    assert obs['state'][-1] == 1      # closed flag in state


def test_pusher_and_xyz_envs():
    from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_pusher import (
        CartgripperPusherEnv)
    from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xyz import (
        CartgripperXYZEnv)
    np.random.seed(1)
    pusher = CartgripperPusherEnv(dict(ENV_PARAMS))
    obs, _ = pusher.reset()
    assert pusher.adim == 4
    obs = pusher.step(np.array([0.05, -0.02, 0.0, 0.1]))
    assert obs['state'].shape == (4,)

    xyz = CartgripperXYZEnv(dict(ENV_PARAMS))
    obs, _ = xyz.reset()
    assert xyz.adim == 3
    obs = xyz.step(np.array([0.03, 0.0, -0.02]))
    assert obs['state'].shape == (3,)
