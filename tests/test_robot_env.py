"""Hermetic BaseRobotEnv test: a fake kinematic controller + the native
camera node stand in for ROS/hardware, exercising the full step/reset/obs
flow including the camera-sync render path."""

import os
import subprocess
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'visual_foresight_tpu', 'native')
BINARY = os.path.join(NATIVE_DIR, 'camera_stream')


class FakeController:
    """Kinematically perfect fake arm with the RobotController surface."""

    def __init__(self, robot_name, print_debug=False, email_cred_file='',
                 log_file='', gripper_attached='none'):
        self._xyz = np.array([0.6, 0.0, 0.25])
        self._yaw = 0.0
        self._gripper = 1.0   # open fraction

    # gripper surface
    def get_gripper_state(self, integrate_force=False):
        return self._gripper, None

    def get_gripper_limits(self):
        return 0.0, 1.0

    def open_gripper(self, wait=False):
        self._gripper = 1.0

    def close_gripper(self, wait=False):
        self._gripper = 0.0

    # kinematics
    def quat_2_euler(self, quat):
        from scipy.spatial.transform import Rotation
        yaw, pitch, roll = Rotation.from_quat(
            np.roll(np.asarray(quat), -1)).as_euler('ZYX')
        return np.array([yaw, pitch, roll])

    def euler_2_quat(self, yaw=0.0, pitch=0.0, roll=0.0):
        from scipy.spatial.transform import Rotation
        return np.roll(Rotation.from_euler(
            'ZYX', [yaw, pitch, roll]).as_quat(), 1)

    # state/motion
    def get_state(self):
        return np.zeros(7), np.zeros(7), self.get_cartesian_pose()

    def get_cartesian_pose(self):
        return np.concatenate([self._xyz, self.euler_2_quat(self._yaw)])

    def get_xyz_quat(self):
        eep = self.get_cartesian_pose()
        return eep[:3], eep[3:]

    def move_to_eep(self, target_pose, duration=1.5):
        self._xyz = np.asarray(target_pose[:3])
        self._yaw = self.quat_2_euler(target_pose[3:])[0]

    def move_to_neutral(self, duration=2.0):
        self._xyz = np.array([0.6, 0.0, 0.25])
        self._yaw = 0.0

    def redistribute_objects(self):
        pass


@pytest.fixture(scope='module')
def camera_proc():
    if not os.path.isfile(BINARY):
        build = subprocess.run(['make'], cwd=NATIVE_DIR, capture_output=True)
        if build.returncode != 0:
            pytest.skip('camera_stream build failed')
    proc = subprocess.Popen(
        [BINARY, '--channel', 'robot_test_cam', '--test-pattern',
         '--width', '64', '--height', '48', '--fps', '60'],
        stderr=subprocess.DEVNULL)
    time.sleep(0.5)
    yield proc
    proc.terminate()
    proc.wait(timeout=5)


def test_vanilla_robot_env_step(camera_proc, tmp_path, monkeypatch):
    from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
    from visual_foresight_tpu.envs.robot_envs.vanilla_env import VanillaEnv

    env_params = {
        'robot_name': 'example_robot',
        'robot_type': FakeController,
        'gripper_attached': 'none',
        'camera_topics': [IMTopic('robot_test_cam', height=48, width=64)],
        'start_at_neutral': True,
        'cleanup_rate': -1,
        'save_video': False,
    }
    env = VanillaEnv(env_params)
    assert env.adim == 5 and env.sdim == 5 and env.ncam == 1

    obs, reset_state = env.reset()
    assert obs['images'].shape == (1, 48, 64, 3)
    assert obs['state'].shape == (5,)
    assert np.all(obs['state'][:3] >= -0.01) and np.all(obs['state'][:3] <= 1.01)

    prev_state = obs['state'].copy()
    obs2 = env.step(np.array([0.05, 0.02, -0.01, 0.1, -1.0]))
    # fake controller moves exactly; normalized state must change accordingly
    assert not np.allclose(obs2['state'][:3], prev_state[:3])
    assert env.valid_rollout()


def test_autograsp_robot_env(camera_proc):
    from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
    from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic

    env_params = {
        'robot_name': 'example_robot',
        'robot_type': FakeController,
        'gripper_attached': 'none',
        'camera_topics': [IMTopic('robot_test_cam', height=48, width=64)],
        'start_at_neutral': True,
        'cleanup_rate': -1,
        'zthresh': 0.6,
    }
    env = AutograspEnv(env_params)
    assert env.adim == 4
    obs, _ = env.reset()
    # drive the arm downward: autograsp must close the (virtual) gripper once
    # below zthresh — gripper command is the last dim of the target qpos
    for _ in range(4):
        obs = env.step(np.array([0.0, 0.0, -0.2, 0.0]))
    assert env._gripper_closed
