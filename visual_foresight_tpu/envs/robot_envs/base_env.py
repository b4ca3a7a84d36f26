"""Real-robot environment (reference ``robot_envs/base_env.py:21-489``).

Wraps a RobotController + N CameraRecorders behind the standard env ABI:
workspace bounds from ``robot_configs.json``, clipped cartesian moves with
gripper commands, camera-desync detection raising ``Image_Exception``,
randomized / neutral resets with periodic object redistribution, and the
interactive click-based eval used for real-robot benchmarks.
"""

import copy
import json
import logging
import os
import random
import time

import numpy as np

import cv2

from visual_foresight_tpu.agent.general_agent import Image_Exception
from visual_foresight_tpu.envs.base_env import BaseEnv
from . import get_controller_class
from .util.camera_recorder import CameraRecorder
from .util.topic_utils import IMTopic
from .util.user_interface import select_points


def pix_resize(pix, target_width, original_width):
    return np.round(copy.deepcopy(pix).astype(np.float32) *
                    target_width / float(original_width)).astype(np.int64)


class BaseRobotEnv(BaseEnv):
    def __init__(self, env_params, _=None):
        self._hp = self._default_hparams()
        self._hp.start_state = []
        for name, value in env_params.items():
            # robot_type may be a controller CLASS (tests / unregistered robots)
            if name in ('camera_topics', 'start_state', 'robot_type'):
                setattr(self._hp, name, value)
            else:
                self._hp.set_hparam(name, value)
        self.savedir = None
        assert self._hp.action_space == 'xyz_yaw_gripper', \
            'only xyz_yaw_gripper action spaces supported'
        logging.info('initializing environment for %s', self._hp.robot_name)
        self._robot_name = self._hp.robot_name
        self._setup_robot()

        self._obs_tol = 0.5 if self._hp.opencv_tracking else self._hp.OFFSET_TOL

        RobotController = get_controller_class(self._hp.robot_type)
        self._controller = RobotController(
            self._robot_name, self._hp.print_debug,
            email_cred_file=self._hp.email_login_creds,
            log_file=self._hp.log_file,
            gripper_attached=self._hp.gripper_attached)
        log = logging.getLogger('robot_logger')
        log.info('-' * 75)
        for name, value in self._hp.values().items():
            log.info('%s = %s', name, value)
        log.info('-' * 75)

        self._save_video = self._hp.save_video
        self._cameras = [CameraRecorder(t, self._hp.opencv_tracking,
                                        self._save_video)
                         for t in self._hp.camera_topics]

        self._controller.open_gripper(True)
        self._controller.close_gripper(True)
        self._controller.open_gripper(True)

        if len(self._cameras) > 1:
            dims = (self._cameras[0].img_height, self._cameras[0].img_width)
            assert all((c.img_height, c.img_width) == dims
                       for c in self._cameras[1:]), \
                'camera image streams do not match'

        if len(self._cameras) == 1:
            self._cam_names = ['front']
        elif len(self._cameras) == 2:
            self._cam_names = ['front', 'left']
        else:
            self._cam_names = ['cam{}'.format(i)
                               for i in range(len(self._cameras))]
        self._height = self._cameras[0].img_height
        self._width = self._cameras[0].img_width

        self._base_adim, self._base_sdim = 5, 5
        self._adim, self._sdim = None, None
        self.mode_rel = np.array(self._hp.mode_rel)
        self._cleanup_rate = self._hp.cleanup_rate
        self._duration = self._hp.duration
        self._reset_counter, self._previous_target_qpos = 0, None
        self._start_pix, self._desig_pix, self._goal_pix = None, None, None
        self._last_obs = None

        self._goto_closest_neutral(duration=3)

    def _default_hparams(self):
        default_dict = {
            'robot_name': None,
            'robot_type': 'sawyer',
            'email_login_creds': '',
            'log_file': '',
            'gripper_attached': 'wsg-50',
            'camera_topics': [IMTopic('/camera0/image_raw', flip=True),
                              IMTopic('/camera1/image_raw')],
            'opencv_tracking': False,
            'save_video': False,
            'start_at_neutral': False,
            'start_box': [1., 1., 1.],
            'OFFSET_TOL': 0.06,
            'duration': 1.,
            'mode_rel': [True, True, True, True, False],
            'lower_bound_delta': [0., 0., 0., 0., 0.],
            'upper_bound_delta': [0., 0., 0., 0., 0.],
            'cleanup_rate': 25,
            'print_debug': False,
            'rand_drop_reset': True,
            'normalize_actions': False,
            'reset_before_eval': False,
            'action_space': 'xyz_yaw_gripper',
            'wait_during_resetend': False,
        }
        parent_params = BaseEnv._default_hparams(self)
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def _setup_robot(self):
        config_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   'robot_configs.json')
        try:
            with open(config_file) as f:
                robot_configs = json.load(f)
            self._low_bound = np.array(robot_configs[self._robot_name][0])
            self._high_bound = np.array(robot_configs[self._robot_name][1])
        except (ValueError, FileNotFoundError):
            raise ValueError('fill out the robot config at {}'.format(
                config_file))
        except KeyError:
            raise ValueError('robot {} missing from config {}'.format(
                self._robot_name, config_file))
        self._high_bound += np.array(self._hp.upper_bound_delta,
                                     dtype=np.float64)
        self._low_bound += np.array(self._hp.lower_bound_delta,
                                    dtype=np.float64)

    # -- stepping ---------------------------------------------------------------
    def step(self, action):
        if self._hp.normalize_actions:
            action[:3] *= self._high_bound[:3] - self._low_bound[:3]

        target_qpos = np.clip(self._next_qpos(action), self._low_bound,
                              self._high_bound)
        log = logging.getLogger('robot_logger')
        log.debug('target position: %s', target_qpos)

        if np.linalg.norm(target_qpos - self._previous_target_qpos) < 1e-3:
            return self._get_obs()

        gripper_midpoint = (self._low_bound[-1] + self._high_bound[-1]) / 2.0
        wait_change = (target_qpos[-1] > gripper_midpoint) != \
            (self._previous_target_qpos[-1] > gripper_midpoint)

        if self._save_video:
            for c in self._cameras:
                c.start_recording()

        if target_qpos[-1] > gripper_midpoint:
            self._controller.close_gripper(wait_change)
        else:
            self._controller.open_gripper(wait_change)
        self._move_to_state(target_qpos[:3], target_qpos[3])

        if self._save_video:
            for c in self._cameras:
                c.stop_recording()

        self._previous_target_qpos = target_qpos
        return self._get_obs()

    def _init_dynamics(self):
        pass

    def _next_qpos(self, action):
        raise NotImplementedError

    # -- observations --------------------------------------------------------------
    def _get_state(self):
        eep = self._controller.get_cartesian_pose()
        gripper_state = self._controller.get_gripper_state()[0]
        g_low, g_high = self._controller.get_gripper_limits()
        if g_high - g_low > 0:
            gripper_state = (gripper_state - g_low) / (g_high - g_low)

        state = np.zeros(self._base_sdim)
        state[:3] = (eep[:3] - self._low_bound[:3]) / \
            (self._high_bound[:3] - self._low_bound[:3])
        state[3] = self._controller.quat_2_euler(eep[3:])[0]
        state[4] = (1 - gripper_state) * self._low_bound[-1] + \
            gripper_state * self._high_bound[-1]
        return state

    def _get_obs(self):
        obs = {}
        j_angles, j_vel, eep = self._controller.get_state()
        gripper_state, force_sensor = self._controller.get_gripper_state()

        obs['qpos'] = j_angles
        if j_vel is not None:   # widowx has no joint velocity readings
            obs['qvel'] = j_vel
        obs['state'] = self._get_state()
        if force_sensor is not None:
            obs['finger_sensors'] = force_sensor

        self._last_obs = copy.deepcopy(obs)
        obs['images'] = self.render()
        obs['high_bound'] = copy.deepcopy(self._high_bound)
        obs['low_bound'] = copy.deepcopy(self._low_bound)

        if self._hp.opencv_tracking:
            track_desig = np.zeros((self.ncam, 1, 2), dtype=np.int64)
            for i, c in enumerate(self._cameras):
                track_desig[i] = c.get_track()
            self._desig_pix = track_desig
        if self._desig_pix is not None:
            obs['obj_image_locations'] = copy.deepcopy(self._desig_pix)
        return obs

    def _move_to_state(self, target_xyz, target_zangle, duration=1.5):
        target_quat = self._controller.euler_2_quat(target_zangle)
        self._controller.move_to_eep(
            np.concatenate((target_xyz, target_quat)), duration)

    def _reset_previous_qpos(self):
        xyz, quat = self._controller.get_xyz_quat()
        self._previous_target_qpos = np.zeros(self._base_sdim)
        self._previous_target_qpos[:3] = xyz
        self._previous_target_qpos[3] = self._controller.quat_2_euler(quat)[0]
        self._previous_target_qpos[4] = -1

    def save_recording(self, save_worker, i_traj):
        if not self._save_video:
            return
        buffers = [c.reset_recording() for c in self._cameras]
        if max(len(b) for b in buffers) == 0:
            return
        for name, b in zip(self._cam_names, buffers):
            save_worker.put(('mov', 'recording{}/{}_clip.mp4'.format(
                i_traj, name), b, 30))

    # -- resets -------------------------------------------------------------------
    def _end_reset(self):
        start_image = self.render()
        if self.savedir is not None:
            cv2.imwrite('{}/initial_image.jpg'.format(self.savedir),
                        start_image[0][:, :, ::-1])
        logging.getLogger('robot_logger').info(
            'finishing reset %d', self._reset_counter)
        if self._hp.wait_during_resetend:
            input('PRESS ENTER TO CONTINUE')
        if self._hp.opencv_tracking:
            assert self._desig_pix is not None, \
                'designated pixels must be set (call get_obj_desig_goal)'
            track = copy.deepcopy(self._desig_pix)
            for i, c in enumerate(self._cameras):
                c.start_tracking(track[i])
        self._reset_previous_qpos()
        self._init_dynamics()
        self._reset_counter += 1
        return self._get_obs(), None

    def _goto_closest_neutral(self, duration=2.):
        self._controller.move_to_neutral(duration)
        closest_neutral = self._get_state()
        closest_neutral[:3] = np.clip(closest_neutral[:3], [0., 0., 0.],
                                      self._hp.start_box)
        closest_neutral[:3] *= self._high_bound[:3] - self._low_bound[:3]
        closest_neutral[:3] += self._low_bound[:3]
        self._move_to_state(closest_neutral[:3], closest_neutral[3])

    def reset(self):
        if self._save_video:
            for c in self._cameras:
                c.reset_recording()

        if self._hp.start_at_neutral:
            self._controller.open_gripper(True)
            self._goto_closest_neutral()
            return self._end_reset()

        if self._hp.rand_drop_reset:
            rand_xyz = np.random.uniform(self._low_bound[:3],
                                         self._high_bound[:3])
            rand_xyz[2] = self._high_bound[2]
            rand_zangle = np.random.uniform(self._low_bound[3],
                                            self._high_bound[3])
            self._move_to_state(rand_xyz, rand_zangle, 2.)
            self._controller.close_gripper(True)
            self._controller.open_gripper(True)
            self._controller.move_to_neutral()
        else:
            self._controller.open_gripper(True)
            self._controller.move_to_neutral()

        if self._cleanup_rate == 0 or (
                self._cleanup_rate > 0 and
                self._reset_counter % self._cleanup_rate == 0 and
                self._reset_counter > 0):
            self._controller.redistribute_objects()
            self._goto_closest_neutral(5.)

        self._controller.move_to_neutral()
        self._controller.open_gripper(False)
        time.sleep(0.5)
        self._reset_previous_qpos()

        if self._hp.start_state:
            xyz = np.array(self._hp.start_state[:3]) * \
                (self._high_bound[:3] - self._low_bound[:3]) + \
                self._low_bound[:3]
            self._move_to_state(xyz, self._hp.start_state[3], 2.)
        else:
            rand_xyz = np.random.uniform(self._low_bound[:3],
                                         self._high_bound[:3])
            rand_zangle = np.random.uniform(self._low_bound[3],
                                            self._high_bound[3])
            self._move_to_state(rand_xyz, rand_zangle, 2.)

        return self._end_reset()

    def valid_rollout(self):
        return True

    def goal_reached(self):
        raise NotImplementedError('Environment has no goal')

    def has_goal(self):
        return False

    # -- rendering ---------------------------------------------------------------------
    def render(self):
        """Grab frames from all cameras, enforcing freshness and cross-camera
        sync (raises Image_Exception on desync)."""
        time_stamps, cam_imgs = [], []
        cur_time = time.time()
        log = logging.getLogger('robot_logger')
        for recorder in self._cameras:
            stamp, image = recorder.get_image()
            if abs(stamp - cur_time) > 10 * self._obs_tol:
                log.error('DESYNC: no camera ping in %.1f s',
                          10 * self._obs_tol)
                raise Image_Exception
            time_stamps.append(stamp)
            cam_imgs.append(image)

        if self.ncam > 1:
            for index, i in enumerate(time_stamps[:-1]):
                for j in time_stamps[index + 1:]:
                    if abs(i - j) > self._obs_tol:
                        log.error('DESYNC: cameras out of sync')
                        raise Image_Exception

        images = np.zeros((self.ncam, self._height, self._width, 3),
                          dtype=np.uint8)
        for c, img in enumerate(cam_imgs):
            images[c] = img[:, :, ::-1]
        return images

    @property
    def adim(self):
        return self._adim

    @property
    def sdim(self):
        return self._sdim

    @property
    def ncam(self):
        return len(self._cameras)

    @property
    def num_objects(self):
        return 0

    def seed(self, seed=None):
        random.seed(seed)
        np.random.seed(seed)

    # -- interactive benchmarking --------------------------------------------------
    def eval(self, target_width=None, save_dir=None, ntasks=None):
        if target_width is None:
            return None
        if self._hp.reset_before_eval:
            self._controller.open_gripper(True)
            self._controller.move_to_neutral()

        final_pix = select_points(self.render(), self._cam_names, 'final',
                                  save_dir, clicks_per_desig=1,
                                  n_desig=ntasks)
        goal_pix = self.get_goal_pix(target_width)
        final_pix = pix_resize(final_pix, target_width, self._width)
        start_pix = pix_resize(self._start_pix, target_width, self._width)

        final_dist = np.linalg.norm(final_pix - goal_pix)
        start_dist = np.linalg.norm(start_pix - goal_pix)
        improvement = start_dist - final_dist
        log = logging.getLogger('robot_logger')
        log.info('final_dist: %f start_dist: %f improvement: %f',
                 final_dist, start_dist, improvement)

        if self._hp.opencv_tracking:
            for c in self._cameras:
                c.end_tracking()
        return {'final_dist': final_dist, 'start_dist': start_dist,
                'improvement': improvement}

    def get_obj_desig_goal(self, save_dir, collect_goal_image=False, ntasks=1):
        input('Robot in safe position? Hit enter when ready...')
        self._goto_closest_neutral()
        self._controller.open_gripper(True)

        if collect_goal_image:
            print('PLACE OBJECTS IN GOAL POSITION')
            input('When ready to annotate GOAL images press enter...')
            goal_imgs = self.render()
            goal_pix = select_points(goal_imgs, self._cam_names, 'goal',
                                     save_dir, clicks_per_desig=1,
                                     n_desig=ntasks)
            input('Robot in safe position? Hit enter when ready...')
            self._goto_closest_neutral()
            self._controller.open_gripper(True)
            print('PLACE OBJECTS IN START POSITION')
            input('When ready to annotate START images press enter...')
            self._start_pix = select_points(self.render(), self._cam_names,
                                            'desig', save_dir,
                                            clicks_per_desig=1, n_desig=ntasks)
            self._goal_pix = copy.deepcopy(goal_pix)
            self._desig_pix = copy.deepcopy(self._start_pix)
            return goal_imgs, goal_pix

        print('PLACE OBJECTS IN START POSITION')
        input('When ready to annotate START images press enter...')
        self._start_pix, self._goal_pix = select_points(
            self.render(), self._cam_names, 'desig_goal', save_dir,
            n_desig=ntasks)
        self._desig_pix = copy.deepcopy(self._start_pix)
        return copy.deepcopy(self._goal_pix)

    def get_goal_image(self, savedir):
        self.savedir = savedir
        self._goto_closest_neutral()
        self._controller.open_gripper(True)
        input('hit enter when ready to take goal image')
        goal_img = self.render()
        self._goto_closest_neutral()
        self._controller.open_gripper(True)
        input('hit enter when objects put back')
        cv2.imwrite('{}/goal_image.jpg'.format(savedir),
                    goal_img[0][:, :, ::-1])
        return goal_img

    def get_goal_pix(self, target_width):
        return pix_resize(self._goal_pix, target_width, self._width)
