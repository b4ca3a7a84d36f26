"""Benchmark agent (reference ``visual_mpc/agent/benchmarking_agent.py``).

Loads start/goal configurations from raw trajectory folders (produced by
``save_raw_images`` collection runs), re-creates the exact scene via the stored
``reset_state``, exposes the goal to the env, and reports ``env.eval()`` stats
after every rollout.
"""

import os
import pickle as pkl
import shutil

import cv2
import numpy as np

from visual_foresight_tpu.utils.im_utils import resize_store
from .general_agent import GeneralAgent


class BenchmarkAgent(GeneralAgent):
    def __init__(self, hyperparams, start_saver=True):
        self._start_goal_confs = hyperparams.get('start_goal_confs', None)
        if 'camera_topics' in hyperparams['env'][1]:
            self.ncam = len(hyperparams['env'][1]['camera_topics'])
        elif 'ncam' in hyperparams['env'][1]:
            # sim envs may override their class default camera count
            self.ncam = hyperparams['env'][1]['ncam']
        else:
            self.ncam = hyperparams['env'][0].default_ncam()
        GeneralAgent.__init__(self, hyperparams, start_saver=start_saver)
        if not self._is_robot:
            self._hyperparams['gen_xml'] = 1

    def _post_process_obs(self, env_obs, agent_data, initial_obs=False):
        obs = super()._post_process_obs(env_obs, agent_data, initial_obs)
        agent_data['verbose_worker'] = self._save_worker
        return obs

    def _setup_world(self, itr):
        old_ncam = self.ncam
        self._reset_state = self._load_raw_data(itr)
        GeneralAgent._setup_world(self, itr)
        assert old_ncam == self.ncam, \
            'environment has {} cameras but benchmark has {}'.format(
                self.ncam, old_ncam)

    def _required_rollout_metadata(self, agent_data, traj_ok, t, i_traj, i_itr,
                                   reset_state):
        GeneralAgent._required_rollout_metadata(self, agent_data, traj_ok, t,
                                                i_traj, i_itr, reset_state)
        point_target_width = self._hyperparams.get(
            'point_space_width', self._hyperparams['image_width'])
        ntasks = self._hyperparams.get('ntask', 1)
        if 'no_goal_def' not in self._hyperparams:
            agent_data['stats'] = self.env.eval(
                point_target_width, self._hyperparams.get('_bench_save', None),
                ntasks)

        if not traj_ok and self._is_robot:
            print('WARNING: TRAJ FAILED')
            if 'n' in input('would you like to retry? (y/n): '):
                agent_data['traj_ok'] = True

    def _init(self):
        if self._is_robot:
            return self._init_robot()
        self.env.set_goal_obj_pose(self._goal_obj_pose)
        return GeneralAgent._init(self)

    def _init_robot(self):
        if '_bench_save' not in self._hyperparams:
            raise ValueError("benchmark dir missing — did you pass --benchmark?")
        done = False
        while not done:
            if os.path.exists(self._hyperparams['_bench_save']):
                shutil.rmtree(self._hyperparams['_bench_save'])
            os.makedirs(self._hyperparams['_bench_save'])
            ntasks = self._hyperparams.get('ntask', 1)
            goal_dims = (1, self.ncam, self._hyperparams['image_height'],
                         self._hyperparams['image_width'], 3)

            if 'no_goal_def' not in self._hyperparams:
                if 'register_gtruth' in self._hyperparams and \
                        len(self._hyperparams['register_gtruth']) == 2:
                    raw_goal_image, self._goal_obj_pose = \
                        self.env.get_obj_desig_goal(
                            self._hyperparams['_bench_save'], True,
                            ntasks=ntasks)
                    self._goal_image = np.zeros(goal_dims, dtype=np.uint8)
                    resize_store(0, self._goal_image, raw_goal_image)
                    self._goal_image = self._goal_image.astype(np.float32) / 255.
                else:
                    self._goal_obj_pose = self.env.get_obj_desig_goal(
                        self._hyperparams['_bench_save'], ntasks=ntasks)
            else:
                if 'goal_image_only' in self._hyperparams:
                    raw_goal_image = self.env.get_goal_image(
                        self._hyperparams['_bench_save'])
                    self._goal_image = np.zeros(goal_dims, dtype=np.uint8)
                    resize_store(0, self._goal_image, raw_goal_image)
                    self._goal_image = self._goal_image.astype(np.float32) / 255.
                elif 'load_goal_image' in self._hyperparams:
                    im = cv2.imread(
                        self._hyperparams['load_goal_image'])[..., ::-1]
                    self._goal_image = np.zeros(goal_dims, dtype=np.uint8)
                    resize_store(0, self._goal_image, im[None])
                    self._goal_image = self._goal_image.astype(np.float32) / 255.
                else:
                    raise NotImplementedError
            if 'no_goal_def' in self._hyperparams or \
                    'y' in input('Is definition okay? (y/n): '):
                done = True
                if self._save_worker is not None:
                    self._save_worker.put(
                        ('path', self._hyperparams['_bench_save']))
        return GeneralAgent._init(self)

    def _load_raw_data(self, itr):
        """Inverse of raw saving: re-read goal images, desig pixels and the
        reset_state for trajectory ``itr`` from the start_goal_confs folder."""
        if self._is_robot:
            return None
        itr = self._hyperparams.get('iex', itr)

        ngroup = 1000
        igrp = itr // ngroup
        traj_folder = os.path.join(
            '{}/traj_group{}'.format(self._start_goal_confs, igrp),
            'traj{}'.format(itr))
        print('reading from: ', traj_folder)
        num_images = self._hyperparams.get('num_load_steps', 2)

        goal_images = np.zeros([num_images, self.ncam,
                                self._hyperparams['image_height'],
                                self._hyperparams['image_width'], 3])
        for t in range(num_images):
            for i in range(self.ncam):
                image_file = '{}/images{}/im_{}.png'.format(traj_folder, i, t)
                if not os.path.isfile(image_file):
                    raise ValueError(
                        "can't find goal image: {}".format(image_file))
                img = cv2.imread(image_file)[..., ::-1]
                if img.shape[:2] != goal_images.shape[2:4]:
                    img = cv2.resize(
                        img, (goal_images.shape[3], goal_images.shape[2]),
                        interpolation=cv2.INTER_AREA)
                goal_images[t, i] = img
        self._goal_image = goal_images.astype(np.float32) / 255.

        with open('{}/agent_data.pkl'.format(traj_folder), 'rb') as f:
            agent_data = pkl.load(f)
        with open('{}/obs_dict.pkl'.format(traj_folder), 'rb') as f:
            obs_dict = pkl.load(f)
        reset_state = agent_data['reset_state']
        self._goal_obj_pose = obs_dict['object_qpos'][-1]

        verbose_dir = '{}/verbose/traj_{}'.format(
            self._hyperparams['data_save_dir'], itr)
        if self._save_worker is not None:
            self._save_worker.put(('path', verbose_dir))
        return reset_state

    @property
    def record_path(self):
        if self._is_robot:
            return self._hyperparams['_bench_save']
        return self._hyperparams['data_save_dir'] + '/record/'
