"""Rollout engine.

Drives the policy<->env loop for T steps, accumulates observations into fixed
pre-allocated caches (images resized to the agent's operating resolution),
retries failed trajectories, and attaches mandatory metadata
(reference ``visual_mpc/agent/general_agent.py:55-228``).
"""

import copy

import numpy as np

from visual_foresight_tpu.policy import get_policy_args
from visual_foresight_tpu.utils.im_utils import resize_store
from .utils.file_saver import start_file_worker


class Bad_Traj_Exception(Exception):
    pass


class Image_Exception(Exception):
    pass


class Environment_Exception(Exception):
    pass


class GeneralAgent(object):
    """All communication between algorithms and the environment goes through
    this class."""

    def __init__(self, hyperparams, start_saver=True):
        self._hyperparams = hyperparams
        self.T = self._hyperparams['T']
        self._goal_obj_pose = None
        self._goal_image = None
        self._reset_state = None
        self._is_robot = 'robot_name' in hyperparams['env'][1]
        self._save_worker = start_file_worker() if start_saver else None
        self._setup_world(0)

    def _setup_world(self, itr):
        env_type, env_params = self._hyperparams['env']
        self.env = env_type(env_params, self._reset_state)
        self._hyperparams['adim'] = self.adim = self.env.adim
        self._hyperparams['sdim'] = self.sdim = self.env.sdim
        self._hyperparams['ncam'] = self.ncam = self.env.ncam
        self.num_objects = getattr(self.env, 'num_objects', None)

    def sample(self, policy, i_traj):
        """Run one trajectory (with retry-on-failure) and return
        (agent_data, obs_dict, policy_outs)."""
        if not self._is_robot:
            if 'gen_xml' in self._hyperparams:
                if i_traj % self._hyperparams['gen_xml'] == 0 and i_traj > 0:
                    self._setup_world(i_traj)
            elif i_traj > 0:
                self._setup_world(i_traj)

        traj_ok, obs_dict, policy_outs, agent_data = False, None, None, None
        i_trial = 0
        imax = self._hyperparams.get('imax', 100)
        while not traj_ok and i_trial < imax:
            i_trial += 1
            try:
                agent_data, obs_dict, policy_outs = self.rollout(policy, i_trial, i_traj)
                traj_ok = agent_data['traj_ok']
            except (Image_Exception, Environment_Exception):
                traj_ok = False

        if not traj_ok:
            raise Bad_Traj_Exception
        print('needed {} trials'.format(i_trial))
        return agent_data, obs_dict, policy_outs

    def _post_process_obs(self, env_obs, agent_data, initial_obs=False):
        """Accumulate env observations into the fixed (T+1, ...) caches,
        resizing camera frames to (image_height, image_width); return the
        history-so-far view of each key."""
        img_h = self._hyperparams['image_height']
        img_w = self._hyperparams['image_width']

        if initial_obs:
            T = self._hyperparams['T'] + 1
            self._agent_cache = {}
            for k in env_obs:
                if k == 'images':
                    if 'obj_image_locations' in env_obs:
                        self.traj_points = []
                    n_cams = env_obs['images'].shape[0]
                    self._agent_cache['images'] = np.zeros(
                        (T, n_cams, img_h, img_w, 3), dtype=np.uint8)
                elif isinstance(env_obs[k], np.ndarray):
                    self._agent_cache[k] = np.zeros(
                        tuple([T] + list(env_obs[k].shape)), dtype=env_obs[k].dtype)
                else:
                    self._agent_cache[k] = []
            self._cache_cntr = 0

        t = self._cache_cntr
        self._cache_cntr += 1

        point_target_width = float(self._hyperparams.get('point_space_width', img_w))
        obs = {}
        for k in env_obs:
            if k == 'images':
                self.large_images_traj.append(env_obs['images'][0])  # cam0 only, for gifs
                resize_store(t, self._agent_cache['images'], env_obs['images'])
            elif k == 'obj_image_locations':
                self.traj_points.append(copy.deepcopy(env_obs['obj_image_locations'][0]))
                env_obs['obj_image_locations'] = np.round(
                    env_obs['obj_image_locations'] * point_target_width
                    / env_obs['images'].shape[2]).astype(np.int64)
                self._agent_cache['obj_image_locations'][t] = env_obs['obj_image_locations']
            elif isinstance(env_obs[k], np.ndarray):
                self._agent_cache[k][t] = env_obs[k]
            else:
                self._agent_cache[k].append(env_obs[k])
            obs[k] = self._agent_cache[k][:self._cache_cntr]

        if 'obj_image_locations' in env_obs:
            agent_data['desig_pix'] = env_obs['obj_image_locations']
        if self._goal_image is not None:
            agent_data['goal_image'] = self._goal_image
        if self._goal_obj_pose is not None:
            agent_data['goal_pos'] = self._goal_obj_pose
            agent_data['goal_pix'] = self.env.get_goal_pix(point_target_width)
        if self._reset_state is not None:
            agent_data['reset_state'] = self._reset_state
            obs['reset_state'] = self._reset_state

        return obs

    def _required_rollout_metadata(self, agent_data, traj_ok, t, i_traj, i_tr, reset_state):
        """Metadata the downstream pipeline depends on: term_t, goal_reached,
        traj_ok (reference ``general_agent.py:155-172``)."""
        agent_data['term_t'] = t - 1
        if self.env.has_goal():
            agent_data['goal_reached'] = self.env.goal_reached()
        agent_data['traj_ok'] = traj_ok

        if self._hyperparams.get('save_reset_data', False):
            agent_data['reset_state'] = reset_state

        if 'make_final_recording' in self._hyperparams and self._save_worker is not None:
            self._save_worker.put(('path', self.record_path))
            self.env.save_recording(self._save_worker, i_traj)

    def rollout(self, policy, i_trial, i_traj):
        self._init()
        agent_data, policy_outputs = {}, []

        t = 0
        done = self._hyperparams['T'] <= 0
        initial_env_obs, reset_state = self.env.reset()
        obs = self._post_process_obs(initial_env_obs, agent_data, True)
        policy.reset()

        while not done:
            pi_t = policy.act(**get_policy_args(policy, obs, t, i_traj, agent_data))
            policy_outputs.append(pi_t)

            obs = self._post_process_obs(
                self.env.step(copy.deepcopy(pi_t['actions'])), agent_data)

            if 'rejection_sample' in self._hyperparams and \
                    'rejection_end_early' in self._hyperparams:
                if self._hyperparams['rejection_sample'] > i_trial and \
                        not self.env.goal_reached():
                    print('traj rejected!')
                    return {'traj_ok': False}, None, None

            if (self._hyperparams['T'] - 1) == t:
                done = True
            t += 1

        traj_ok = self.env.valid_rollout()
        if 'rejection_sample' in self._hyperparams:
            if self._hyperparams['rejection_sample'] > i_trial:
                assert self.env.has_goal(), 'rejection sampling requires a goal'
                traj_ok = self.env.goal_reached()
            print('goal_reached', self.env.goal_reached())

        self._required_rollout_metadata(agent_data, traj_ok, t, i_traj, i_trial, reset_state)
        return agent_data, obs, policy_outputs

    def _init(self):
        self.large_images_traj, self.traj_points = [], None

    def cleanup(self):
        if self._save_worker is not None:
            print('Cleaning up file saver....')
            self._save_worker.put(None)
            proc = getattr(self._save_worker, '_join_proc', None)
            if proc is not None:
                proc.join(timeout=30)

    @property
    def record_path(self):
        return self._hyperparams['data_save_dir'] + '/record/'
