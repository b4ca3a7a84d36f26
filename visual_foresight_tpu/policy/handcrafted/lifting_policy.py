"""Scripted xz-grasp lifting demonstrator
(reference ``policy/handcrafted/lifting_policy.py``).

Plan phases: move above the object, descend, close gripper, carry to a random
target; Gaussian noise on every action for diversity.
"""

import numpy as np

from visual_foresight_tpu.policy.policy import Policy


class LiftingPolicy(Policy):
    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        self._hp = self._default_hparams()
        self._override_defaults(policyparams)

        if self._hp.action_space == 'xzgrasp':
            assert self._hp.nactions >= 5, 'need at least 5 actions'
            assert all(x > 0 for x in self._hp.frac_act) and \
                sum(self._hp.frac_act) <= 1.
            assert ag_params['adim'] == 3, 'xzgrasp requires adim=3'
        else:
            raise NotImplementedError
        self._actions = None

    def _default_hparams(self):
        default_dict = {
            'nactions': 15,
            'repeat': 1,
            'action_space': 'xzgrasp',
            'frac_act': [0.4, 0.1],
            'sigma': [0.05, 0.1, 0],
            'bounds': [[-0.4, 0.05], [0.4, 0.15]],
            'up_z': 0.15,
            'floor_z': -0.075,
        }
        parent_params = super()._default_hparams()
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def reset(self):
        self._actions = None

    def act(self, t, state, object_poses):
        if self._hp.action_space == 'xzgrasp':
            return self._act_xzgrasp(t, state, object_poses)
        raise NotImplementedError

    def _act_xzgrasp(self, t, state, object_poses):
        if t == 0:
            target_pos = np.random.uniform(low=self._hp.bounds[0],
                                           high=self._hp.bounds[1])
            n_move = self._hp.nactions - 1
            actions = np.zeros((self._hp.nactions, 3))
            chosen = np.random.choice(object_poses.shape[1])
            t_move_1, t_down = [int(max(np.round(n_move * x), 1))
                                for x in self._hp.frac_act]
            t_move_2 = n_move - t_move_1 - t_down
            assert t_move_2 > 0, 'not enough time to move object'

            dx1 = object_poses[0, chosen, 0] - state[0, 0]
            actions[:t_move_1] = [dx1 / t_move_1,
                                  (self._hp.up_z - state[0, 1]) / t_move_1, -1]
            actions[t_move_1:t_down + t_move_1] = \
                [0, (self._hp.floor_z - self._hp.up_z) / t_down, -1]
            actions[t_down + t_move_1] = [0, 0, 1]

            dx2 = target_pos[0] - object_poses[0, chosen, 0]
            actions[t_down + t_move_1 + 1:] = \
                [dx2 / t_move_2, (target_pos[1] - self._hp.floor_z) / t_move_2, 1]

            actions += np.random.normal(size=(self._hp.nactions, 3)) * \
                np.asarray(self._hp.sigma)
            actions = np.repeat(actions, self._hp.repeat, axis=0)
            actions[:, :2] /= self._hp.repeat
            self._actions = actions

        return {'actions': self._actions[t].copy()}
