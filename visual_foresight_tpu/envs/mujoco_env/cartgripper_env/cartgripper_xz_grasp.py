"""2-D (x, z) + binary-grasp lifting env, the smallest cartgripper variant
(reference ``visual_mpc/envs/mujoco_env/cartgripper_env/cartgripper_xz_grasp.py``).

Agent space: adim=3 (dx, dz, grasp), sdim=3 ([x, z, gripper-openness]); 1 cam.
"""

import numpy as np

from .base_cartgripper import BaseCartgripperEnv, zangle_to_quat


class CartgripperXZGrasp(BaseCartgripperEnv):
    def __init__(self, env_params, reset_state=None):
        super().__init__(env_params, reset_state)
        # bounds on the ctrl targets [x, z, finger]; finger 0 = open, 0.1 = close
        self.low_bound = np.array([-0.4, -0.075, 0])
        self.high_bound = np.array([0.4, 0.15, 0.1])
        self._base_adim, self._base_sdim = 3, 6
        self._adim, self._sdim = 3, 3
        self._gripper_dim = 2
        self._n_joints = 6

    def _default_hparams(self):
        default_dict = {
            'x_range': 0.3,
            'default_y': 0.,
            'default_theta': 0.,
            'gripper_open': 0.06438482934440347,
            'gripper_close': 0,
            'gripper_thresh': 0.,
        }
        parent_params = super()._default_hparams()
        parent_params.set_hparam('filename', 'cartgripper_xz_grasp.xml')
        parent_params.set_hparam('mode_rel', [True, True, False])
        parent_params.set_hparam('finger_sensors', False)
        parent_params.set_hparam('minlen', 0.03)
        parent_params.set_hparam('maxlen', 0.05)
        parent_params.set_hparam('valid_rollout_floor', -2e-1)
        parent_params.set_hparam('ncam', 1)
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def _get_state(self):
        """[arm x, arm z, gripper openness] where 1 = fully open."""
        grip_frac = (self._data.qpos[4] - self._hp.gripper_close) / \
            (self._hp.gripper_open - self._hp.gripper_close)
        return np.array([self._data.qpos[0], self._data.qpos[2], 1 - grip_frac])

    def _snap_ctrl_to_qpos(self, qpos):
        return np.array([qpos[0], qpos[2], 0.0])

    def _init_dynamics(self):
        # ctrl-space previous target: [x, z, finger target (0=open)]
        self._previous_target_qpos = np.array([self._data.qpos[0],
                                               self._data.qpos[2], 0.0])
        self._goal_reached = False
        self._object_floors = self._last_obs['object_poses_full'].copy()

    def _next_qpos(self, action):
        assert action.shape[0] == self._adim
        grip_ctrl = self.high_bound[-1] if action[-1] > self._hp.gripper_thresh \
            else self.low_bound[-1]
        action = np.concatenate([action[:2], [grip_ctrl]])
        return self._previous_target_qpos * self.mode_rel + action

    def _get_obs(self, finger_sensors):
        base_obs = super()._get_obs(finger_sensors)
        base_obs['state'] = self._get_state()
        self._last_obs['state'] = self._get_state()
        return base_obs

    def _create_pos(self):
        object_poses = super()._create_pos()
        for i in range(self.num_objects):
            object_poses[i][0] = np.random.uniform(-self._hp.x_range, self._hp.x_range)
            object_poses[i][1] = self._hp.default_y
            object_poses[i][3:] = zangle_to_quat(self._hp.default_theta)
        return object_poses

    def get_armpos(self, object_pos):
        xpos0 = np.zeros(self._base_sdim)
        if self.randomize_initial_pos:
            assert not self.arm_obj_initdist
            xpos0[0] = np.random.uniform(-.4, .4)
            xpos0[1] = self._hp.default_y
            xpos0[2] = np.random.uniform(-0.08, .14)
            xpos0[3] = self._hp.default_theta
            xpos0[4:6] = [0.0, 0.0]
        else:
            raise NotImplementedError
        return xpos0

    def _post_step(self):
        if self._hp.finger_sensors:
            grasp_thresh = np.amax(self._last_obs['finger_sensors']) > 0
        else:
            grasp_thresh = self._last_obs['state'][2] <= 0.9  # gripper (partly) closed
        object_deltas = self._last_obs['object_poses_full'][:, 2] - \
            self._object_floors[:, 2]
        lifted = np.amax(object_deltas) >= 0.05 and self._last_obs['state'][1] >= 0.02
        if lifted and grasp_thresh:
            self._goal_reached = True

    def has_goal(self):
        return True

    def goal_reached(self):
        return self._goal_reached

    # -- benchmark task generation ------------------------------------------------
    def _move_arm(self):
        target_dx = np.random.uniform(-self._hp.x_range, self._hp.x_range) - \
            self._previous_target_qpos[0]
        target_dz = np.random.uniform(0.12, self.high_bound[1]) - \
            self._previous_target_qpos[1]
        self.step(np.array([target_dx, target_dz, -1]))

    def _move_objects(self):
        """Create a lifting task by randomly re-placing the block inside the
        gripper until a grasp sticks (no expert available)."""
        i = np.random.choice(self.num_objects)
        wiggle = self._hp.maxlen
        done = False
        while not done:
            base = self._n_joints + i * 7
            target_z = self._previous_target_qpos[1] + 0.015 + \
                np.random.uniform(-wiggle, wiggle)
            self._data.qpos[base] = self._previous_target_qpos[0] + \
                np.random.uniform(-wiggle, wiggle)
            self._data.qpos[base + 2] = target_z
            self._sim_step()

            target_cmd = np.array([self._previous_target_qpos[0],
                                   self._previous_target_qpos[1],
                                   self.high_bound[-1]])
            for _ in range(self.substeps):
                self._data.qpos[base + 2] = target_z
                self._data.ctrl[:] = target_cmd
                self._sim_step()
            for _ in range(self.substeps * 5):
                self._sim_step()

            if self._data.qpos[base + 2] > 0.05:
                done = True
            else:
                target_cmd = np.array([self._previous_target_qpos[0],
                                       self._previous_target_qpos[1],
                                       self.low_bound[-1]])
                for _ in range(self.substeps):
                    self._data.ctrl[:] = target_cmd
                    self._sim_step()

    def generate_task(self):
        self._move_arm()
        self._move_objects()

    @staticmethod
    def default_ncam():
        return 1
