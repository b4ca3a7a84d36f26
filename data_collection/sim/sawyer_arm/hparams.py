"""Visible-arm Sawyer data collection: random EE-delta exploration in the
bin arena with the rendered 7-DoF arm (reference capability:
robosuite-based Sawyer collection,
``visual_mpc/envs/mujoco_env/sawyer_env/base_sawyer_env.py``)."""

import numpy as np

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.sawyer_env.sawyer_arm_env import (
    SawyerArmEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

env_params = {
    'num_objects': 2,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
}

agent = {
    'type': GeneralAgent,
    'env': (SawyerArmEnv, env_params),
    'data_save_dir': 'TO_BE_OVERRIDDEN/sawyer_arm',
    'T': 15,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 200,
}

policy = {
    'type': GaussianPolicy,
    'nactions': 5,
    # (dx, dy, dz, dyaw, grip)
    'initial_std': 0.04,
    'initial_std_lift': 0.08,
    'initial_std_rot': np.pi / 16,
}

config = {
    'traj_per_file': 16,
    'current_dir': 'TO_BE_OVERRIDDEN',
    'save_data': True,
    'start_index': 0,
    'end_index': 1000,
    'agent': agent,
    'policy': policy,
}
