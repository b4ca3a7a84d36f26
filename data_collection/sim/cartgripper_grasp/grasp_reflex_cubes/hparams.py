"""Large-scale autograsp collection, 12 cubes, rejection-sampled grasps
(capability of reference ``data_collection/sim/cartgripper_grasp/grasp_reflex_cubes/hparams.py``)."""

import os.path

import numpy as np

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 12,
    'object_mass': 0.5,
    'friction': 1.0,
    'finger_sensors': True,
    'minlen': 0.03,
    'maxlen': 0.06,
    'object_object_mindist': 0.15,
    'cube_objects': True,
    'autograsp': {'zthresh': -0.06, 'touchthresh': 0.0, 'reopen': True},
}

agent = {
    'type': GeneralAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 400,      # fresh scene XML every nth trajectory
    'rejection_sample': 5,
}

policy = {
    'type': GaussianPolicy,
    'nactions': 10,
    'initial_std': 0.04,
    'initial_std_lift': 0.6,
    'initial_std_rot': np.pi / 32,
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'seperate_good': True,
    'save_raw_images': False,
    'start_index': 30000,
    'end_index': 60000,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
