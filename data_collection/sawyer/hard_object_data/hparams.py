"""Sawyer autograsp collection over rigid objects, widened x workspace
(capability of reference ``data_collection/sawyer/hard_object_data/hparams.py``)."""

import os

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

if 'VMPC_DATA_DIR' in os.environ:
    BASE_DIR = os.path.join(os.environ['VMPC_DATA_DIR'], 'towel_pick/')
else:
    BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'upper_bound_delta': [0.07, 0., 0., 0., 0.],
}

agent = {
    'type': GeneralAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 240,
    'image_width': 320,
    'record': BASE_DIR + '/record/',
}

policy = {
    'type': GaussianPolicy,
    'nactions': 10,
    'initial_std': 0.035,
    'initial_std_lift': 0.08,
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 120000,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
