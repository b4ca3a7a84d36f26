"""Two-camera registration-cost benchmark: designated pixels are re-localized
every replan by warping the current frame onto start/goal frames with the GDN
(capability of reference ``experiments/sawyer/registration_experiments/hparams.py``)."""

import os

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
    RegisterGtruthController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'video_save_dir': '',
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 50,
    'image_height': 96,
    'image_width': 128,
    'point_space_width': 64,
    'current_dir': current_dir,
    'register_gtruth': ['start', 'goal'],
}

policy = {
    'type': RegisterGtruthController,
    'verbose': True,
    'initial_std': 0.035,
    'initial_std_lift': 0.08,
    'replan_interval': 3,
    'num_samples': 400,
    'selection_frac': 0.05,
    'register_region': True,
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
    'gdn_path': os.environ.get('VMPC_GDN_DIR', BASE_DIR + '/gdn_model'),
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 30000,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
    'nshuffle': 200,
}
