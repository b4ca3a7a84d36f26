"""RoboNet pixel-cost benchmark on the Sawyer
(capability of reference ``experiments/robonet/pixel_cost/hparams.py``)."""

import os

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
    PixelCostController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'start_box': [1, 1, 0.7],
    'reset_before_eval': False,
    'rand_drop_reset': False,
    'save_video': True,
    'camera_topics': [IMTopic('/test/image_raw')],
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 13,
    'image_height': 48,
    'image_width': 64,
    'current_dir': current_dir,
    'make_final_recording': '',
}

policy = {
    'type': PixelCostController,
    'replan_interval': 13,
    'num_samples': 600,
    'selection_frac': 0.05,
    'predictor_propagation': True,
    'initial_std_lift': 0.2,
    'initial_std_rot': np.pi / 10,
    'rejection_sampling': False,
    'nactions': 13,
    'repeat': 1,
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
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
