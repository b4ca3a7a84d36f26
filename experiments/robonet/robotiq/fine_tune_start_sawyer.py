"""RoboNet Robotiq benchmark: fine-tune from the Sawyer model
(capability of reference ``experiments/robonet/robotiq/fine_tune_start_sawyer.py``)."""

import os

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
    PixelCostController)
from visual_foresight_tpu.policy.cem_controllers.samplers.correlated_noise import (
    CorrelatedNoiseSampler)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'robotiq',
    'camera_topics': [IMTopic('/front/image_raw', flip=True)],
    'gripper_attached': 'none',
    'cleanup_rate': -1,
    'save_video': True,
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 14,
    'image_height': 48,
    'image_width': 64,
    'make_final_recording': '',

}

policy = {
    'type': PixelCostController,
    'verbose_every_iter': True,
    'zeros_for_start_frames': False,
    'replan_interval': 10,
    'start_planning': 5,
    'iterations': 5,
    'selection_frac': 1. / 10,
    'nactions': 10,
    'num_samples': 600,
    'sampler': CorrelatedNoiseSampler,
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
}

config = {
    'experiment_name': 'robotiq_fine_tune_start_sawyer',
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
