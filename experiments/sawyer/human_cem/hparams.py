"""Human-in-the-loop CEM: a person scores candidate plans each iteration
(capability of reference ``experiments/sawyer/human_cem/hparams.py``)."""

import os

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.cem_controllers.human_cem_controller import (
    HumanCEMController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'lower_bound_delta': [0, 0., -0.01, 265 * np.pi / 180 - np.pi / 2, 0],
    'upper_bound_delta': [0, -0.15, -0.01, 0., 0],
    'start_box': [1, 1, 0.7],
    'normalize_actions': True,
    'gripper_joint_thresh': 0.999856,
    'reset_before_eval': False,
    'rand_drop_reset': False,
    'save_video': True,
    'camera_topics': [IMTopic('/front/image_raw', flip=True),
                      IMTopic('/left/image_raw')],
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'current_dir': current_dir,
    'make_final_recording': '',
    'no_goal_def': '',
}

policy = {
    'type': HumanCEMController,
    'replan_interval': 10,
    'num_samples': 50,
    'selection_frac': 0.1,
    'initial_std_lift': 0.2,
    'initial_std_rot': np.pi / 10,
    'rejection_sampling': False,
    'state_append': [0.41, 0.25, 0.166],
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
