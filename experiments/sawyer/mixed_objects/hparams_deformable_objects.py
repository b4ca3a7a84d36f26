"""Two-task deformable-object MPC with the folding sampler
(capability of reference ``experiments/sawyer/mixed_objects/hparams_deformable_objects.py``;
the reference file has a syntax error — missing comma after ``zthresh`` —
fixed here)."""

import os

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
    PixelCostController)
from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
    FoldingCEMSampler)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'lower_bound_delta': [0, 0., -0.01, 265 * np.pi / 180 - np.pi / 2, 0],
    'upper_bound_delta': [0, -0.15, -0.01, 0., 0],
    'normalize_actions': True,
    'gripper_joint_thresh': 0.999856,
    'rand_drop_reset': False,
    'start_box': [1, 1, 0.7],
    'reset_before_eval': True,
    'zthresh': 0.05,
    'camera_topics': [IMTopic('/front/image_raw', flip=True),
                      IMTopic('/left/image_raw')],
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 15,
    'image_height': 48,
    'image_width': 64,
    'current_dir': current_dir,
    'ntask': 2,
}

policy = {
    'type': PixelCostController,
    'replan_interval': 15,
    'num_samples': 600,
    'sampler': FoldingCEMSampler,
    'selection_frac': 0.05,
    'initial_std': 0.005,
    'initial_std_lift': 0.05,
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
