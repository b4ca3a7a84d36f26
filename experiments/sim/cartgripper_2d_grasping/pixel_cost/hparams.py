"""Pixel-cost visual-MPC benchmark on 2D grasping
(capability of reference ``experiments/sim/cartgripper_2d_grasping/pixel_cost/hparams.py``)."""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers import PixelCostController

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
}

agent = {
    'type': BenchmarkAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': BASE_DIR,
    'T': 45,
    'image_height': 48,
    'image_width': 64,
    'make_final_gif_pointoverlay': True,
    'record': BASE_DIR + '/record/',
    'start_goal_confs': os.environ.get('VMPC_DATA_DIR', BASE_DIR) +
        '/cartgripper_xz_grasp/lifting_tasks/raw',
    'current_dir': current_dir,
}

policy = {
    'type': PixelCostController,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.5,
    'rejection_sampling': False,
    'replan_interval': 10,
    'num_samples': 800,
    'nactions': 15,
    'repeat': 3,
    'T': 45,
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': False,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 5,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
