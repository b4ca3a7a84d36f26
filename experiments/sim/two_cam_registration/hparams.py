"""Benchmark config #4: two-camera registration-cost MPC (capability of
reference ``policy/cem_controllers/register_gtruth_controller.py:54-173``).

Each replan warps the current frame of BOTH cameras onto the start and goal
images with the GDN flow net; warp errors become per-(camera, registration)
confidence tradeoffs weighting the pixel-distance cost, and the designated
pixels track the object without hand annotation.
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
    RegisterGtruthController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 2,
}

agent = {
    'type': BenchmarkAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'ntask': 1,
    'make_final_gif_pointoverlay': True,
    'record': BASE_DIR + '/record/',
    'start_goal_confs': os.environ.get('VMPC_TASK_DIR', BASE_DIR)
        + '/reg_tasks/raw',
    'current_dir': current_dir,
}

policy = {
    'type': RegisterGtruthController,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.15,
    'register_gtruth': ['start', 'goal'],
    'gdn_path': os.environ.get('VMPC_GDN_DIR', BASE_DIR + '/gdn_model'),
    'rejection_sampling': False,
    'replan_interval': 10,
    'num_samples': 200,
    'nactions': 10,
    'repeat': 3,
    'T': 30,
    'iterations': 3,
    'predictor_hparams': {
        'ncam': 2,
    },
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': False,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 9,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
