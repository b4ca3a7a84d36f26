"""NCE-embedding-cost MPC benchmark on expert lifting tasks
(capability of reference ``experiments/sim/cartgripper_2d_grasping/nce_experiments/hparams.py``)."""

import os

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers.variants.nce_cost_controller import (
    NCECostController)

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
    'num_load_steps': 16,
    'make_final_recording': '',
    'start_goal_confs': os.environ.get('VMPC_DATA_DIR', BASE_DIR) +
        '/cartgripper_xz_grasp/expert_lifting_tasks',
    'current_dir': current_dir,
}

policy = {
    'type': NCECostController,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.5,
    'rejection_sampling': False,
    'selection_frac': 0.05,
    'replan_interval': 5,
    'num_samples': 800,
    # native NCE embedding checkpoint (replaces the reference's external
    # control_embedding package nce_conf_path/nce_restore_path)
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
    'embedding_path': os.environ.get('VMPC_NCE_DIR', BASE_DIR + '/nce_model'),
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 20,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
