"""Ensemble-disagreement MPC benchmark: lift a single cube with an
uncertainty-penalized pixel cost over a predictor ensemble
(capability of reference ``experiments/sim/ensemble_grasping/hparams.py``)."""

import os

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.cem_controllers.variants.ensemble_vidpred import (
    CEMControllerEnsembleVidPred)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 1,
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
    'type': BenchmarkAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'data_save_dir': BASE_DIR,
    'make_final_gif_pointoverlay': True,
    'record': BASE_DIR + '/record/',
    'num_load_steps': 16,
    'start_goal_confs': os.environ.get('VMPC_DATA_DIR', BASE_DIR) +
        '/ensemble_lifting_tasks',
    'current_dir': current_dir,
}

policy = {
    'type': CEMControllerEnsembleVidPred,
    'verbose': True,
    'initial_std': 0.04,
    'initial_std_lift': 0.6,
    'initial_std_rot': np.pi / 32,
    'rejection_sampling': False,
    'replan_interval': 10,
    'num_samples': 800,
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
}

config = {
    'current_dir': current_dir,
    'save_data': True,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 88,
    'agent': agent,
    'policy': policy,
}
