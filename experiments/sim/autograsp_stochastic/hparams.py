"""Benchmark config #3: stochastic (latent) predictor + autograsp action
space (capability of the reference's autograsp benchmark family —
``envs/mujoco_env/cartgripper_env/autograsp_env.py``; the reference pairs
this env with a plain 4-dim sampler, e.g.
``experiments/robonet/baxter_fine_tune/sawyer_baxter_fine_tune.py:46``).

The policy samples xyz/theta deltas; the GRIPPER IS LATCHED BY THE ENV
(autograsp dynamics close below zthresh, reopen unless holding), so the
sampler is the default Gaussian over the 4 commanded dims and the replan
runs in the fused single-dispatch planner.  AutograspSampler is for
explicit-gripper (5-dim vanilla) action spaces, where its derived
cumulative-z gripper command is the env's trailing action dim — pairing it
with an auto-latching 4-dim env would feed the +/-1 grip command into the
theta dim.  The predictor is the SAVP-style stochastic variant
(``latent_dim > 0``): the planner draws one latent per CEM sample,
marginalizing motion stochasticity during scoring.
"""

import os.path

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.cem_controllers import PixelCostController

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 3,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 1,
    'autograsp': {'zthresh': -0.06, 'touchthresh': 0.0, 'reopen': True},
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'make_final_gif_pointoverlay': True,
    'record': BASE_DIR + '/record/',
    'start_goal_confs': os.environ.get('VMPC_TASK_DIR', BASE_DIR)
        + '/ag_tasks/raw',
    'current_dir': current_dir,
}

policy = {
    'type': PixelCostController,
    'initial_std': 0.04,
    'initial_std_lift': 0.6,
    'initial_std_rot': np.pi / 32,
    'rejection_sampling': False,
    'replan_interval': 10,
    'num_samples': 600,
    'nactions': 10,
    'repeat': 3,
    'T': 30,
    'iterations': 3,
    'predictor_hparams': {
        # stochastic SAVP-style variant: per-sample latents during planning
        'latent_dim': 8,
        'adim': 4,
        'sdim': 5,
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
