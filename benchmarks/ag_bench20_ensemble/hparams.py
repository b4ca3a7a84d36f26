"""Ensemble-disagreement MPC on the vendored grasp-transport HARD set.

The fifth hard-set axis (docs/EVAL.md round-5 conclusion): cost = mean
pixel cost + lambda x across-member variance, with the v1 (8k-step) and
v2 (15k-step) mixed-corpus predictors as the ensemble — cross-member
disagreement penalizes exactly the states where v2's transport optimism
diverges from the more conservative v1 (reference capability:
``variants/ensemble_vidpred.py:18-62``).

Run::

    VMPC_TASK_SET=ag_bench20_hard python -m visual_foresight_tpu.sim.run \
        benchmarks/ag_bench20_ensemble/hparams.py --benchmark
"""

import os.path

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.cem_controllers.samplers.gaussian_sampler import (
    GaussianCEMSampler)
from visual_foresight_tpu.policy.cem_controllers.variants.ensemble_vidpred import (
    CEMControllerEnsembleVidPred)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

MODEL_ROOT = os.environ.get('VMPC_MODEL_ROOT', '/root/data/models')

env_params = {
    'num_objects': 3,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 1,
    'finger_sensors': True,
    'object_object_mindist': 0.15,
    'skip_first': 6,
    'autograsp': {'zthresh': -0.06, 'touchthresh': 0.0, 'reopen': True},
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'data_save_dir': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/results',
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'record': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/record/',
    'start_goal_confs': os.environ.get(
        'VMPC_TASK_DIR', os.path.join(REPO_ROOT, 'benchmarks/tasks'))
        + '/' + os.environ.get('VMPC_TASK_SET', 'ag_bench20_hard'),
    'current_dir': current_dir,
}

policy = {
    'type': CEMControllerEnsembleVidPred,
    'initial_std': 0.04,
    'initial_std_rot': np.pi / 32,
    'rejection_sampling': False,
    'replan_interval': 10,
    'predictor_propagation': True,
    'num_samples': 768,
    'nactions': 10,
    'T': 30,
    'num_ensembles': 2,
    'model_path': [MODEL_ROOT + '/ag_r5f_v1',
                   MODEL_ROOT + '/ag_r5f_v2'],
}

_std_lift = float(os.environ.get('VMPC_STD_LIFT', 0.15))
if _std_lift != GaussianCEMSampler.get_default_hparams()['initial_std_lift']:
    policy['initial_std_lift'] = _std_lift

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': False,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 19,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
