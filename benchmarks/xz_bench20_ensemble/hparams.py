"""Ensemble-disagreement MPC on the vendored 20-task lifting set.

Three independently seeded flagship predictors (same data, seeds 1-3; see
docs/EVAL.md round 4 for the training recipe); cost = mean pixel cost +
lambda * ensemble variance, vmapped over the stacked parameter pytrees in
one device program (capability of reference
``policy/cem_controllers/variants/ensemble_vidpred.py:18-62``).

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/xz_bench20_ensemble/hparams.py --benchmark
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers.variants.ensemble_vidpred import (
    CEMControllerEnsembleVidPred)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

MODEL_ROOT = os.environ.get('VMPC_MODEL_ROOT', '/root/data/models')

env_params = {
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
}

agent = {
    'type': BenchmarkAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/results',
    'T': 45,
    'image_height': 48,
    'image_width': 64,
    'record': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/record/',
    'start_goal_confs': os.environ.get(
        'VMPC_TASK_DIR', os.path.join(REPO_ROOT, 'benchmarks/tasks'))
        + '/xz_lifting_bench20',
    'current_dir': current_dir,
}

policy = {
    'type': CEMControllerEnsembleVidPred,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.5,
    'rejection_sampling': False,
    'replan_interval': 10,
    # 768 = lane-aligned TPU operating point: the round-5 controlled A/B
    # on the vendored lifting set measured 768 quality >= 800 (+0.182 vs
    # +0.158 mean improvement, same checkpoint/tasks) at 17% less
    # wall-clock (800 pads to 896 lanes; docs/PERFORMANCE.md sample sweep)
    'num_samples': 768,
    'nactions': 15,
    'T': 45,
    # num_ensembles=3 and ensemble_var_lambda=1.0 are the defaults
    'model_path': [MODEL_ROOT + '/xz_ens1',
                   MODEL_ROOT + '/xz_ens2',
                   MODEL_ROOT + '/xz_ens3'],
}

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
