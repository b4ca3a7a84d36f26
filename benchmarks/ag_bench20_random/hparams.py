"""Random-policy baseline on the vendored autograsp task sets.

Same BenchmarkAgent + env as ``benchmarks/ag_bench20`` with the campaign's
Gaussian policy; the improvement floor for the grasp-transport MPC rows.
Point at the hard set with ``VMPC_TASK_SET=ag_bench20_hard``.

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/ag_bench20_random/hparams.py --benchmark
"""

import os.path

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

TASK_SET = os.environ.get('VMPC_TASK_SET', 'ag_bench20')

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
    'data_save_dir': os.environ.get('VMPC_RESULT_DIR', BASE_DIR)
        + '/results_' + TASK_SET,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'record': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/record/',
    'start_goal_confs': os.environ.get(
        'VMPC_TASK_DIR', os.path.join(REPO_ROOT, 'benchmarks/tasks'))
        + '/' + TASK_SET,
    'current_dir': current_dir,
}

policy = {
    'type': GaussianPolicy,
    'nactions': 10,
    'initial_std': 0.04,
    'initial_std_lift': 0.6,
    'initial_std_rot': np.pi / 32,
}

config = {
    'traj_per_file': 128,
    # reports land in <current_dir>/verbose; keep them per task set so an
    # ag_bench20_hard run cannot overwrite the ag_bench20 aggregates
    'current_dir': os.path.join(current_dir, 'results_' + TASK_SET),
    'save_data': False,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 19,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
