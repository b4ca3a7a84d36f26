"""Inverse-model baseline on the vendored grasp-transport set.

Non-CEM baseline (reference
``policy/inverse_models/inverse_model_base_controller.py:30-94``): a
feed-forward inverse model maps (current frame, goal frame, context)
straight to an action window — no video prediction, no sampling.  Same
vendored tasks/env as ``benchmarks/ag_bench20`` so the row slots into the
pixel/classifier/random table.

Train the model on the same mixed transport corpus first::

    python -m visual_foresight_tpu.training.train_inverse \
        --data_dir /root/data/collect/ag_r5f_v1_all --adim 4 \
        --model_dir /root/data/models/ag_r5_inverse

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/ag_bench20_inverse/hparams.py --benchmark
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.inverse_models.inverse_model_base_controller import (
    InvModelBaseController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

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
        + '/ag_bench20',
    # validity failures under a deterministic feed-forward policy repeat
    # identically; 10 attempts (2 scene regens) is enough to tell a
    # transient fault from a task this policy cannot keep valid
    'imax': 10,
    'current_dir': current_dir,
}

policy = {
    'type': InvModelBaseController,
    'T': 30,
    'model_params_path': os.environ.get('VMPC_MODEL_DIR',
                                        '/root/data/models/ag_r5_inverse'),
}

config = {
    # a feed-forward policy can leave a replayed scene in a state the
    # validity check rejects on every retry; skip that task (logged) and
    # score the rest instead of aborting the row (sim/benchmarks.py)
    'skip_bad_trajs': True,
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
