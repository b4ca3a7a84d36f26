"""Inverse-model baseline on the vendored 20-task lifting set.

Non-CEM baseline (reference
``policy/inverse_models/inverse_model_base_controller.py:30-94`` +
``experiments/robonet/inverse_model/*.py``): a feed-forward inverse model
maps (current frame, goal frame, context) straight to an action plan — no
video prediction, no sampling.  Same vendored tasks, env, and horizon as
``benchmarks/xz_bench20`` so the row is directly comparable to the
pixel/classifier/NCE/random rows.

Train the model first::

    python -m visual_foresight_tpu.training.train_inverse \
        --data_dir /root/data/collect/xz_r4/records --adim 3 \
        --model_dir /root/data/models/xz_inverse

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/xz_bench20_inverse/hparams.py --benchmark
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.inverse_models.inverse_model_base_controller import (
    InvModelBaseController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

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
    'type': InvModelBaseController,
    'T': 45,
    'model_params_path': os.environ.get('VMPC_MODEL_DIR',
                                        '/root/data/models/xz_inverse'),
    'context_action_weight': [1, 1, 1],
    'initial_action_low': [-0.025, -0.025, 0.],
    'initial_action_high': [0.025, 0.025, 0.],
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
