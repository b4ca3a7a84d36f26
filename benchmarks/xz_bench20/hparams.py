"""Reproducible 20-task lifting benchmark: pixel-cost MPC, flagship predictor.

The task set is VENDORED in-repo (``benchmarks/tasks/xz_lifting_bench20``,
displacement-selected from a 120-trajectory raw xz-grasp collection —
regenerate with ``sim/util/select_benchmark_tasks``), so the campaign row is
reproducible from a clone plus a trained flagship checkpoint
(``make bench_model`` or ``training/train_predictor`` on the r4_flagship
collection; see ``benchmarks/README.md``).

Operating point matches the reference's experiments (800 samples,
reference ``experiments/sim/cartgripper_2d_grasping/pixel_cost/hparams.py:37``)
and rounds 2-3 of EVAL.md.

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/xz_bench20/hparams.py --benchmark
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers import PixelCostController

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
    'type': PixelCostController,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.5,
    'rejection_sampling': False,
    'replan_interval': 10,
    # 768 = lane-aligned TPU operating point: the round-5 controlled A/B
    # on the vendored lifting set measured 768 quality >= 800 (+0.182 vs
    # +0.158 mean improvement, same checkpoint/tasks) at 17% less
    # wall-clock (800 pads to 896 lanes; docs/PERFORMANCE.md sample sweep)
    'num_samples': int(os.environ.get('VMPC_NUM_SAMPLES', 768)),
    'nactions': 15,
    # repeat=3 and iterations=3 are the defaults (overriding with the
    # default raises by design)
    'T': 45,
    'model_path': os.environ.get('VMPC_MODEL_DIR',
                                 '/root/data/models/xz_flagship'),
}

# device microbatch over the sample axis (planners/cem.py sample_chunk);
# only set when non-zero — 0 is the controller default and identical
# overrides are rejected by design
_chunk = int(os.environ.get('VMPC_SAMPLE_CHUNK', 0))
if _chunk:
    policy['sample_chunk'] = _chunk

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
