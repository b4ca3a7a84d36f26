"""Two-camera registration-cost MPC on the vendored 20-task 2-cam set.

Capability of reference
``policy/cem_controllers/register_gtruth_controller.py:54-173``: each
replan warps the current frame of BOTH cameras onto the start and goal
images with the GDN flow net; warp errors become per-(camera, registration)
confidence tradeoffs weighting the pixel-distance cost, so designated
pixels track the object without hand annotation.

Rebuild chain (``scripts/chain_r5d.sh``): 2-cam collection
(``data_collection/sim/cartgripper_xz_grasp/r5_twocam``) -> per-view
predictor training -> GDN training -> task selection
(``sim/util/select_benchmark_tasks`` over the ``r5_twocam_tasks`` raw run).

Run::

    python -m visual_foresight_tpu.sim.run benchmarks/xz2c_bench20_registration/hparams.py --benchmark
"""

import os.path

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
    RegisterGtruthController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
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
    'data_save_dir': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/results',
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'record': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/record/',
    'start_goal_confs': os.environ.get(
        'VMPC_TASK_DIR', os.path.join(REPO_ROOT, 'benchmarks/tasks'))
        + '/xz2c_bench20',
    'current_dir': current_dir,
}

policy = {
    'type': RegisterGtruthController,
    'action_order': ['x', 'z', 'grasp'],
    'gdn_path': os.environ.get('VMPC_GDN_DIR', '/root/data/models/xz2c_gdn'),
    'rejection_sampling': False,
    'replan_interval': 10,
    # 768 = lane-aligned TPU operating point: the round-5 controlled A/B
    # on the vendored lifting set measured 768 quality >= 800 (+0.182 vs
    # +0.158 mean improvement, same checkpoint/tasks) at 17% less
    # wall-clock (800 pads to 896 lanes; docs/PERFORMANCE.md sample sweep)
    'num_samples': 768,
    'nactions': 10,
    'T': 30,
    'predictor_hparams': {
        'ncam': 2,
    },
    'model_path': os.environ.get('VMPC_MODEL_DIR',
                                 '/root/data/models/xz2c_reg'),
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
