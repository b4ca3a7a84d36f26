"""Raw (pkl+png, BOTH cameras) xz-grasp collection for two-camera benchmark
task selection — feeds ``sim/util/select_benchmark_tasks`` to build the
vendored ``xz2c_bench20`` set the registration campaign replays.
``save_reset_data`` records the scene reset state the BenchmarkAgent needs
to reconstruct each task's world exactly."""

import os
import os.path

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

DATA_DIR = os.environ.get('VMPC_DATA_DIR', '/root/data/collect/xz2c_r5_raw')
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 2,
}

agent = {
    'type': GeneralAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': DATA_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 1,
    'rejection_sample': 5,
    'save_reset_data': True,
}

policy = {
    'type': GaussianPolicy,
    'nactions': 10,
    'action_order': ['x', 'z', 'grasp'],
    'initial_std_lift': 0.1,
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': int(os.environ.get('VMPC_START_INDEX', 0)),
    'end_index': int(os.environ.get('VMPC_END_INDEX', 59)),
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
