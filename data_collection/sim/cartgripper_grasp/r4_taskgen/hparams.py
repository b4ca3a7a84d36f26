"""Raw (pkl+png) autograsp collection (3 cubes, benchmark env parameters)
for transport task generation: feeds ``select_benchmark_tasks``
(ag_bench20, displacement-selected) and ``make_transport_tasks``
(ag_bench20_hard, teleported >= 0.25 m goals)."""

import os
import os.path

import numpy as np

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

DATA_DIR = os.environ.get('VMPC_DATA_DIR', '/root/data/collect/ag_r4_raw')
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 3,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 1,
    'finger_sensors': True,
    # must match r4_transport campaign params so the benchmark tasks are
    # on-distribution for the trained predictor
    'object_object_mindist': 0.15,
    'skip_first': 6,
    'autograsp': {'zthresh': -0.06, 'touchthresh': 0.0, 'reopen': True},
}

agent = {
    'type': GeneralAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'data_save_dir': DATA_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 1,
    'save_reset_data': True,
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
    'current_dir': current_dir,
    'save_data': True,
    'skip_bad_trajs': True,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': int(os.environ.get('VMPC_START_INDEX', 0)),
    'end_index': int(os.environ.get('VMPC_END_INDEX', 119)),
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
