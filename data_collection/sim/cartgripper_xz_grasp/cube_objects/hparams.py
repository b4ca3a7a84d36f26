"""Random-policy data collection on the x-z grasping cartgripper
(capability of reference ``data_collection/sim/cartgripper_xz_grasp/cube_objects/hparams.py``)."""

import os.path

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    # resolution sufficient for 16x anti-aliasing
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
}

agent = {
    'type': GeneralAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': BASE_DIR,
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 1,            # re-generate scene xml every nth trajectory
    'rejection_sample': 5,   # retry unsuccessful trajs up to 5 attempts
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
    'seperate_good': True,
    'save_raw_images': False,
    'start_index': 0,
    'end_index': 100000,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
