"""Generate start/goal benchmark configurations for the 2D grasping task
(capability of reference ``sim/util/config_agent.py`` usage)."""

import os.path

from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.policy import NullPolicy
from visual_foresight_tpu.sim.util.config_agent import CreateConfigAgent

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
}

agent = {
    'type': CreateConfigAgent,
    'env': (CartgripperXZGrasp, env_params),
    'data_save_dir': BASE_DIR + '/lifting_tasks',
    'T': 1,
    'image_height': 48,
    'image_width': 64,
    'gen_xml': 1,
    'save_reset_data': True,
}

policy = {
    'type': NullPolicy,
}

config = {
    'current_dir': current_dir,
    'save_data': True,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 19,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
