"""Two-step-replan inverse-model control on the Sawyer
(capability of reference ``experiments/robonet/inverse_model/sawyer_two_step.py``)."""

import os

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.inverse_models.inverse_model_base_controller import (
    InvModelBaseController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'camera_topics': [IMTopic('/front/image_raw', flip=True)],
    'cleanup_rate': -1,
    'save_video': True,
    'gripper_attached': 'none',
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'T': 10,
    'image_height': 192,
    'image_width': 256,
    'make_final_recording': '',
    'goal_image_only': '',
    'no_goal_def': '',
    'data_save_dir': BASE_DIR + '/outputs',
}

policy = {
    'type': InvModelBaseController,
    'model_params_path': os.environ.get('VMPC_INVMODEL_DIR',
                                        BASE_DIR + '/invmodel'),
    'model_restore_path': os.environ.get('VMPC_INVMODEL_DIR',
                                         BASE_DIR + '/invmodel'),
    'replan_every': 2,
}

config = {
    'experiment_name': 'sawyer_two_step',
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 30000,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
    'nshuffle': 200,
}
