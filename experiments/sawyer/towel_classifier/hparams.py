"""Towel-folding MPC with a success-classifier cost and the folding sampler
(capability of reference ``experiments/sawyer/towel_classifier/hparams.py``)."""

import os

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.robot_envs.autograsp_env import AutograspEnv
from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
    FoldingCEMSampler)
from visual_foresight_tpu.policy.cem_controllers.variants.classifier_controller import (
    ClassifierController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'robot_name': 'sawyer',
    'start_box': [1, 1, 0.7],
    'reset_before_eval': False,
    'rand_drop_reset': False,
    'save_video': True,
    'camera_topics': [IMTopic('/front/image_raw', flip=True)],
}

agent = {
    'type': BenchmarkAgent,
    'env': (AutograspEnv, env_params),
    'data_save_dir': BASE_DIR,
    'T': 15,
    'image_height': 48,
    'image_width': 64,
    'current_dir': current_dir,
    'no_goal_def': True,
}

policy = {
    'type': ClassifierController,
    'replan_interval': 15,
    'num_samples': 18,
    'selection_frac': 0.05,
    'sampler': FoldingCEMSampler,
    'initial_std': 0.005,
    'initial_std_lift': 0.05,
    'verbose_every_iter': True,
    'state_append': [0.41, 0.25, 0.166],
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
    # native classifier checkpoint (replaces the reference's external
    # control_embedding classifier_conf_path/classifier_restore_path)
    'classifier_path': os.environ.get('VMPC_CLASSIFIER_DIR',
                                      BASE_DIR + '/classifier_model'),
}

config = {
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
