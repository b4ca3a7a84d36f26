"""Offline (dataset-replay) towel-classifier planning experiment: the env
replays logged trajectories so controller changes can be evaluated without a
robot (capability of reference ``experiments/offline_exp/towel_classifier/hparams.py``)."""

import os

from visual_foresight_tpu.agent.offline_agent import OfflineAgent
from visual_foresight_tpu.envs.offline_env import OfflineSawyerEnv
from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
    FoldingCEMSampler)
from visual_foresight_tpu.policy.cem_controllers.variants.classifier_controller import (
    ClassifierController)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {}

agent = {
    'type': OfflineAgent,
    'env': (OfflineSawyerEnv, env_params),
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
    'num_samples': 600,
    'selection_frac': 0.05,
    'sampler': FoldingCEMSampler,
    'initial_std': 0.005,
    'initial_std_lift': 0.05,
    'verbose_every_iter': True,
    'state_append': [0.41, 0.25, 0.166],
    'model_path': os.environ.get('VMPC_MODEL_DIR', BASE_DIR + '/modeldata'),
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
