"""Round-5 two-camera xz-grasp collection.

One corpus feeds the whole two-camera registration rebuild (docs/EVAL.md
benchmark #4) plus the single-view baselines: per-view records train the
2-cam predictor and the GDN flow net, and view0 alone trains the
inverse-model baseline.  Same operating point as ``r4_flagship`` with a
second camera (capability of reference
``data_collection/sim/cartgripper_xz_grasp/cube_objects/hparams.py`` with
``ncam: 2``, as the registration experiments collected).

Save dir env-overridable: ``VMPC_DATA_DIR`` (default
``/root/data/collect/xz2c_r5``).
"""

import os
import os.path

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

DATA_DIR = os.environ.get('VMPC_DATA_DIR', '/root/data/collect/xz2c_r5')
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
    'start_index': int(os.environ.get('VMPC_START_INDEX', 0)),
    'end_index': int(os.environ.get('VMPC_END_INDEX', 100000)),
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
