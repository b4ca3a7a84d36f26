"""Round-4 directed-exploration grasp-transport collection.

Same env as ``r4_transport`` (and the ``ag_bench20`` benchmark sets), but
the collection policy is the scripted noisy pick-and-transport
demonstrator (``policy/handcrafted/grasp_transport_policy.py``) instead of
the 4-dim random Gaussian.  Random collection yields ~11 % grasp success;
the scripted demonstrator multiplies the success *density* per CPU-hour —
the training corpus mixes this with the random campaign's data (coverage)
via ``scripts/merge_record_splits.py``.

Save dir override: ``VMPC_DATA_DIR`` (default ``/root/data/collect/ag_r4s``).
"""

import os
import os.path

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.handcrafted.grasp_transport_policy import (
    GraspTransportPolicy)

DATA_DIR = os.environ.get('VMPC_DATA_DIR', '/root/data/collect/ag_r4s')
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 3,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 1,
    'finger_sensors': True,
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
}

policy = {
    'type': GraspTransportPolicy,
}

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'skip_bad_trajs': True,
    'seperate_good': True,
    'save_raw_images': False,
    'start_index': int(os.environ.get('VMPC_START_INDEX', 0)),
    'end_index': int(os.environ.get('VMPC_END_INDEX', 100000)),
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
