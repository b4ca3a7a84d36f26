"""Round-4 grasp-transport campaign collection: autograsp cartgripper,
3 cubes — the SAME env parameters as the ``ag_bench20`` /
``ag_bench20_hard`` benchmark sets (``experiments/sim/autograsp_stochastic``)
so the predictor trains on-distribution for the transport campaign.

Policy is the 4-dim Gaussian over (x, y, z, theta); the env latches the
gripper (autograsp dynamics, reference
``envs/mujoco_env/cartgripper_env/autograsp_env.py:43-52``).  Save dir is
env-overridable (``VMPC_DATA_DIR``, default ``/root/data/collect/ag_r4``).
"""

import os
import os.path

import numpy as np

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

DATA_DIR = os.environ.get('VMPC_DATA_DIR', '/root/data/collect/ag_r4')
current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'num_objects': 3,
    'viewer_image_height': 96,
    'viewer_image_width': 128,
    'cube_objects': True,
    'ncam': 1,
    'finger_sensors': True,
    # spaced spawns cut the born-bad-scene rate (overlap -> solver ejection
    # through the floor); same value the reference's grasping experiments
    # use (reference experiments/sim/ensemble_grasping/hparams.py:20)
    'object_object_mindist': 0.15,
    # the library default (40 blocks x 500 substeps x dt=0.005 = 100
    # simulated seconds, reference parity) spends 70% of collection time
    # settling an already-settled scene: final object z is identical to 4
    # decimals from 4 blocks up (measured).  6 blocks = 15 sim-seconds.
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
    # no rejection sampling: the campaign needs maximum trajectory
    # throughput and diverse (incl. failed-grasp) data
}

policy = {
    'type': GaussianPolicy,
    'nactions': 10,
    'initial_std': 0.04,
    'initial_std_rot': np.pi / 32,
}

# z-sampling std, env-overridable so one conf collects either the 0.6
# exploration corpus (r4/r4b) or a corpus matched to the campaign planning
# std (VMPC_STD_LIFT=0.15 — the CEM probe distribution the predictor must
# cover at plan time).  Identical-to-default overrides are rejected by
# design, so only set the key when it differs from the GaussianPolicy
# default.
_std_lift = float(os.environ.get('VMPC_STD_LIFT', 0.6))
if _std_lift != GaussianPolicy.DEFAULT_HPARAMS['initial_std_lift']:
    policy['initial_std_lift'] = _std_lift

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': True,
    'skip_bad_trajs': True,   # unattended campaign: skip unproducible indices
    'seperate_good': True,
    'save_raw_images': False,
    'start_index': int(os.environ.get('VMPC_START_INDEX', 0)),
    'end_index': int(os.environ.get('VMPC_END_INDEX', 100000)),
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
