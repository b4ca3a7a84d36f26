"""Grasp-transport benchmark: pixel-cost MPC on the vendored ag_bench20 set.

Autograsp cartgripper, 3 cubes — env parameters IDENTICAL to the
``data_collection/sim/cartgripper_grasp/r4_transport`` campaign the
predictor is trained on (latched gripper: reference
``envs/mujoco_env/cartgripper_env/autograsp_env.py:43-52``).  The policy
samples (x, y, z, theta) deltas; the stochastic (SAVP-style latent)
predictor draws one latent per CEM sample.

Run (after training the campaign predictor — see docs/EVAL.md round 4)::

    python -m visual_foresight_tpu.sim.run benchmarks/ag_bench20/hparams.py --benchmark
"""

import os.path

import numpy as np

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.cem_controllers import PixelCostController
from visual_foresight_tpu.policy.cem_controllers.samplers.gaussian_sampler import (
    GaussianCEMSampler)

BASE_DIR = '/'.join(str.split(__file__, '/')[:-1])
REPO_ROOT = os.path.dirname(os.path.dirname(BASE_DIR))
current_dir = os.path.dirname(os.path.realpath(__file__))

TASK_SET = os.path.basename(BASE_DIR.rstrip('/'))   # ag_bench20 / ..._hard

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
    'type': BenchmarkAgent,
    'env': (AutograspCartgripperEnv, env_params),
    'data_save_dir': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/results',
    'T': 30,
    'image_height': 48,
    'image_width': 64,
    'record': os.environ.get('VMPC_RESULT_DIR', BASE_DIR) + '/record/',
    'start_goal_confs': os.environ.get(
        'VMPC_TASK_DIR', os.path.join(REPO_ROOT, 'benchmarks/tasks'))
        + '/' + TASK_SET,
    'current_dir': current_dir,
}

def _resolve_model():
    from visual_foresight_tpu.prediction.checkpoints import resolve_model_dir
    return resolve_model_dir(
        ('/root/data/models/ag_r5f_v2',
         os.path.join(REPO_ROOT, 'benchmarks/models/ag_r5f_v2'))
    ) or '/root/data/models/ag_r5f_v2'


policy = {
    'type': PixelCostController,
    'initial_std': 0.04,
    'initial_std_rot': np.pi / 32,
    'rejection_sampling': False,
    # cadence env-overridable for the replan-density experiment
    # (docs/EVAL.md round 5); use 1 for replan-every-step (0 equals the
    # controller default and would be rejected as a no-op override)
    'replan_interval': int(os.environ.get('VMPC_REPLAN', 10)),
    # transport moves the object far from its start pixel; carry the best
    # predicted distribution across replans instead of re-anchoring at the
    # (stale) start pixel — the reference's own transport experiments set
    # this (experiments/robonet/pixel_cost/hparams.py:37)
    'predictor_propagation': True,
    # 768 = lane-aligned TPU operating point: the round-5 controlled A/B
    # on the vendored lifting set measured 768 quality >= 800 (+0.182 vs
    # +0.158 mean improvement, same checkpoint/tasks) at 17% less
    # wall-clock (800 pads to 896 lanes; docs/PERFORMANCE.md sample sweep)
    'num_samples': 768,
    'nactions': 10,
    'T': 30,
    # fallback chain mirrors bench.py: a fresh /root/data run wins, else
    # the checkpoint vendored in-repo (survives data wipes)
    'model_path': os.environ.get('VMPC_MODEL_DIR', '') or _resolve_model(),
}

# z-sampling std must roughly match the TRAINING corpus's action
# distribution or CEM exploits predictor extrapolation error: 0.6 for
# the random-collection models (ag_r4/ag_r4b, collected at std 0.6),
# ~0.15 for models trained on the scripted demonstrator corpus (z-step
# cap 0.09, policy/handcrafted/grasp_transport_policy.py) — the
# reference tunes the same knob per experiment (0.2-0.5,
# experiments/robonet/pixel_cost/hparams.py:37).  Identical-to-default
# overrides are rejected by design (policy.py _override_defaults), so only
# set the key when it differs from the GaussianCEMSampler default.
_std_lift = float(os.environ.get('VMPC_STD_LIFT', 0.6))
if _std_lift != GaussianCEMSampler.get_default_hparams()['initial_std_lift']:
    policy['initial_std_lift'] = _std_lift

# latent-dispersion planning (round-5 hard-set lever): K prior-latent
# copies per unique plan, elites on mean + lambda*std across copies —
# only set when requested (identical-to-default overrides are rejected)
_stoch_k = int(os.environ.get('VMPC_STOCH_K', 0))
if _stoch_k > 1:
    policy['stochastic_planning'] = (_stoch_k,)
_stoch_pen = float(os.environ.get('VMPC_STOCH_PEN', 0))
if _stoch_pen:
    policy['stochastic_penalty'] = _stoch_pen

config = {
    'traj_per_file': 128,
    'current_dir': current_dir,
    'save_data': False,
    'seperate_good': False,
    'save_raw_images': True,
    'start_index': 0,
    'end_index': 19,
    'agent': agent,
    'policy': policy,
    'ngroup': 1000,
}
