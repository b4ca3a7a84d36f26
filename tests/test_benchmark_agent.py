"""BenchmarkAgent + goal-source coverage: a sim benchmark episode must
re-create the vendored start scene, expose the stored goal, and report
``env.eval()`` stats (reference contract:
``visual_mpc/agent/benchmarking_agent.py`` + ``benchmarking_agent`` configs).
"""

import os
import pickle as pkl

import numpy as np
import pytest

from visual_foresight_tpu.agent.benchmarking_agent import BenchmarkAgent
from visual_foresight_tpu.agent.goal_sources import (GoalSpec,
                                                     TrajectoryFolderGoalSource)
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.autograsp_env import (
    AutograspCartgripperEnv)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TASK_SET = os.path.join(REPO, 'benchmarks', 'tasks', 'ag_bench20')


def _bench_conf(tmp_path, T=6):
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
    return {
        'type': BenchmarkAgent,
        'env': (AutograspCartgripperEnv, env_params),
        'data_save_dir': str(tmp_path),
        'T': T,
        'image_height': 48,
        'image_width': 64,
        'start_goal_confs': TASK_SET,
        'current_dir': str(tmp_path),
    }


def test_trajectory_folder_goal_source_reads_vendored_task():
    hp = {'start_goal_confs': TASK_SET, 'image_height': 48, 'image_width': 64,
          'data_save_dir': '/tmp/x'}
    spec = TrajectoryFolderGoalSource(hp, ncam=1).load(0)
    assert isinstance(spec, GoalSpec)
    assert spec.goal_image.shape == (2, 1, 48, 64, 3)
    assert spec.goal_image.dtype == np.float32
    assert 0. <= spec.goal_image.min() and spec.goal_image.max() <= 1.
    assert spec.reset_state is not None
    assert spec.goal_obj_pose.shape[-1] == 7          # 3 objects x quat pose
    assert spec.save_path.endswith('verbose/traj_0')

    # iex overrides the requested index (the --iex CLI contract)
    hp['iex'] = 1
    spec1 = TrajectoryFolderGoalSource(hp, ncam=1).load(0)
    assert not np.array_equal(spec1.goal_image, spec.goal_image)


def test_goal_source_missing_image_raises():
    hp = {'start_goal_confs': '/nonexistent', 'image_height': 48,
          'image_width': 64, 'data_save_dir': '/tmp/x'}
    with pytest.raises(ValueError, match='goal image'):
        TrajectoryFolderGoalSource(hp, ncam=1).load(0)


def test_benchmark_episode_end_to_end(tmp_path):
    np.random.seed(0)
    conf = _bench_conf(tmp_path, T=6)
    agent = BenchmarkAgent(conf, start_saver=False)
    policy = GaussianPolicy(agent._hyperparams, {'nactions': 2})

    agent_data, obs, _ = agent.sample(policy, 0)

    # the stored scene was re-created: the rollout starts from the task's
    # reset state and the goal pose matches the vendored obs_dict tail
    with open(os.path.join(TASK_SET, 'traj_group0', 'traj0',
                           'obs_dict.pkl'), 'rb') as f:
        stored = pkl.load(f)
    np.testing.assert_allclose(agent_data['goal_pos'],
                               stored['object_qpos'][-1])
    assert agent_data['goal_image'].shape == (2, 1, 48, 64, 3)

    # benchmark metadata: eval stats + the verbose worker slot
    assert 'stats' in agent_data
    assert 'improvement' in agent_data['stats']
    assert agent_data['verbose_worker'] is None      # start_saver=False
    assert obs['images'].shape == (7, 1, 48, 64, 3)
