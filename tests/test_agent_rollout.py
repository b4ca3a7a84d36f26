import numpy as np

from visual_foresight_tpu.agent.general_agent import GeneralAgent
from visual_foresight_tpu.envs.mujoco_env.cartgripper_env.cartgripper_xz_grasp import (
    CartgripperXZGrasp)
from visual_foresight_tpu.policy.random.gaussian import GaussianPolicy


def _agent_conf(T=6):
    env_params = {'viewer_image_height': 96, 'viewer_image_width': 128,
                  'cube_objects': True}
    return {
        'type': GeneralAgent,
        'env': (CartgripperXZGrasp, env_params),
        'T': T,
        'image_height': 48,
        'image_width': 64,
        'gen_xml': 1,
    }


def test_rollout_shapes():
    np.random.seed(0)
    conf = _agent_conf(T=6)
    agent = GeneralAgent(conf, start_saver=False)
    policy = GaussianPolicy(agent._hyperparams,
                            {'nactions': 2,
                             'action_order': ['x', 'z', 'grasp'],
                             'initial_std_lift': 0.1})
    agent_data, obs, policy_out = agent.sample(policy, 0)

    assert obs['images'].shape == (7, 1, 48, 64, 3)
    assert obs['images'].dtype == np.uint8
    assert obs['state'].shape == (7, 3)
    assert len(policy_out) == 6
    assert all(p['actions'].shape == (3,) for p in policy_out)
    assert agent_data['term_t'] == 5
    assert 'traj_ok' in agent_data
    assert 'goal_reached' in agent_data  # env has a goal


def test_rollout_is_resized_consistently():
    np.random.seed(1)
    conf = _agent_conf(T=3)
    agent = GeneralAgent(conf, start_saver=False)
    policy = GaussianPolicy(agent._hyperparams,
                            {'nactions': 1,
                             'action_order': ['x', 'z', 'grasp'],
                             'initial_std_lift': 0.1})
    _, obs, _ = agent.sample(policy, 0)
    # frames differ over time (the sim actually moved)
    assert not np.array_equal(obs['images'][0], obs['images'][-1])
