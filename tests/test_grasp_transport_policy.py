"""GraspTransportPolicy: phase progression and action bounds on a
synthetic kinematic rollout (no mujoco).

The scripted demonstrator is closed-loop over (state, object_poses_full);
an ideal position-servo plant (state += action, object rides the gripper
once "grasped") is enough to exercise every phase transition.
"""

import numpy as np
import pytest

from visual_foresight_tpu.policy.handcrafted.grasp_transport_policy import (
    GraspTransportPolicy)

AG_PARAMS = {'adim': 4, 'T': 30}
LOW = np.array([-0.5, -0.5, -0.08, -2 * np.pi])
HIGH = np.array([0.5, 0.5, 0.15, 2 * np.pi])


def _rollout(seed, p_rand=0.0, graspable=True):
    """Ideal plant: gripper tracks commands exactly; the object snaps to the
    gripper xy and follows its z once the hand bottoms out on top of it."""
    rng = np.random.RandomState(seed)
    np.random.seed(seed)
    policy = GraspTransportPolicy(AG_PARAMS, {'p_rand': p_rand,
                                              'sigma_xy': 0.0, 'sigma_z': 0.0,
                                              'sigma_theta': 0.0})
    pos = np.array([0.3, -0.25, 0.13, 0.0])
    obj = np.concatenate([rng.uniform(-0.2, 0.2, 2), [-0.08],
                          [1.0, 0, 0, 0]])
    objs = np.stack([obj, obj + np.array([.25, .25, 0, 0, 0, 0, 0]),
                     obj + np.array([-.25, .2, 0, 0, 0, 0, 0])])
    grasped = False
    states, obj_hist, actions, phases = [], [], [], []
    for t in range(AG_PARAMS['T']):
        states.append(np.concatenate([pos, [1.0]]))
        obj_hist.append(objs.copy())
        out = policy.act(t, np.stack(states), np.stack(obj_hist))
        a = out['actions']
        actions.append(a)
        phases.append(policy._phase)
        pos = pos + a
        pos[:3] = np.clip(pos[:3], LOW[:3], HIGH[:3])
        if graspable and not grasped and pos[2] < -0.05 and \
                np.linalg.norm(pos[:2] - objs[0, :2]) < 0.05:
            grasped = True
        if grasped:
            objs[0, :2] = pos[:2]
            objs[0, 2] = max(pos[2] - 0.02, -0.08)
    return policy, np.asarray(actions), phases, objs


def test_full_transport_reaches_place():
    policy, actions, phases, objs = _rollout(seed=0)
    assert 'carry' in phases and 'place' in phases
    # the object ended near the drop target, well away from its start
    assert np.linalg.norm(objs[0, :2] - policy._drop_xy) < 0.1
    # object was lifted at some point (carry height commands z >= 0.08)
    assert phases.index('carry') < phases.index('place')


def test_action_bounds():
    for seed in range(3):
        _, actions, _, _ = _rollout(seed=seed, p_rand=0.0)
        assert np.all(np.abs(actions[:, :2]) <= 0.08 + 1e-9)
        assert np.all(np.abs(actions[:, 2]) <= 0.09 + 1e-9)
        assert np.all(np.abs(actions[:, 3]) <= np.pi / 4 + 1e-9)


def test_failed_grasp_retries_then_wanders():
    policy, actions, phases, objs = _rollout(seed=1, graspable=False)
    # grasp never latches -> exactly one retry (approach appears after lift)
    lift_i = phases.index('lift')
    assert 'approach' in phases[lift_i:], 'expected a re-approach retry'
    assert policy._retries == 1
    # and the episode still ends in carry/place (failure data, not a stall)
    assert phases[-1] in ('carry', 'place')


def test_theta_alignment_mod_quarter_pi():
    policy = GraspTransportPolicy(AG_PARAMS, {})
    # yaw error is computed mod pi/2 and mapped to [-pi/4, pi/4)
    for theta, yaw in [(0.0, np.pi / 2), (0.2, 0.2 + np.pi), (-3.0, 3.0)]:
        err = policy._theta_err(theta, yaw)
        assert -np.pi / 4 - 1e-9 <= err < np.pi / 4 + 1e-9
        # rotating by err aligns the gripper to the cube face lattice
        residual = (yaw - (theta + err) + np.pi / 4) % (np.pi / 2) - np.pi / 4
        assert abs(residual) < 1e-9


def test_drop_target_min_distance():
    np.random.seed(3)
    policy = GraspTransportPolicy(AG_PARAMS, {})
    for _ in range(20):
        pick = np.random.uniform(-0.3, 0.3, 2)
        drop = policy._pick_drop_target(pick)
        assert np.linalg.norm(drop - pick) >= 0.2 - 1e-9
        assert np.all(np.abs(drop) <= 0.3 + 1e-9)
