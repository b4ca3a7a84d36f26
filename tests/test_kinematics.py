"""Hermetic kinematics-layer tests: DLS IK over every per-robot chain, the
reference IK-service ABI, the MoveIt-free Kuka planner, and the franka
joint-move sampler.  No ROS, no hardware, no TPU."""

import importlib

import numpy as np
import pytest

from visual_foresight_tpu.envs.robot_envs.kuka.kuka_interface import (
    MAX_PATH_LENGTH, WORKSPACE_HIGH, WORKSPACE_LOW, FakeCommander,
    KukaInterface, Plan)
from visual_foresight_tpu.envs.robot_envs.util.kinematics import (
    IKError, Joint, SerialChain, chain_from_dh)

ROBOTS = ['sawyer', 'baxter', 'kuka', 'franka']


def _ik_module(robot):
    return importlib.import_module(
        'visual_foresight_tpu.envs.robot_envs.{}.inverse_kinematics'
        .format(robot))


# -- core solver -----------------------------------------------------------------------

def test_dh_chain_matches_hand_fk():
    """A 2-link planar DH arm pins chain_from_dh's transform order."""
    chain = chain_from_dh(names=['j1', 'j2'], a=[1.0, 0.5], d=[0.0, 0.0],
                          alpha=[0.0, 0.0], lower=[-np.pi] * 2,
                          upper=[np.pi] * 2)
    for q1, q2 in [(0.0, 0.0), (np.pi / 2, 0.0), (0.3, -0.7)]:
        pose = chain.fk_pose([q1, q2])
        x = np.cos(q1) + 0.5 * np.cos(q1 + q2)
        y = np.sin(q1) + 0.5 * np.sin(q1 + q2)
        np.testing.assert_allclose(pose[:3], [x, y, 0.0], atol=1e-12)


def test_theta_offset_is_home_angle_shift():
    base = chain_from_dh(names=['j1'], a=[1.0], d=[0.0], alpha=[0.0],
                         lower=[-np.pi], upper=[np.pi])
    offset = chain_from_dh(names=['j1'], a=[1.0], d=[0.0], alpha=[0.0],
                           theta_offset=[0.4], lower=[-np.pi], upper=[np.pi])
    np.testing.assert_allclose(offset.fk_pose([0.1]), base.fk_pose([0.5]),
                               atol=1e-12)


@pytest.mark.parametrize('robot', ROBOTS)
def test_fk_ik_round_trip(robot):
    """ik(fk(q)) reaches the same pose within 1 mm / 0.01 rad for every
    robot chain, seeded near (but not at) the solution."""
    mod = _ik_module(robot)
    chain = mod.CHAIN
    rng = np.random.RandomState(3)
    for _ in range(5):
        q = rng.uniform(chain.lower, chain.upper)
        q = 0.7 * q + 0.3 * 0.5 * (chain.lower + chain.upper)
        pose = chain.fk_pose(q)
        seed = chain.clip(q + rng.randn(chain.n) * 0.1)
        sol = chain.ik(pose[:3], pose[3:], seed=seed)
        reached = chain.fk_pose(sol)
        assert np.linalg.norm(reached[:3] - pose[:3]) < 1e-3
        # quaternion double cover: compare |<q1, q2>|
        assert abs(np.dot(reached[3:], pose[3:])) > 0.9999
        assert np.all(sol >= chain.lower - 1e-9)
        assert np.all(sol <= chain.upper + 1e-9)


@pytest.mark.parametrize('robot', ROBOTS)
def test_position_only_ik(robot):
    mod = _ik_module(robot)
    chain = mod.CHAIN
    target = chain.fk_pose(mod.NEUTRAL)[:3] + np.array([0.02, -0.03, 0.01])
    sol = chain.ik(target, None, seed=mod.NEUTRAL)
    assert np.linalg.norm(chain.fk_pose(sol)[:3] - target) < 1e-3


def test_ik_unreachable_raises():
    mod = _ik_module('kuka')
    with pytest.raises(IKError):
        mod.CHAIN.ik(np.array([5.0, 0.0, 0.0]), None, max_iters=50)


def test_nullspace_bias_prefers_neutral():
    """With a redundant 7-DoF chain, the nullspace-goal solve lands closer
    to neutral than an unbiased solve from a far seed."""
    mod = _ik_module('kuka')
    chain, neutral = mod.CHAIN, mod.NEUTRAL
    pose = chain.fk_pose(neutral)
    far_seed = chain.clip(neutral + 0.8)
    plain = chain.ik(pose[:3], pose[3:], seed=far_seed)
    biased = chain.ik(pose[:3], pose[3:], seed=far_seed,
                      nullspace_goal=neutral)
    assert (np.linalg.norm(biased - neutral) <
            np.linalg.norm(plain - neutral) + 1e-9)


# -- reference ABI ---------------------------------------------------------------------

@pytest.mark.parametrize('robot', ROBOTS)
def test_reference_ik_service_abi(robot):
    """get_pose_stamped + get_joint_angles round-trip through the command
    dict exactly as the reference service wrappers do."""
    mod = _ik_module(robot)
    pose7 = mod.CHAIN.fk_pose(mod.NEUTRAL)
    ps = mod.get_pose_stamped(pose7[0], pose7[1], pose7[2], pose7[3:])
    seed = {n: float(v) for n, v in zip(mod.CHAIN.joint_names, mod.NEUTRAL)}
    cmd = mod.get_joint_angles(ps, seed_cmd=seed, use_advanced_options=True)
    assert set(cmd) == set(mod.CHAIN.joint_names)
    reached = mod.forward_kinematics(cmd)
    assert np.linalg.norm(reached[:3] - pose7[:3]) < 1e-3
    np.testing.assert_allclose(mod.joint_state_from_cmd(cmd),
                               [cmd[n] for n in mod.CHAIN.joint_names])


def test_point_stamped_is_position_only():
    mod = _ik_module('sawyer')
    target = mod.CHAIN.fk_pose(mod.NEUTRAL)[:3]
    ps = mod.get_point_stamped(*target)
    seed = {n: float(v) for n, v in zip(mod.CHAIN.joint_names, mod.NEUTRAL)}
    cmd = mod.get_joint_angles(ps, seed_cmd=seed)
    assert np.linalg.norm(mod.forward_kinematics(cmd)[:3] - target) < 1e-3


def test_baxter_left_limb_names():
    mod = _ik_module('baxter')
    pose7 = mod.forward_kinematics(mod.NEUTRAL, limb='left')
    ps = mod.get_pose_stamped(pose7[0], pose7[1], pose7[2], pose7[3:])
    cmd = mod.get_joint_angles(ps, limb='left')
    assert all(k.startswith('left_') for k in cmd)


# -- kuka planner ----------------------------------------------------------------------

def test_kuka_plan_respects_max_path_length():
    iface = KukaInterface(commander=FakeCommander(), seed=0)
    target = iface.move_kuka_to_eep(np.array([0.6, 0.0, 0.2, 0, 1, 0, 0]))
    cmd = iface._commander
    assert cmd.executed, 'plan must execute'
    assert all(len(p.points) <= MAX_PATH_LENGTH for p in cmd.executed)
    # the arm actually reached the (clamped) target
    assert np.linalg.norm(iface.get_kuka_cartesian_pose()[:3] - target) < 1e-3


def test_kuka_workspace_clamp():
    iface = KukaInterface(commander=FakeCommander(), seed=0)
    reached = iface.move_kuka_to_eep(np.array([2.0, -2.0, 0.0, 0, 1, 0, 0]))
    np.testing.assert_allclose(
        reached, np.clip([2.0, -2.0, 0.0], WORKSPACE_LOW, WORKSPACE_HIGH))


def test_kuka_neutral_and_traj_counter():
    iface = KukaInterface(commander=FakeCommander(q0=np.full(7, 0.3)), seed=0)
    assert iface.traj_num == -1
    iface.move_kuka_to_neutral()
    iface.move_kuka_to_neutral()
    assert iface.traj_num == 1


def test_kuka_redistribute_sweep():
    iface = KukaInterface(commander=FakeCommander(), seed=0)
    iface.redistribute_kuka_objects()
    assert len(iface._commander.executed) == 25      # reference's P1..P23+Pn circuit


def test_kuka_plan_statistics():
    iface = KukaInterface(commander=FakeCommander(), seed=0)
    pts = np.linspace(np.zeros(7), np.full(7, 0.5), 8)
    total = iface._calc_plan_statistics(Plan(points=pts, dt=0.1))
    np.testing.assert_allclose(total, 0.5 * 6, atol=1e-9)  # wrist excluded
    assert iface._calc_plan_statistics(
        Plan(points=np.zeros((0, 7)), dt=0.1)) is None


def test_kuka_state_getters():
    iface = KukaInterface(commander=FakeCommander(), seed=0)
    ja, vel, eep = iface.get_kuka_state()
    assert ja.shape == (7,) and vel.shape == (7,) and eep.shape == (7,)
    assert len(iface.get_kuka_joint_angles_names()) == 7
    x, y, z, qx, qy, qz, w = iface.get_xyz_quat()
    np.testing.assert_allclose([x, y, z], eep[:3])


# -- franka joint move -----------------------------------------------------------------

def test_franka_joint_trajectory_samples():
    from visual_foresight_tpu.envs.robot_envs.franka.franka_impedance import (
        joint_trajectory_samples)
    start = np.zeros(7)
    wp = np.full(7, 0.4)
    samples, times = joint_trajectory_samples(start, [wp], 2.0, rate=50)
    assert samples.shape == (100, 7) and times.shape == (100,)
    np.testing.assert_allclose(samples[-1], wp, atol=1e-6)
    # monotone approach along the spline: end closer than start
    assert np.linalg.norm(samples[0] - wp) > np.linalg.norm(samples[-1] - wp)
