"""Sampler ecosystem semantics."""

import numpy as np
import pytest

from visual_foresight_tpu.utils.hparams import HParams


def _hp(d):
    return HParams(**d)


def test_correlated_noise_smoothing():
    from visual_foresight_tpu.policy.cem_controllers.samplers.correlated_noise import (
        CorrelatedNoiseSampler)
    hp = _hp(CorrelatedNoiseSampler.get_default_hparams())
    s = CorrelatedNoiseSampler(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 64, None)
    assert acts.shape == (64, hp.nactions, 4)
    # AR(1) smoothing: adjacent-step correlation must be clearly positive
    flat = acts[:, :, 0]
    corr = np.corrcoef(flat[:, :-1].ravel(), flat[:, 1:].ravel())[0, 1]
    assert corr > 0.3

    # MPPI mean update: low-score (good) plans dominate the refit mean
    best = np.zeros((4, hp.nactions, 4))
    best[0] += 1.0   # plan 0 is distinct...
    scores = np.array([0.0, 100.0, 100.0, 100.0])  # ...and much better
    np.random.seed(1)
    nxt = s.sample_next_actions(64, best, scores)
    assert abs(nxt[:, 5:, :].mean() - 1.0) < 0.45


def test_autograsp_sampler_gripper_logic():
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_sampler import (
        AutograspSampler)
    hp_dict = AutograspSampler.get_default_hparams()
    hp_dict.update({'rejection_sampling': False, 'nactions': 4, 'repeat': 1,
                    'z_thresh': 0.0, 'action_order': None})
    hp = _hp(hp_dict)
    s = AutograspSampler(hp, 4, 4)   # adim incl. gripper
    np.random.seed(0)
    # current z = 1.0, z_thresh = 0: gripper opens unless cumulative z dips
    acts = s.sample_initial_actions(0, 32, np.array([0, 0, 1.0]))
    assert acts.shape == (32, 4, 4)
    grip = acts[..., -1]
    assert set(np.unique(grip)).issubset({-1.0, 1.0})
    # without reopen, once closed stays closed
    for b in range(32):
        closed = np.where(grip[b] == hp.gripper_close_cmd)[0]
        if len(closed):
            assert np.all(grip[b, closed[0]:] == hp.gripper_close_cmd)


def test_folding_sampler_shapes_and_clip():
    from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
        FoldingCEMSampler)
    hp = _hp(FoldingCEMSampler.get_default_hparams())
    s = FoldingCEMSampler(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 12, np.array([0.5, 0.5, 0.2, 0]))
    assert acts.shape == (12, hp.nactions * hp.repeat, 4)
    assert np.abs(acts[:, :, :3]).max() <= max(hp.max_shift) + 1e-9
    nxt = s.sample_next_actions(12, acts, np.arange(12.0))
    assert nxt.shape == acts.shape


def test_autograsp_epsilon_pivot_on_repeat_boundary():
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_epsilon import (
        AutograspEpsilon)
    hp_dict = AutograspEpsilon.get_default_hparams()
    hp_dict.update({'nactions': 4, 'repeat': 2, 'ag_epsilon': 0.0,
                    'action_order': None, 'ag_zthresh': 0.0})
    hp = _hp(hp_dict)
    s = AutograspEpsilon(hp, 4, 4)
    np.random.seed(0)
    acts = s.sample_initial_actions(0, 16, np.array([0, 0, 1.0, 0]))
    assert acts.shape == (16, 8, 4)
    grip = acts[..., -1]
    # with epsilon 0: grip flips happen only on repeat boundaries
    for b in range(16):
        changes = np.where(np.diff(grip[b]) != 0)[0] + 1
        assert all(c % hp.repeat == 0 for c in changes)


def test_sampler_policy_plays_fixed_plan():
    from visual_foresight_tpu.policy.random.sampler_policy import SamplerPolicy
    np.random.seed(0)
    p = SamplerPolicy({'T': 6, 'adim': 4}, {'beta_0': 0.7, 'beta_1': 0.3})
    a0 = p.act(t=0)['actions']
    a1 = p.act(t=1)['actions']
    assert a0.shape == (4,)
    # replays the t=0 plan (no resampling mid-traj)
    a0_again = p.act(t=0)  # new traj -> new plan
    assert not np.allclose(a0, a1)


def test_autograsp_latch_device_matches_host():
    """The fused planner's on-device gripper derivation
    (``planners/gaussian.autograsp_gripper_latch``) must reproduce the host
    ``AutograspSampler._sample_gripper`` bit-for-bit on the same base plans
    (both reopen modes)."""
    import jax.numpy as jnp
    from visual_foresight_tpu.planners.gaussian import autograsp_gripper_latch
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_sampler import (
        AutograspSampler)

    rng = np.random.RandomState(3)
    base = (rng.randn(16, 12, 3) * 0.4).astype(np.float32)
    current_state = np.array([0.1, -0.2, 0.35], np.float32)

    for reopen in (False, True):
        hp_dict = AutograspSampler.get_default_hparams()
        hp_dict.update({'rejection_sampling': False, 'nactions': 12,
                        'repeat': 1, 'z_thresh': 0.15, 'reopen': reopen,
                        'action_norm_factor': 0.7, 'action_order': None})
        s = AutograspSampler(_hp(hp_dict), 4, 4)
        s._current_state = current_state
        host = s._sample_gripper(base.copy(), base.shape[0])

        dev = np.asarray(autograsp_gripper_latch(
            jnp.asarray(base), current_state[2], 0.15, norm_factor=0.7,
            reopen=reopen, close_cmd=hp_dict['gripper_close_cmd'],
            open_cmd=hp_dict['gripper_open_cmd']))
        np.testing.assert_array_equal(dev, host.astype(np.float32))


def test_fused_autograsp_planner_latches_grip():
    """FusedCEMPlanner(autograsp=...): the returned best plans carry the
    derived grip command as the trailing dim, and the refit distribution
    stays base-dim."""
    import jax
    import jax.numpy as jnp
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.planners import costs as cost_lib
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                        initial_sigma,
                                                        make_action_spec)

    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=4, enc_features=(8, 16, 32))
    hp = {'initial_std': 0.3, 'initial_std_lift': 0.4,
          'initial_std_rot': 0.1, 'initial_std_grasp': 2.0,
          'action_order': None, 'nactions': 6, 'repeat': 1}
    spec = make_action_spec(hp, 3)   # base dims only (x, y, z)
    key = jax.random.PRNGKey(0)
    H, W = 16, 24
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    states = jnp.zeros((1, 2, 3)).at[:, :, 2].set(0.5)
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, imgs, jnp.zeros((1, 5, 4)), states, distribs)

    planner = FusedCEMPlanner(
        model, spec, num_samples=24, iterations=2, k_elite=6, n_vis=4,
        autograsp={'z_thresh': 0.35, 'norm_factor': 1.0, 'close_cmd': 1.0,
                   'open_cmd': -1.0, 'reopen': False, 'deviation_prob': 0.0,
                   'no_refit': True})
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)
    result = planner.replan(
        [params], jax.random.PRNGKey(3), imgs[0][None][0][None],
        states[0], distribs[0][None][0][None], jnp.zeros((1, 4)), grids,
        initial_mean(spec), initial_sigma(spec))

    best = np.asarray(result['best_actions'])
    assert best.shape == (6, 6, 4)             # base 3 + derived grip
    grip = best[..., -1]
    assert set(np.unique(grip)).issubset({-1.0, 1.0})
    # sticky latch (reopen=False): once closed, stays closed
    for b in range(grip.shape[0]):
        closed = np.where(grip[b] == 1.0)[0]
        if len(closed):
            assert np.all(grip[b, closed[0]:] == 1.0)
    # refit distribution covers base dims only
    assert result['mean'].shape == (18,)
    assert result['sigma'].shape == (18, 18)

    # deterministic latch extremes: a threshold above any reachable z closes
    # every step; one below any reachable z never closes
    from visual_foresight_tpu.planners.gaussian import autograsp_gripper_latch
    base = jnp.asarray(np.random.RandomState(0).randn(4, 6, 3) * 0.3)
    always = np.asarray(autograsp_gripper_latch(base, 0.5, 1e3))[..., -1]
    never = np.asarray(autograsp_gripper_latch(base, 0.5, -1e3))[..., -1]
    assert (always == 1.0).all() and (never == -1.0).all()


def test_autograsp_close_prob_resample():
    """no_refit=False semantics: per-timestep elite close frequency drives
    Bernoulli gripper resampling (host sample_next_actions twin)."""
    import jax
    import jax.numpy as jnp
    from visual_foresight_tpu.planners.gaussian import (
        autograsp_gripper_resample)
    elites = np.zeros((4, 6, 4), np.float32)
    elites[..., -1] = -1.0
    elites[:, 2:, -1] = 1.0        # all elites close from t=2 on
    elites[0, 0, -1] = 1.0         # 25% close at t=0
    grip = np.asarray(autograsp_gripper_resample(
        jax.random.PRNGKey(0), jnp.asarray(elites), 400, 6))
    freq = (grip == 1.0).mean(axis=0)
    assert freq[1] == 0.0                          # nobody closed at t=1
    assert (freq[2:] == 1.0).all()                 # everyone closes t>=2
    assert 0.15 < freq[0] < 0.35                   # ~25% at t=0


def test_ag_epsilon_device_matches_host():
    """The fused AutograspEpsilon gripper derivation (epsilon=0 for
    determinism) must match the host ``_apply_ag_epsilon`` on shared plans:
    same repeat-boundary pivot, including the all-open argmax edge case."""
    import jax
    import jax.numpy as jnp
    from visual_foresight_tpu.planners.gaussian import ag_epsilon_transform
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_epsilon import (
        AutograspEpsilon)

    hp_dict = AutograspEpsilon.get_default_hparams()
    hp_dict.update({'nactions': 4, 'repeat': 3, 'ag_epsilon': 0.0,
                    'action_order': None, 'ag_zthresh': 0.1, 'z_norm': 0.8,
                    'rejection_sampling': False})
    s = AutograspEpsilon(_hp(hp_dict), 4, 4)
    rng = np.random.RandomState(2)
    plans = (rng.randn(10, 12, 4) * 0.4).astype(np.float32)
    state = np.array([0.0, 0.0, 0.25, 0.0], np.float32)

    host = plans.copy()
    s._apply_ag_epsilon(state, host)

    dev = np.asarray(ag_epsilon_transform(
        jax.random.PRNGKey(0), jnp.asarray(plans), state[2], 10,
        z_dim=2, grip_dim=3, z_norm=0.8, zthresh=0.1, epsilon=0.0,
        repeat=3))
    np.testing.assert_array_equal(dev, host)

    # epsilon=1 flips every step deterministically
    dev_flip = np.asarray(ag_epsilon_transform(
        jax.random.PRNGKey(0), jnp.asarray(plans), state[2], 10,
        z_dim=2, grip_dim=3, z_norm=0.8, zthresh=0.1, epsilon=1.0,
        repeat=3))
    np.testing.assert_array_equal(dev_flip[..., 3], -dev[..., 3])


def test_folding_sample_device_structure():
    """Device folding prior (planners/gaussian.folding_sample): phase means
    match the host's pick-fold-place structure, the split-2 tail holds one
    draw, the remainder follows the refit Gaussian, and xy/z clip to
    max_shift."""
    import jax
    import jax.numpy as jnp
    from visual_foresight_tpu.planners.gaussian import (ActionSpec,
                                                        folding_sample)

    n, adim, M = 6, 4, 400
    spec = ActionSpec(adim=adim, nactions=n, repeat=2,
                      per_dim_std=(0.05, 0.05, 0.15, 0.17),
                      clip_dims_xy=(), clip_dims_rot=(), rej_dims_xy=(),
                      rej_dims_lift=(), xy_std=0.05, lift_std=0.15)
    dim = n * adim
    sigma = jnp.eye(dim) * 0.0004          # tiny noise: means dominate
    mean = jnp.full((dim,), 0.33)
    state_xy = jnp.asarray([0.4, 0.6])
    plans = np.asarray(folding_sample(
        jax.random.PRNGKey(0), mean, sigma, state_xy, M, spec,
        split_frac=0.5, max_shift=(5.0, 5.0, 5.0), first_itr=False))
    assert plans.shape == (M, n * 2, adim)
    ps = 100                                # per_split = int(400*0.5/2)
    ctrl = plans[:, ::2]                    # one action per repeat block

    # split 1: z means +1, -1, +1, +1, -1
    z1 = ctrl[:ps, :5, 2].mean(axis=0)
    np.testing.assert_allclose(z1, [1, -1, 1, 1, -1], atol=0.05)
    # split 2 holds one draw from step 3 on
    np.testing.assert_allclose(ctrl[ps:2 * ps, 3], ctrl[ps:2 * ps, 4],
                               atol=1e-6)
    np.testing.assert_allclose(ctrl[ps:2 * ps, 3], ctrl[ps:2 * ps, 5],
                               atol=1e-6)
    # remainder: plain Gaussian around the refit mean
    np.testing.assert_allclose(ctrl[2 * ps:].mean(), 0.33, atol=0.01)

    # clipping
    clipped = np.asarray(folding_sample(
        jax.random.PRNGKey(1), mean, sigma, state_xy, M, spec,
        split_frac=0.5, max_shift=(0.1, 0.1, 0.2), first_itr=True))
    assert np.abs(clipped[:, :, :2]).max() <= 0.1 + 1e-6
    assert np.abs(clipped[:, :, 2]).max() <= 0.2 + 1e-6
