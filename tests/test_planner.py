import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.planners.gaussian import (fit_elites, initial_mean,
                                                    initial_sigma,
                                                    make_action_spec,
                                                    sample_actions)

HP = {'initial_std': 0.05, 'initial_std_lift': 0.15,
      'initial_std_rot': np.pi / 18, 'initial_std_grasp': 2,
      'action_order': ['x', 'z', 'grasp'], 'nactions': 3, 'repeat': 2}


@pytest.fixture(scope='module')
def spec():
    return make_action_spec(HP, 3)


def test_initial_sigma_matches_numpy(spec):
    from visual_foresight_tpu.policy.utils.controller_utils import (
        construct_initial_sigma)
    from visual_foresight_tpu.utils.hparams import HParams
    hp = HParams(**HP)
    np_sigma = construct_initial_sigma(hp, 3)
    jx_sigma = np.asarray(initial_sigma(spec))
    assert np.allclose(np_sigma, jx_sigma, atol=1e-7)


def test_sample_shapes_and_repeat(spec):
    key = jax.random.PRNGKey(0)
    mean, sigma = initial_mean(spec), initial_sigma(spec)
    acts = np.asarray(sample_actions(key, mean, sigma, spec, 32))
    assert acts.shape == (32, 6, 3)     # nactions*repeat = 6
    # repeat blocks are identical
    assert np.allclose(acts[:, 0], acts[:, 1])
    assert np.allclose(acts[:, 2], acts[:, 3])
    # xy clipped at 2*std
    assert np.abs(acts[:, :, 0]).max() <= 2 * HP['initial_std'] + 1e-6


def test_sample_statistics(spec):
    key = jax.random.PRNGKey(1)
    mean, sigma = initial_mean(spec), initial_sigma(spec)
    acts = np.asarray(sample_actions(key, mean, sigma, spec, 4000,
                                     action_bound=False))
    grasp = acts[:, 0, 2]   # grasp dim: std 2, unclipped
    assert abs(grasp.std() - 2.0) < 0.15
    assert abs(grasp.mean()) < 0.15


def test_rejection_bounds(spec):
    key = jax.random.PRNGKey(2)
    mean, sigma = initial_mean(spec), initial_sigma(spec)
    acts = np.asarray(sample_actions(key, mean, sigma, spec, 500,
                                     rejection_rounds=10))
    assert np.abs(acts[:, :, 0]).max() <= 1.5 * HP['initial_std'] + 1e-6
    assert np.abs(acts[:, :, 1]).max() <= 1.5 * HP['initial_std_lift'] + 1e-6


def test_fit_elites_matches_numpy(spec):
    rng = np.random.RandomState(0)
    elites = rng.randn(8, 6, 3).astype(np.float32)
    # make repeat blocks consistent the way sampled plans are
    elites = np.repeat(elites[:, ::2], 2, axis=1)
    mean, sigma = fit_elites(jnp.asarray(elites), spec)

    acts = elites.reshape(8, 3, 2, 3)[:, :, -1, :].reshape(8, 9)
    np_mean = acts.mean(0)
    np_cov = np.cov(acts, rowvar=False, bias=False)
    assert np.allclose(np.asarray(mean), np_mean, atol=1e-5)
    assert np.allclose(np.asarray(sigma), np_cov, atol=1e-4)


def test_distance_grid():
    g = np.asarray(cost_lib.distance_grid(jnp.asarray([3.0, 4.0]), 8, 10))
    assert g.shape == (8, 10)
    assert g[3, 4] == 0
    assert abs(g[0, 0] - 5.0) < 1e-5


def test_expected_pixel_distance_prefers_closer():
    H, W = 8, 10
    goal = jnp.asarray([[[2.0, 3.0]]])          # (ncam=1, P=1, 2)
    grids = cost_lib.distance_grid(goal, H, W)  # (1,1,H,W)
    # sample 0: distribution at the goal; sample 1: far away
    d = np.zeros((2, 4, 1, H, W, 1), np.float32)
    d[0, :, 0, 2, 3, 0] = 1.0
    d[1, :, 0, 7, 9, 0] = 1.0
    scores = np.asarray(cost_lib.expected_pixel_distance(
        jnp.asarray(d), grids, finalweight=10.0))
    assert scores[0] < scores[1]
    assert scores[0] < 1e-4


def test_final_weight_dominates():
    H, W = 8, 10
    grids = cost_lib.distance_grid(jnp.asarray([[[2.0, 3.0]]]), H, W)
    # sample 0: near goal early, far at the end; sample 1: opposite
    d = np.zeros((2, 3, 1, H, W, 1), np.float32)
    d[0, :2, 0, 2, 3, 0] = 1.0
    d[0, 2, 0, 7, 9, 0] = 1.0
    d[1, :2, 0, 7, 9, 0] = 1.0
    d[1, 2, 0, 2, 3, 0] = 1.0
    scores = np.asarray(cost_lib.expected_pixel_distance(
        jnp.asarray(d), grids, finalweight=10.0))
    assert scores[1] < scores[0]


def test_fused_planner_finds_goal_directed_plan():
    """End-to-end planner sanity: with a predictor whose distribution motion
    follows the CDNA kernels, the returned best plan must beat the average
    sampled plan on its own cost."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=3, enc_features=(8, 16, 32))
    spec = make_action_spec(HP, 3)
    key = jax.random.PRNGKey(0)
    H, W = 16, 24
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    acts0 = jnp.zeros((1, 7, 3))
    states = jnp.zeros((1, 2, 3))
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, imgs, acts0, states, distribs)

    planner = FusedCEMPlanner(model, spec, num_samples=24, iterations=2,
                              k_elite=6, n_vis=4)
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)
    result = planner.replan(
        [params], jax.random.PRNGKey(3), imgs[0][None][0][None],
        states[0], distribs[0][None][0][None], jnp.zeros((1, 3)), grids,
        initial_mean(spec), initial_sigma(spec))

    scores = np.asarray(result['scores_per_itr'])
    best = np.asarray(result['best_scores'])
    assert best[0] <= scores[-1].mean()
    assert result['best_actions'].shape == (6, 6, 3)
    assert np.all(np.diff(best) >= -1e-5)   # sorted ascending


def test_fused_planner_sharded_over_mesh():
    """Sample axis sharded over the 8-device CPU mesh produces the same
    semantics (scores/top-k/refit) as the unsharded planner program."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.parallel.mesh import make_mesh
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=3, enc_features=(8, 16, 32))
    spec = make_action_spec(HP, 3)
    key = jax.random.PRNGKey(0)
    H, W = 16, 24
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    states = jnp.zeros((1, 2, 3))
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, imgs, jnp.zeros((1, 7, 3)), states, distribs)

    mesh = make_mesh(8)
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)

    def run(planner):
        return planner.replan(
            [params], jax.random.PRNGKey(3), imgs[0][None][0][None],
            states[0], distribs[0][None][0][None], jnp.zeros((1, 3)), grids,
            initial_mean(spec), initial_sigma(spec))

    sharded = run(FusedCEMPlanner(model, spec, num_samples=16, iterations=2,
                                  k_elite=4, n_vis=2, mesh=mesh))
    plain = run(FusedCEMPlanner(model, spec, num_samples=16, iterations=2,
                                k_elite=4, n_vis=2))
    assert np.allclose(np.asarray(sharded['best_scores']),
                       np.asarray(plain['best_scores']), atol=1e-4)
    assert np.allclose(np.asarray(sharded['best_actions']),
                       np.asarray(plain['best_actions']), atol=1e-5)


def _tiny_setup(num_distribs=1):
    """Shared model/params/context for fused-planner semantic tests."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=num_distribs,
                          sdim=3, adim=3, enc_features=(8, 16, 32))
    key = jax.random.PRNGKey(0)
    H, W = 16, 24
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    states = jnp.zeros((1, 2, 3))
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    params = model.init(key, imgs, jnp.zeros((1, 7, 3)), states, distribs)
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)
    ctx = (imgs[0][None][0][None], states[0], distribs[0][None][0][None],
           jnp.zeros((1, 3)))
    return model, params, grids, ctx


def test_fused_smooth_cov_blends_with_previous(spec):
    """smooth_cov parity: with identical keys/elites, the smoothed refit
    sigma must equal (plain_refit + sigma0) / 2 (host GaussianCEMSampler
    ``_refit``: sigma = (cov + sigma_prev) / 2)."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    sigma0 = initial_sigma(spec)

    def run(smooth):
        planner = FusedCEMPlanner(model, spec, num_samples=12, iterations=2,
                                  k_elite=4, n_vis=2, smooth_cov=smooth)
        return planner.replan([params], jax.random.PRNGKey(3), *ctx, grids,
                              initial_mean(spec), sigma0)

    plain = np.asarray(run(False)['sigma'])
    smooth = np.asarray(run(True)['sigma'])
    assert np.allclose(smooth, (plain + np.asarray(sigma0)) / 2.0, atol=1e-6)


def test_fused_add_zero_action(spec):
    """With add_zero_action, candidate 0 is the all-zeros plan; under a
    constant cost top_k keeps index order, so the best plan comes back as
    exactly zero."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    planner = FusedCEMPlanner(
        model, spec, num_samples=8, iterations=1, k_elite=3, n_vis=2,
        add_zero_action=True,
        cost_fn=lambda gi, gd, c: jnp.zeros(gi.shape[0]))
    result = planner.replan([params], jax.random.PRNGKey(5), *ctx, grids,
                            initial_mean(spec), initial_sigma(spec))
    assert np.allclose(np.asarray(result['best_actions'][0]), 0.0)


def test_fused_warm_num_samples_variant(spec):
    """A second (smaller) static sample count compiles and returns
    consistently shaped results — the reuse_mean/reuse_cov warm-start path."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    planner = FusedCEMPlanner(model, spec, num_samples=16, iterations=2,
                              k_elite=4, n_vis=2)
    cold = planner.replan([params], jax.random.PRNGKey(1), *ctx, grids,
                          initial_mean(spec), initial_sigma(spec))
    warm = planner.replan([params], jax.random.PRNGKey(2), *ctx, grids,
                          cold['mean'], cold['sigma'], num_samples=8)
    assert np.asarray(warm['scores_per_itr']).shape == (2, 8)
    assert warm['best_actions'].shape == cold['best_actions'].shape


MPPI_HP = {'kappa': 1.0, 'beta_0': 0.5, 'beta_1': 0.5, 'refit_cov': False,
           'mean_bias': None, 'per_dim_std': (0.05, 0.2, 1.0)}


def _mppi_spec(nactions=6):
    from visual_foresight_tpu.planners.gaussian import ActionSpec
    stds = MPPI_HP['per_dim_std']
    return ActionSpec(adim=3, nactions=nactions, repeat=1, per_dim_std=stds,
                      clip_dims_xy=(), clip_dims_rot=(), rej_dims_xy=(),
                      rej_dims_lift=(), xy_std=stds[0], lift_std=stds[1])


def test_fused_mppi_ar1_anchor():
    """beta_0=0, beta_1=1 with a valid anchor propagates the anchor through
    every step: the AR(1) recurrence collapses to a constant plan."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    hp = dict(MPPI_HP, beta_0=0.0, beta_1=1.0)
    planner = FusedCEMPlanner(model, _mppi_spec(), num_samples=4,
                              iterations=1, k_elite=2, n_vis=1, mppi=hp)
    anchor = jnp.asarray([0.3, -0.2, 0.1])
    plan = planner._sample_mppi(jax.random.PRNGKey(0),
                                jnp.zeros(18), None, anchor, 1.0, 4)
    assert plan.shape == (4, 6, 3)
    expect = np.broadcast_to(np.asarray(anchor), (4, 6, 3))
    assert np.allclose(np.asarray(plan), expect, atol=1e-6)


def test_fused_mppi_update_matches_host():
    """The fused soft elite-weighted mean equals the host
    CorrelatedNoiseSampler's sample_next_actions mean update."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    planner = FusedCEMPlanner(model, _mppi_spec(), num_samples=4,
                              iterations=1, k_elite=2, n_vis=1,
                              mppi=dict(MPPI_HP))
    rng = np.random.RandomState(0)
    elites = rng.randn(5, 6, 3).astype(np.float32)
    scores = rng.rand(5).astype(np.float32)

    mean, cov = planner._mppi_update(jnp.asarray(elites), jnp.asarray(scores))
    rewards = -scores
    S = np.exp(MPPI_HP['kappa'] * (rewards - rewards.max()))
    host_mean = np.einsum('n,nta->ta', S, elites) / (S.sum() + 1e-4)
    assert cov is None
    assert np.allclose(np.asarray(mean).reshape(6, 3), host_mean, atol=1e-5)


def test_fused_mppi_finds_goal_directed_plan():
    """End-to-end MPPI replan: best plan beats the sample average on its own
    cost, shapes line up with control-cadence (repeat=1) planning."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    model, params, grids, ctx = _tiny_setup()
    planner = FusedCEMPlanner(model, _mppi_spec(), num_samples=16,
                              iterations=2, k_elite=4, n_vis=2,
                              mppi=dict(MPPI_HP, refit_cov=True))
    result = planner.replan([params], jax.random.PRNGKey(7), *ctx, grids,
                            jnp.zeros(18), jnp.eye(18))
    scores = np.asarray(result['scores_per_itr'])
    best = np.asarray(result['best_scores'])
    assert best[0] <= scores[-1].mean()
    assert result['best_actions'].shape == (4, 6, 3)


def test_fused_stochastic_planning_copies():
    """stochastic_planning=(K,) fused semantics (reference
    gaussian_sampler.py:140-141): each unique plan appears K times.  With a
    deterministic model the K copies must score identically; with a
    stochastic latent each copy draws its own prior sample and scores
    differ."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    H, W, K, M = 16, 24, 3, 12
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    states = jnp.zeros((1, 2, 3))
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)
    spec = make_action_spec(HP, 3)

    def run(latent_dim):
        model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1,
                              sdim=3, adim=3, latent_dim=latent_dim,
                              enc_features=(8, 16, 16))
        params = model.init(key, imgs, jnp.zeros((1, 7, 3)), states,
                            distribs)
        planner = FusedCEMPlanner(model, spec, num_samples=M, iterations=1,
                                  k_elite=4, stochastic_k=K)
        out = planner.replan([params], jax.random.PRNGKey(5),
                             imgs[0][None][0][None], states[0],
                             distribs[0][None][0][None], jnp.zeros((1, 3)),
                             grids, initial_mean(spec), initial_sigma(spec))
        return np.asarray(out['scores_per_itr'])[0].reshape(M // K, K)

    det = run(0)
    np.testing.assert_allclose(det, det[:, :1].repeat(K, 1), rtol=1e-5)
    sto = run(4)
    spread = np.abs(sto - sto.mean(1, keepdims=True)).max()
    assert spread > 1e-6, 'per-copy latents must decorrelate copy scores'


def test_fused_discrete_dims():
    """discrete_ind fused semantics: listed plan dims floor-clip into
    {0..4} before rollout/refit (reference controller_utils.py:107)."""
    from visual_foresight_tpu.models.cdna import CDNAPredictor
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    H, W = 16, 24
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 2, H, W, 3))
    states = jnp.zeros((1, 2, 3))
    distribs = jnp.zeros((1, 2, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    grids = cost_lib.distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)
    spec = make_action_spec(HP, 3)
    model = CDNAPredictor(n_context=2, num_masks=4, num_distribs=1, sdim=3,
                          adim=3, enc_features=(8, 16, 16))
    params = model.init(key, imgs, jnp.zeros((1, 7, 3)), states, distribs)
    planner = FusedCEMPlanner(model, spec, num_samples=12, iterations=1,
                              k_elite=4, discrete_dims=(2,))
    out = planner.replan([params], jax.random.PRNGKey(5),
                         imgs[0][None][0][None], states[0],
                         distribs[0][None][0][None], jnp.zeros((1, 3)),
                         grids, initial_mean(spec), initial_sigma(spec))
    grasp = np.asarray(out['best_actions'])[..., 2]
    assert np.all(grasp == np.floor(grasp))
    assert grasp.min() >= 0.0 and grasp.max() <= 4.0


def test_fused_planner_sample_chunking_parity():
    """sample_chunk microbatching (docs/PERFORMANCE.md sample sweep): with a
    deterministic predictor the chunked program must reproduce the unchunked
    scores, elites, refit and vis exactly — only the live working set
    changes."""
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    model, params, grids, ctx = _tiny_setup()
    spec = make_action_spec(HP, 3)
    imgs, states, distribs, ctx_actions = ctx

    def run(**kw):
        planner = FusedCEMPlanner(model, spec, num_samples=24, iterations=2,
                                  k_elite=6, n_vis=4, **kw)
        return planner.replan([params], jax.random.PRNGKey(3), imgs, states,
                              distribs, ctx_actions, grids,
                              initial_mean(spec), initial_sigma(spec))

    plain = run()
    chunked = run(sample_chunk=8)
    assert np.allclose(np.asarray(plain['scores_per_itr']),
                       np.asarray(chunked['scores_per_itr']), atol=1e-5)
    assert np.allclose(np.asarray(plain['best_actions']),
                       np.asarray(chunked['best_actions']), atol=1e-6)
    assert np.allclose(np.asarray(plain['mean']),
                       np.asarray(chunked['mean']), atol=1e-6)
    assert np.allclose(np.asarray(plain['vis']['gen_images']),
                       np.asarray(chunked['vis']['gen_images']), atol=1e-5)
    # chunk not dividing a warm-start count falls back to unchunked
    planner = FusedCEMPlanner(model, spec, num_samples=24, iterations=2,
                              k_elite=6, n_vis=4, sample_chunk=8)
    out = planner.replan([params], jax.random.PRNGKey(3), imgs, states,
                         distribs, ctx_actions, grids, initial_mean(spec),
                         initial_sigma(spec), num_samples=20)
    assert np.asarray(out['scores_per_itr']).shape == (2, 20)


def test_fused_planner_stochastic_dispersion_penalty():
    """stochastic_penalty: with K latent copies per unique plan, elites are
    selected on mean + lambda*std across copies — a plan that is great
    under one latent but poor under others (predictor optimism) must lose
    to a consistently-good plan, and all reported elites must be (first
    rows of) unique-plan groups."""
    import jax.numpy as jnp
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner

    model, params, grids, ctx = _tiny_setup()
    spec = make_action_spec(HP, 3)
    imgs, states, distribs, ctx_actions = ctx

    calls = {}

    def dispersed_cost(gen_images, gen_distribs, cost_ctx):
        # synthetic scores: group 0 disperses (0 or 10 alternating copies),
        # group 1 is consistently 4, everyone else consistently 6
        m = gen_distribs.shape[0]
        row = jnp.arange(m)
        group, copy = row // 2, row % 2
        scores = jnp.full((m,), 6.0)
        scores = jnp.where(group == 0, jnp.where(copy == 0, 0.0, 10.0),
                           scores)
        scores = jnp.where(group == 1, 4.0, scores)
        calls['m'] = m
        return scores

    def run(penalty):
        planner = FusedCEMPlanner(model, spec, num_samples=16, iterations=1,
                                  k_elite=4, n_vis=2, stochastic_k=2,
                                  stochastic_penalty=penalty,
                                  cost_fn=dispersed_cost)
        return planner.replan([params], jax.random.PRNGKey(0), imgs, states,
                              distribs, ctx_actions, grids,
                              initial_mean(spec), initial_sigma(spec))

    # reference semantics: the optimistic copy (score 0) wins
    plain = run(0.0)
    assert float(plain['best_scores'][0]) == 0.0
    # penalized: group 0 scores 5 + 1.0*5 = 10; group 1 scores 4 -> wins
    pen = run(1.0)
    assert np.isclose(float(pen['best_scores'][0]), 4.0, atol=1e-5)
    # elite rows are first copies of groups (even indices)
    # best group is 1 -> its plan equals row 2's plan
    assert calls['m'] == 16
