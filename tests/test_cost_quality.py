"""Quality tests for the exotic planning costs.

The smoke tests (``test_controllers.py``) only check shapes with random-init
models; these tests prove each cost actually STEERS planning: a briefly
trained model must rank a known-good plan above a known-bad one through the
controller's own scoring path (reference semantics:
``variants/classifier_controller.py``, ``variants/nce_cost_controller.py``,
``register_gtruth_controller.py:113-173``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

H, W = 16, 24
AG_PARAMS = {'adim': 3, 'sdim': 3, 'ncam': 1, 'image_height': H,
             'image_width': W, 'T': 6}
BASE_POLICY = {
    'T': 6, 'nactions': 2, 'num_samples': 20, 'minimum_selection': 3,
    'action_order': ['x', 'z', 'grasp'], 'initial_std_lift': 0.1,
    'rejection_sampling': False, 'verbose': False, 'use_fused_planner': False,
    'predictor_hparams': {'num_masks': 4, 'dtype': 'float32',
                          'sequence_length': 8},
}
GOAL_LOC = (4, 18)
FAR_LOC = (12, 4)


def _square_img(loc, color=(1.0, 0.9, 0.2)):
    img = np.full((H, W, 3), 0.1, np.float32)
    r, c = loc
    img[r:r + 4, c:c + 4] = color
    return img


class _StubPredictor:
    """Deterministic stand-in for the video predictor: plans whose first
    action's x-component is positive 'reach the goal' (final frame shows the
    object at GOAL_LOC), the rest end at FAR_LOC.  Lets the tests isolate
    the COST model's ranking from prediction quality."""

    def __init__(self, model_path, hparams, n_gpus=1, first_gpu=0,
                 model_kwargs=None):
        self.n_context = 2
        self.n_cam = 1
        self.params = None

    def restore(self):
        return self

    def __call__(self, context, action_dict):
        acts = np.asarray(action_dict['actions'])
        M, T = acts.shape[:2]
        frames = np.zeros((M, T, 1, H, W, 3), np.float32)
        for m in range(M):
            loc = GOAL_LOC if acts[m, 0, 0] > 0 else FAR_LOC
            frames[m, :, 0] = _square_img(loc)
        return {'predicted_frames': frames,
                'predicted_pixel_distributions':
                    np.zeros((M, T, 1, H, W, 1), np.float32)}


def _locs(rng, n):
    return np.stack([rng.randint(0, H - 4, n), rng.randint(0, W - 4, n)], 1)


@pytest.fixture(scope='module')
def trained_classifier(tmp_path_factory):
    """Goal-conditioned success classifier trained on synthetic scenes:
    success iff the frame's object sits at the goal image's location."""
    from visual_foresight_tpu.models.classifier import SuccessClassifier
    from visual_foresight_tpu.prediction import checkpoints

    model = SuccessClassifier()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                        jnp.zeros((1, H, W, 3)))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, frames, goals, labels):
        logits = model.apply(p, frames, goals)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    @jax.jit
    def step(p, opt, frames, goals, labels):
        loss, g = jax.value_and_grad(loss_fn)(p, frames, goals, labels)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(p, upd), opt, loss

    rng = np.random.RandomState(0)
    loss = None
    for it in range(250):
        n = 32
        goal_locs = _locs(rng, n)
        pos = rng.rand(n) < 0.5
        frame_locs = np.where(pos[:, None], goal_locs, _locs(rng, n))
        # resample collisions in the negative half
        same = (~pos) & np.all(frame_locs == goal_locs, 1)
        frame_locs[same] = (frame_locs[same] + [5, 7]) % [H - 4, W - 4]
        labels = np.all(frame_locs == goal_locs, 1).astype(np.float32)
        frames = np.stack([_square_img(l) for l in frame_locs])
        goals = np.stack([_square_img(l) for l in goal_locs])
        params, opt, loss = step(params, opt, frames, goals, labels)
    assert float(loss) < 0.3, 'classifier failed to fit synthetic task'

    path = str(tmp_path_factory.mktemp('clf') / 'classifier')
    checkpoints.save_params(jax.device_get(params), path, 250)
    return path


def test_classifier_cost_steers_planning(trained_classifier):
    from visual_foresight_tpu.policy.cem_controllers.variants.classifier_controller import (
        ClassifierController)
    pp = dict(BASE_POLICY, predictor_class=_StubPredictor,
              classifier_path=trained_classifier)
    ctrl = ClassifierController(dict(AG_PARAMS), pp)
    rng = np.random.RandomState(0)
    images = (rng.rand(2, 1, H, W, 3) * 255).astype(np.uint8)
    state = np.zeros((2, 3), np.float32)
    goal_image = _square_img(GOAL_LOC)[None]

    ctrl.reset()
    out = ctrl.act(t=1, i_tr=0, images=images, goal_image=goal_image,
                   state=state, verbose_worker=None)
    # good plans (x>0) must win the CEM refit
    assert out['actions'][0] > 0, 'classifier cost failed to steer to goal'

    # direct ranking through the controller's scoring path
    probe = np.zeros((2, 6, 3), np.float32)
    probe[0, :, 0], probe[1, :, 0] = 1.0, -1.0
    costs = ctrl.evaluate_rollouts(probe, 0)
    assert costs[0] < costs[1]


@pytest.fixture(scope='module')
def trained_embedding(tmp_path_factory):
    """NCE embedding trained with InfoNCE on synthetic scenes: two noisy
    views of the same object location are positives."""
    from visual_foresight_tpu.models.classifier import NCEEmbedding
    from visual_foresight_tpu.prediction import checkpoints

    model = NCEEmbedding()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, a, b):
        za = model.apply(p, a)          # (N, D), L2-normalized
        zb = model.apply(p, b)
        logits = za @ zb.T / 0.2
        labels = jnp.arange(a.shape[0])
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels))

    @jax.jit
    def step(p, opt, a, b):
        loss, g = jax.value_and_grad(loss_fn)(p, a, b)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(p, upd), opt, loss

    rng = np.random.RandomState(1)
    loss = None
    for it in range(300):
        locs = _locs(rng, 16)
        a = np.stack([_square_img(l) for l in locs])
        b = a + rng.randn(*a.shape).astype(np.float32) * 0.02
        params, opt, loss = step(params, opt, a, np.clip(b, 0, 1))
    assert float(loss) < 1.0, 'embedding failed to fit synthetic task'

    path = str(tmp_path_factory.mktemp('emb') / 'embedding')
    checkpoints.save_params(jax.device_get(params), path, 300)
    return path


def test_nce_cost_steers_planning(trained_embedding):
    from visual_foresight_tpu.policy.cem_controllers.variants.nce_cost_controller import (
        NCECostController)
    pp = dict(BASE_POLICY, predictor_class=_StubPredictor,
              embedding_path=trained_embedding)
    ctrl = NCECostController(dict(AG_PARAMS), pp)
    rng = np.random.RandomState(0)
    images = (rng.rand(2, 1, H, W, 3) * 255).astype(np.uint8)
    state = np.zeros((2, 3), np.float32)
    goal_image = _square_img(GOAL_LOC)[None]

    ctrl.reset()
    out = ctrl.act(t=1, i_tr=0, images=images, goal_image=goal_image,
                   state=state, verbose_worker=None)
    assert out['actions'][0] > 0, 'NCE cost failed to steer to goal'

    probe = np.zeros((2, 6, 3), np.float32)
    probe[0, :, 0], probe[1, :, 0] = 1.0, -1.0
    costs = ctrl.evaluate_rollouts(probe, 0)
    assert costs[0] < costs[1]


# ---------------------------------------------------------------------------
# registration: oracle-flow validation of the warp-error tradeoff math
# ---------------------------------------------------------------------------

def _grid_pts():
    r, c = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    return np.stack([r, c], -1).astype(np.float32)


def test_registration_tradeoff_and_tracking():
    """With an oracle flow for the start image (exact correspondence) and a
    broken flow for the goal image (large warp error), the controller must
    (a) relocate the designated pixel by the object's true translation and
    (b) put almost all tradeoff weight on the start-registered pixel
    (reference math: ``register_gtruth_controller.py:113-173``)."""
    from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
        RegisterGtruthController)

    ag = dict(AG_PARAMS, ntask=1)
    ctrl = RegisterGtruthController(ag, dict(BASE_POLICY,
                                             predictor_class=_StubPredictor))

    p0 = np.array([6, 8])
    shift = np.array([2, 3])
    start = _square_img(tuple(p0))[None]          # (ncam, H, W, 3)
    goal = _square_img(GOAL_LOC)[None]
    current = _square_img(tuple(p0 + shift))[None]

    ctrl._start_image = start
    ctrl._goal_image = goal
    ctrl._desig_pix_t0 = p0.reshape(1, 1, 2)
    ctrl._goal_pix_sel = np.array(GOAL_LOC).reshape(1, 1, 2)

    start_j, goal_j = jnp.asarray(start[0]), jnp.asarray(goal[0])

    def oracle(params, cur, ref):
        pts = _grid_pts()
        if bool(jnp.allclose(ref[0], start_j)):
            # perfect registration: ref pixel (r,c) corresponds to the
            # current-frame pixel (r,c) + shift
            warp_pts = pts + shift
            warped = ref  # zero warp error
        else:
            warp_pts = pts  # identity (wrong)
            warped = jnp.zeros_like(ref)  # large warp error vs bright square
        return warped, None, warp_pts[None]

    ctrl._gdn_apply = oracle
    desig, tradeoff = ctrl._register(current)

    # (a) start-registered designated pixel tracked the translation
    np.testing.assert_array_equal(desig[0, 0], p0 + shift)
    # (b) tradeoff normalized over (cam, registration) and start-dominated
    assert tradeoff.shape == (1, 2)
    np.testing.assert_allclose(tradeoff.sum(), 1.0, rtol=1e-5)
    assert tradeoff[0, 0] > 0.97, tradeoff

    # (c) the weighted pixel cost ranks a goal-directed plan first: mass of
    # the high-confidence (start-registered) distribution near the goal
    ctrl._goal_pix = np.tile(np.array(GOAL_LOC).reshape(1, 1, 2), (1, 2, 1))
    gen = np.zeros((2, 3, 1, H, W, 2), np.float32)
    gen[0, :, 0, GOAL_LOC[0], GOAL_LOC[1], :] = 1.0   # plan 0: at goal
    gen[1, :, 0, FAR_LOC[0], FAR_LOC[1], :] = 1.0     # plan 1: far away
    costs = ctrl._eval_pixel_cost(0, gen, None)
    assert costs[0] < costs[1]


def test_registration_fused_grids_weighted():
    """The fused planner consumes tradeoff-scaled distance grids: scaling is
    exactly the host path's weighted cost (linearity), so a designated pixel
    with near-zero confidence must contribute near-zero cost."""
    from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
        RegisterGtruthController)

    ag = dict(AG_PARAMS, ntask=1)
    ctrl = RegisterGtruthController(ag, dict(BASE_POLICY,
                                             predictor_class=_StubPredictor))
    ctrl._goal_pix = np.tile(np.array(GOAL_LOC).reshape(1, 1, 2), (1, 2, 1))
    ctrl.reg_tradeoff = np.array([[1.0, 0.0]], np.float32) / 2  # normalized
    grids = np.asarray(ctrl._cost_grids())
    assert grids.shape == (1, 2, H, W)
    assert np.all(grids[0, 1] == 0)          # zero-confidence desig: no cost
    assert grids[0, 0].max() > 0
    base = np.asarray(
        __import__('visual_foresight_tpu.planners.costs',
                   fromlist=['distance_grid']).distance_grid(
            ctrl._goal_pix.reshape(1, 2, 2), H, W))
    np.testing.assert_allclose(grids[0, 0], base[0, 0] * 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# ensemble disagreement cost
# ---------------------------------------------------------------------------

def test_ensemble_cost_penalizes_disagreement():
    """Two plans with equal mean predicted cost: the one the ensemble
    disagrees on must rank worse (mean + lambda * var semantics)."""
    from visual_foresight_tpu.planners.costs import ensemble_cost
    per_model = jnp.asarray([[1.0, 0.2], [1.0, 1.8]])  # plan 1: high variance
    out = np.asarray(ensemble_cost(per_model, lambda_var=1.0))
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(1.0 + np.var([0.2, 1.8]))
    assert out[1] > out[0]
    # lambda = 0 reduces to the plain mean
    np.testing.assert_allclose(
        np.asarray(ensemble_cost(per_model, lambda_var=0.0)), [1.0, 1.0])


def test_ensemble_rollout_variance_raises_cost():
    """White-box on the ensemble controller's jitted rollout+cost: an
    ensemble of identical members scores plans lower than an ensemble whose
    second member is perturbed (disagreement -> variance penalty), holding
    the first member fixed."""
    from visual_foresight_tpu.policy.cem_controllers.variants.ensemble_vidpred import (
        CEMControllerEnsembleVidPred)
    pp = dict(BASE_POLICY, predictor_class=None, num_ensembles=2,
              ensemble_var_lambda=5.0)
    pp.pop('predictor_class')
    ctrl = CEMControllerEnsembleVidPred(dict(AG_PARAMS), pp)

    rng = jax.random.PRNGKey(0)
    n_ctx = ctrl.predictor.n_context
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, n_ctx, H, W, 3), jnp.float32)
    states = jnp.zeros((n_ctx, 3))
    distribs = jnp.zeros((1, n_ctx, H, W, 1)).at[:, :, 8, 12, 0].set(1.0)
    actions = jnp.asarray(
        np.random.RandomState(1).randn(4, 7, 3) * 0.05, jnp.float32)
    from visual_foresight_tpu.planners.costs import distance_grid
    grids = distance_grid(jnp.asarray([[[4.0, 20.0]]]), H, W)

    p0 = jax.tree.map(lambda x: x[0], ctrl._ens_params)
    p1 = jax.tree.map(lambda x: x[0] + 0.05 * jnp.sign(x[0] + 1e-8),
                      ctrl._ens_params)

    def stack(a, b):
        return jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)

    cost = lambda ens: np.asarray(ctrl._ens_rollout_cost(
        ens, images, states, distribs, actions, rng, grids))
    c00 = cost(stack(p0, p0))          # member-0 cost (zero variance)
    c11 = cost(stack(p1, p1))          # member-1 cost (zero variance)
    c01 = cost(stack(p0, p1))          # mixed: mean + lambda * var

    # members genuinely disagree on this scene
    assert np.abs(c00 - c11).max() > 1e-5
    # mixed-ensemble cost exceeds the member mean by the variance penalty
    member_mean = (c00 + c11) / 2
    assert np.all(c01 >= member_mean - 1e-5)
    assert np.any(c01 > member_mean + 1e-6)
