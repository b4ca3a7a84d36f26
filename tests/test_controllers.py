"""Controller smoke tests on the CPU backend: goal-image, classifier, NCE,
registration — all through their public act() ABI with random-init models."""

import numpy as np
import pytest

AG_PARAMS = {'adim': 3, 'sdim': 3, 'ncam': 1, 'image_height': 16,
             'image_width': 24, 'T': 6}
SMALL_PREDICTOR = {'num_masks': 4, 'dtype': 'float32', 'sequence_length': 8}
BASE_POLICY = {
    'T': 6, 'nactions': 2, 'num_samples': 12, 'minimum_selection': 3,
    'action_order': ['x', 'z', 'grasp'], 'initial_std_lift': 0.1,
    'rejection_sampling': False, 'verbose': False,
    'predictor_hparams': SMALL_PREDICTOR,
}


def _history(seed=0):
    rng = np.random.RandomState(seed)
    images = (rng.rand(2, 1, 16, 24, 3) * 255).astype(np.uint8)
    state = rng.randn(2, 3).astype(np.float32) * 0.01
    goal_image = rng.rand(1, 16, 24, 3).astype(np.float32)
    return images, state, goal_image


def _run_two_steps(ctrl, **act_kwargs):
    ctrl.reset()
    out = None
    for t in range(2):
        out = ctrl.act(t=t, i_tr=0, **act_kwargs)
        assert out['actions'].shape == (3,)
    return out


def test_goal_im_controller():
    from visual_foresight_tpu.policy.cem_controllers.goal_im_controller import (
        GoalImController)
    ctrl = GoalImController(AG_PARAMS, dict(BASE_POLICY))
    images, state, goal_image = _history()
    out = _run_two_steps(ctrl, images=images, goal_image=goal_image,
                         state=state, verbose_worker=None)
    assert 'scores_itr0' in out['plan_stat']


def test_classifier_controller():
    from visual_foresight_tpu.policy.cem_controllers.variants.classifier_controller import (
        ClassifierController)
    ctrl = ClassifierController(AG_PARAMS, dict(BASE_POLICY))
    images, state, goal_image = _history(1)
    out = _run_two_steps(ctrl, images=images, goal_image=goal_image,
                         state=state, verbose_worker=None)
    scores = out['plan_stat']['scores_itr0']
    assert np.all(scores > 0)   # -log sigmoid is positive


def test_nce_controller():
    from visual_foresight_tpu.policy.cem_controllers.variants.nce_cost_controller import (
        NCECostController)
    ctrl = NCECostController(AG_PARAMS, dict(BASE_POLICY))
    images, state, goal_image = _history(2)
    out = _run_two_steps(ctrl, images=images, goal_image=goal_image,
                         state=state, verbose_worker=None)
    scores = out['plan_stat']['scores_itr0']
    assert np.all(np.abs(scores) <= 1.0 + 1e-5)   # -cosine similarity


def test_registration_controller():
    from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
        RegisterGtruthController)
    pp = dict(BASE_POLICY)
    ag = dict(AG_PARAMS, ntask=1)
    ctrl = RegisterGtruthController(ag, pp)
    images, state, goal_image = _history(3)
    desig = np.array([[[8, 12]]])
    goal_pix = np.array([[[4, 20]]])
    ctrl.reset()
    out = None
    for t in range(2):
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal_pix,
                       images=images, goal_image=goal_image, state=state,
                       verbose_worker=None)
        assert out['actions'].shape == (3,)
    # registration produced tradeoffs over (cam, start/goal) tasks
    assert 'tradeoff' in out['plan_stat']
    assert np.isclose(out['plan_stat']['tradeoff'].sum(), 1.0, atol=1e-4)


def test_ensemble_controller():
    from visual_foresight_tpu.policy.cem_controllers.variants.ensemble_vidpred import (
        CEMControllerEnsembleVidPred)
    pp = dict(BASE_POLICY)
    pp['num_ensembles'] = 2
    ctrl = CEMControllerEnsembleVidPred(AG_PARAMS, pp)
    images, state, _ = _history(4)
    desig = np.array([[[8, 12]]])
    goal_pix = np.array([[[4, 20]]])
    ctrl.reset()
    out = ctrl.act(t=1, i_tr=0, desig_pix=desig, goal_pix=goal_pix,
                   images=images, state=state, verbose_worker=None)
    assert out['actions'].shape == (3,)
    assert 'scores_itr0' in out['plan_stat']


def test_registration_controller_multi_object_pixels():
    """Multi-object scenes hand over (ncam, num_objects, 2) pixel arrays;
    with ntask=1 the controller plans for the first object instead of
    crashing on an exact-shape reshape."""
    from visual_foresight_tpu.policy.cem_controllers.registration_controller import (
        RegisterGtruthController)
    pp = dict(BASE_POLICY)
    ag = dict(AG_PARAMS, ntask=1)
    ctrl = RegisterGtruthController(ag, pp)
    images, state, goal_image = _history(4)
    desig = np.array([[[8, 12], [3, 4], [10, 20]]])    # 3 objects
    goal_pix = np.array([[[4, 20], [5, 5], [11, 21]]])
    ctrl.reset()
    out = ctrl.act(t=1, i_tr=0, desig_pix=desig, goal_pix=goal_pix,
                   images=images, goal_image=goal_image, state=state,
                   verbose_worker=None)
    assert out['actions'].shape == (3,)
    np.testing.assert_array_equal(ctrl._goal_pix_sel, [[[4, 20]]])


def test_pixel_controller_fused_warm_start():
    """reuse_mean/reuse_cov no longer disable the fused planner: the device
    program warm-starts from the previous replan's refit distribution and
    shrinks the sample count by reuse_factor (observable via scores length)."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    policy = dict(BASE_POLICY, reuse_mean=True, reuse_cov=True,
                  smooth_cov=True, num_samples=8, replan_interval=2)
    ctrl = PixelCostController(AG_PARAMS, policy)
    assert ctrl._fused is not None, 'warm-start hparams must stay fused'

    images, state, _ = _history(3)
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(5):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                       images=np.stack(hist_i), state=np.stack(hist_s),
                       verbose_worker=None)
        assert out['actions'].shape == (3,)
    # replan at t=0 (cold, 8 samples), replans later warm (4 samples)
    assert out['plan_stat']['scores_itr0'].shape[-1] == 4
    assert ctrl._fused_state is not None


def test_pixel_controller_fused_mppi():
    """CorrelatedNoiseSampler configs run in the fused device program."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    from visual_foresight_tpu.policy.cem_controllers.samplers.correlated_noise import (
        CorrelatedNoiseSampler)
    policy = {
        'T': 6, 'num_samples': 8, 'minimum_selection': 3, 'verbose': False,
        'predictor_hparams': SMALL_PREDICTOR,
        'sampler': CorrelatedNoiseSampler,
        'nactions': 6, 'initial_std': [0.05, 0.05, 0.2],
        'smooth_across_last_action': True,
    }
    ctrl = PixelCostController(AG_PARAMS, policy)
    assert ctrl._fused is not None and ctrl._fused.is_mppi

    images, state, _ = _history(4)
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(3):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                       images=np.stack(hist_i), state=np.stack(hist_s),
                       verbose_worker=None)
        assert out['actions'].shape == (3,)
    assert out['plan_stat']['scores_itr0'].shape == (8,)


def test_pixel_controller_fused_autograsp():
    """AutograspSampler configs (explicit-gripper action space) run in the
    fused device program: base dims sampled, grip latched on device, actions
    come back with the +/-1 grip command in the trailing dim."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_sampler import (
        AutograspSampler)
    ag_params = {'adim': 4, 'sdim': 3, 'ncam': 1, 'image_height': 16,
                 'image_width': 24, 'T': 6}
    policy = {
        'T': 6, 'nactions': 2, 'num_samples': 8, 'minimum_selection': 3,
        'verbose': False, 'predictor_hparams': SMALL_PREDICTOR,
        'sampler': AutograspSampler,
        'initial_std_lift': 0.1, 'rejection_sampling': False,
        'z_thresh': 0.05, 'reopen': True,
    }
    ctrl = PixelCostController(ag_params, policy)
    assert ctrl._fused is not None and ctrl._fused._ag is not None, \
        'AutograspSampler must ride the fused planner'

    images, state, _ = _history(5)
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(3):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                       images=np.stack(hist_i), state=np.stack(hist_s),
                       verbose_worker=None)
        assert out['actions'].shape == (4,)
        if t >= 1:   # t=0 is the controller's warm-up zeros action
            assert out['actions'][3] in (-1.0, 1.0)
    assert out['plan_stat']['scores_itr0'].shape == (8,)


def test_pixel_controller_fused_ag_epsilon():
    """AutograspEpsilon configs run fused: the decaying epsilon fraction and
    the cumulative-z pivot happen on device, actions keep the explicit
    +/-1 grip in the trailing dim."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    from visual_foresight_tpu.policy.cem_controllers.samplers.autograsp_epsilon import (
        AutograspEpsilon)
    ag_params = {'adim': 4, 'sdim': 4, 'ncam': 1, 'image_height': 16,
                 'image_width': 24, 'T': 6}
    policy = {
        'T': 6, 'nactions': 2, 'num_samples': 8, 'minimum_selection': 3,
        'verbose': False, 'predictor_hparams': SMALL_PREDICTOR,
        'sampler': AutograspEpsilon,
        'initial_std_lift': 0.1, 'rejection_sampling': False,
        'ag_zthresh': 0.05,
    }
    ctrl = PixelCostController(ag_params, policy)
    assert ctrl._fused is not None and ctrl._fused._ag_eps is not None

    rng_np = np.random.RandomState(6)
    images = (rng_np.rand(2, 1, 16, 24, 3) * 255).astype(np.uint8)
    state = rng_np.randn(2, 4).astype(np.float32) * 0.01
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(3):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                       images=np.stack(hist_i), state=np.stack(hist_s),
                       verbose_worker=None)
        assert out['actions'].shape == (4,)
    # the decaying fraction leaves later-iteration rows with raw Gaussian
    # grip values (host semantics), so the executed grip need not be +/-1;
    # the +/-1 derivation itself is pinned by
    # test_ag_epsilon_device_matches_host
    assert out['plan_stat']['scores_itr0'].shape == (8,)


def test_pixel_controller_fused_folding():
    """FoldingCEMSampler configs run in the fused device program."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    from visual_foresight_tpu.policy.cem_controllers.samplers.folding_sampler import (
        FoldingCEMSampler)
    ag_params = {'adim': 4, 'sdim': 4, 'ncam': 1, 'image_height': 16,
                 'image_width': 24, 'T': 15}
    policy = {    # folding defaults: nactions 5 x repeat 3 = T 15
        'num_samples': 8,
        'minimum_selection': 3, 'verbose': False,
        'predictor_hparams': dict(SMALL_PREDICTOR, sequence_length=17),
        'sampler': FoldingCEMSampler,
    }
    ctrl = PixelCostController(ag_params, policy)
    assert ctrl._fused is not None and ctrl._fused._folding is not None

    rng_np = np.random.RandomState(8)
    images = (rng_np.rand(2, 1, 16, 24, 3) * 255).astype(np.uint8)
    state = rng_np.rand(2, 4).astype(np.float32) * 0.2
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(3):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        out = ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                       images=np.stack(hist_i), state=np.stack(hist_s),
                       verbose_worker=None)
        assert out['actions'].shape == (4,)
    assert out['plan_stat']['scores_itr0'].shape == (8,)


def test_pixel_controller_predictor_propagation():
    """predictor_propagation carries the best predicted distribution across
    replans (reference pixel_cost_controller.py:161-166,199-204): the first
    replan anchors at the one-hot designated pixel, later replans feed the
    propagated distribution instead, and reset() clears it."""
    from visual_foresight_tpu.policy.cem_controllers.pixel_cost_controller import (
        PixelCostController)
    policy = dict(BASE_POLICY, predictor_propagation=True, num_samples=8,
                  replan_interval=2)
    ctrl = PixelCostController(AG_PARAMS, policy)

    images, state, _ = _history(4)
    desig = np.array([[[4, 6]]])
    goal = np.array([[[10, 18]]])
    ctrl.reset()
    assert ctrl._chosen_distrib is None
    ctrl._desig_pix = desig.reshape(1, 1, 2)
    onehot = ctrl._make_input_distrib(0)   # no replan yet -> one-hot anchor
    assert onehot.shape == (ctrl._net_context, 1, 16, 24, 1)
    assert float(onehot[0, 0, 4, 6, 0]) == 1.0 and float(onehot.sum()) == \
        ctrl._net_context

    hist_i, hist_s = [images[0]], [state[0]]
    for t in range(3):
        hist_i.append(images[t % 2])
        hist_s.append(state[t % 2])
        ctrl.act(t=t, i_tr=0, desig_pix=desig, goal_pix=goal,
                 images=np.stack(hist_i), state=np.stack(hist_s),
                 verbose_worker=None)

    # a replan happened -> the best rollout's tail is the next context
    assert ctrl._chosen_distrib is not None
    assert ctrl._chosen_distrib.shape == (ctrl._net_context, 1, 16, 24, 1)
    prop = ctrl._make_input_distrib(0)
    assert np.shares_memory(prop, ctrl._chosen_distrib) or \
        np.array_equal(prop, ctrl._chosen_distrib[-ctrl._net_context:])
    # warped distributions spread mass: no longer a one-hot
    assert float(np.max(prop)) < 1.0

    ctrl.reset()
    assert ctrl._chosen_distrib is None
