"""Pixel-distance CEM controller (reference ``pixel_cost_controller.py``).

Plugs the video predictor into the CEM loop; cost = expected distance of the
predicted designated-pixel distribution to the goal pixel.

Two execution paths:

* **fused** (default, TPU-first): the entire replan — sampling, rollout of all
  ``num_samples`` candidates, cost, elite selection, refit — is ONE jitted
  device program (``planners/cem.py``).  Zero host round trips per replan.
  Used whenever the configured sampler is the (default) GaussianCEMSampler.
* **host loop**: the reference-shaped ``perform_CEM``/``evaluate_rollouts``
  path with pluggable samplers, one device call per CEM iteration.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.planners.cem import FusedCEMPlanner
from visual_foresight_tpu.planners.gaussian import (ActionSpec, initial_mean,
                                                    initial_sigma,
                                                    make_action_spec,
                                                    shift_sigma)
from visual_foresight_tpu.prediction.predictor import TPUPredictor
from .cem_base_controller import CEMBaseController
from .samplers.autograsp_epsilon import AutograspEpsilon
from .samplers.autograsp_sampler import AutograspSampler
from .samplers.correlated_noise import CorrelatedNoiseSampler
from .samplers.folding_sampler import FoldingCEMSampler
from .samplers.gaussian_sampler import GaussianCEMSampler
from .visualizer.construct_html import (fill_template, save_gifs, save_html,
                                        save_img)


class PixelCostController(CEMBaseController):
    """CEM over an action-conditioned video predictor with pixel-distance cost."""

    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        CEMBaseController.__init__(self, ag_params, policyparams)

        predictor_hparams = dict(self._hp.predictor_hparams or {})
        predictor_hparams.setdefault('designated_pixel_count',
                                     self._hp.designated_pixel_count)
        predictor_hparams.setdefault(
            'run_batch_size',
            min(self._hp.vpred_batch_size, self._hp.num_samples))
        predictor_hparams.setdefault('ncam', ag_params.get('ncam', 1))
        predictor_hparams.setdefault(
            'img_dims', (ag_params['image_height'], ag_params['image_width']))
        predictor_hparams.setdefault('adim', ag_params['adim'])
        predictor_hparams.setdefault('sdim', ag_params['sdim'])
        predictor_hparams.setdefault('sequence_length', self._hp.T + 2)

        self.predictor = self._hp.predictor_class(
            self._hp.model_path, predictor_hparams, n_gpus=ngpu,
            first_gpu=gpu_id)
        self.predictor.restore()

        self._net_context = self.predictor.n_context
        if self._hp.start_planning < self._net_context - 1:
            self._hp.start_planning = self._net_context - 1

        self._n_desig = self._hp.designated_pixel_count
        self._img_height = ag_params['image_height']
        self._img_width = ag_params['image_width']
        self._n_cam = self.predictor.n_cam

        self._desig_pix = None
        self._goal_pix = None
        self._images = None
        self._verbose_worker = None
        self._chosen_distrib = None

        self._fused = None
        self._fused_state = None
        self._rng = jax.random.PRNGKey(policyparams.get('seed', 0))
        if self._hp.use_fused_planner and self._fused_planner_supported():
            if self._hp.sampler in (GaussianCEMSampler, AutograspSampler,
                                    AutograspEpsilon):
                # AutograspSampler (explicit-gripper action spaces): the
                # Gaussian spec covers the base xyz/theta dims; the grip dim
                # is latched on device (planners/gaussian.py
                # autograsp_gripper_latch) — same single-dispatch program
                is_ag = self._hp.sampler is AutograspSampler
                spec = make_action_spec(
                    self._hp.values(),
                    self._adim - 1 if is_ag else self._adim)
                assert spec.nactions * spec.repeat == self._hp.T, \
                    'T must equal nactions*repeat'
                # an action_order listing 'grasp' would make make_action_spec
                # ignore the base-dim count and sample the grip dim the latch
                # is about to derive — reject rather than plan (adim+1) dims
                assert spec.adim == (self._adim - 1 if is_ag else self._adim), \
                    ('action_order yields a {}-dim spec but the fused '
                     '{} path needs {} sampled dims'.format(
                         spec.adim, 'autograsp' if is_ag else 'gaussian',
                         self._adim - 1 if is_ag else self._adim))
                ag_cfg = None
                if is_ag:
                    ag_cfg = {
                        'z_thresh': self._hp.z_thresh,
                        'norm_factor': self._hp.action_norm_factor,
                        'close_cmd': self._hp.gripper_close_cmd,
                        'open_cmd': self._hp.gripper_open_cmd,
                        'reopen': self._hp.reopen,
                        'deviation_prob': self._hp.deviation_prob,
                        'no_refit': self._hp.no_refit,
                    }
                ag_eps_cfg = None
                if self._hp.sampler is AutograspEpsilon:
                    # epsilon-greedy gripper exploration over the FULL-dim
                    # (explicit-gripper) space: dims from action_order as in
                    # the host sampler's ctor
                    z_dim, grip_dim = 2, self._adim - 1
                    if self._hp.action_order is not None:
                        for i, a in enumerate(self._hp.action_order):
                            if a == 'grasp':
                                grip_dim = i
                            elif a == 'z':
                                z_dim = i
                    ag_eps_cfg = {
                        'z_dim': z_dim, 'grip_dim': grip_dim,
                        'z_norm': self._hp.z_norm,
                        'zthresh': self._hp.ag_zthresh,
                        'epsilon': self._hp.ag_epsilon,
                        'base_frac': self._hp.base_frac,
                        'base_frac_reduce': self._hp.base_frac_reduce,
                        'repeat': spec.repeat,
                        'state_z_index': z_dim,
                    }
                # stochastic_planning=(K,): the host sampler expands the
                # batch to num_samples*K copies (K latents per unique plan)
                stoch_k = int(self._hp.get('stochastic_planning', None)[0]) \
                    if self._hp.get('stochastic_planning', None) else 1
                self._fused = FusedCEMPlanner(
                    self.predictor.model, spec,
                    self._hp.num_samples * stoch_k,
                    iterations=self._hp.iterations, k_elite=self.elite_count,
                    finalweight=self._hp.finalweight,
                    rejection_rounds=10 if self._hp.rejection_sampling else 0,
                    action_bound=self._hp.action_bound,
                    only_first_view=self._hp.only_take_first_view,
                    blockdiag_refit=self._hp.cov_blockdiag,
                    smooth_cov=self._hp.smooth_cov,
                    add_zero_action=self._hp.add_zero_action,
                    autograsp=ag_cfg, stochastic_k=stoch_k,
                    discrete_dims=tuple(self._hp.get('discrete_ind', None)
                                        or ()),
                    ag_epsilon=ag_eps_cfg,
                    sample_chunk=self._hp.sample_chunk,
                    stochastic_penalty=self._hp.stochastic_penalty)
            elif self._hp.sampler is FoldingCEMSampler:
                # structured folding prior: phase means/waypoints and the
                # Gaussian remainder all sample on device; refit is the
                # plain elite mean/cov (host twin semantics)
                spec = make_action_spec(self._hp.values(), self._adim)
                assert spec.adim == 4, \
                    'folding prior requires 4 base action dims'
                assert spec.nactions * spec.repeat == self._hp.T, \
                    'T must equal nactions*repeat'
                self._fused = FusedCEMPlanner(
                    self.predictor.model, spec, self._hp.num_samples,
                    iterations=self._hp.iterations, k_elite=self.elite_count,
                    finalweight=self._hp.finalweight,
                    action_bound=False,
                    only_first_view=self._hp.only_take_first_view,
                    folding={'split_frac': self._hp.split_frac,
                             'max_shift': tuple(self._hp.max_shift)})
            elif self._hp.sampler is CorrelatedNoiseSampler:
                # fused MPPI: AR(1) noise + soft elite-weighted mean update
                # run as the same single-dispatch device program
                stds = tuple(float(s) for s in self._hp.initial_std)
                spec = ActionSpec(
                    adim=len(stds), nactions=self._hp.nactions, repeat=1,
                    per_dim_std=stds, clip_dims_xy=(), clip_dims_rot=(),
                    rej_dims_xy=(), rej_dims_lift=(), xy_std=stds[0],
                    lift_std=stds[2] if len(stds) > 2 else stds[0])
                assert spec.nactions == self._hp.T, \
                    'CorrelatedNoise plans at control cadence: nactions == T'
                self._fused = FusedCEMPlanner(
                    self.predictor.model, spec, self._hp.num_samples,
                    iterations=self._hp.iterations, k_elite=self.elite_count,
                    finalweight=self._hp.finalweight,
                    only_first_view=self._hp.only_take_first_view,
                    mppi={'kappa': self._hp.kappa,
                          'beta_0': self._hp.beta_0,
                          'beta_1': self._hp.beta_1,
                          'refit_cov': self._hp.refit_cov,
                          'mean_bias': self._hp.mean_bias,
                          'per_dim_std': stds})

    # every reference sampler hparam now runs fused (warm starts, covariance
    # smoothing/shrinking, zero-action, MPPI, autograsp latch,
    # stochastic_planning K-copies, discrete_ind floor-clip); the dict stays
    # as the hook for future host-only hparams
    _FUSED_UNSUPPORTED = {}

    def _fused_planner_supported(self):
        offending = [k for k, default in self._FUSED_UNSUPPORTED.items()
                     if self._hp.get(k, default) != default]
        if offending:
            self._logger.log(
                'fused planner disabled: sampler hparams {} are only honored '
                'by the host CEM loop'.format(offending))
            return False
        return True

    def _default_hparams(self):
        default_dict = {
            'predictor_class': TPUPredictor,
            'predictor_hparams': None,
            'model_path': '',
            'vpred_batch_size': 200,
            'designated_pixel_count': 1,
            'verbose_img_height': 128,
            'predictor_propagation': False,
            'only_take_first_view': False,
            'state_append': None,
            'finalweight': 10.,
            'use_fused_planner': True,
            'seed': 0,
        }
        parent_params = super()._default_hparams()
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def reset(self):
        super().reset()
        self._chosen_distrib = None
        self._fused_state = None

    # ------------------------------------------------------------------ fused path
    def _cost_grids(self):
        """Per-(cam, desig) distance grids for the fused cost.  Subclasses
        that weight designated pixels (e.g. registration warp-error
        tradeoffs) scale the grids here — the expected-distance cost is
        linear in the grid, so pre-scaling IS the weighted cost."""
        return cost_lib.distance_grid(
            self._goal_pix.reshape(self._n_cam, self._n_desig, 2),
            self._img_height, self._img_width)

    def _fused_sampling_state(self, chosen):
        """(mean, sigma, num_samples, anchor, anchor_valid) for this replan.

        Mirrors the host GaussianCEMSampler's warm-start semantics
        (reference ``samplers/gaussian_sampler.py:14-44``): with
        ``reuse_cov`` the previous replan's refit covariance is shifted one
        action block forward; with ``reuse_mean`` the mean warm-starts from
        the best plan's remaining actions; either warm start shrinks the
        sample count by ``reuse_factor``.  MPPI mode instead supplies the
        last executed action as the AR(1) anchor."""
        hp = self._hp
        spec = self._fused.spec
        M = hp.num_samples
        # Gaussian/autograsp samplers only; MPPI hparams lack the key
        if hp.get('stochastic_planning', None):
            M *= int(hp.stochastic_planning[0])
        anchor = np.zeros(spec.adim, np.float32)
        anchor_valid = 0.0

        if self._fused.is_mppi:
            if hp.smooth_across_last_action and len(chosen):
                anchor = np.asarray(chosen[-1], np.float32)
                anchor_valid = 1.0
            return (initial_mean(spec), initial_sigma(spec), M,
                    anchor, anchor_valid)

        t = self._t
        warm_ok = t is not None and t >= spec.repeat - 1
        # .get: Folding hparams lack the Gaussian warm-start keys
        warm_cov = bool(hp.get('reuse_cov', 0)) and warm_ok and \
            self._fused_state is not None
        if warm_cov:
            sigma = shift_sigma(jnp.asarray(self._fused_state[1]), spec,
                                float(hp.reuse_cov))
        else:
            sigma = initial_sigma(
                spec, reduce_std_dev=hp.get('reduce_std_dev', 1.0),
                reduce=t is not None and t >= 2)

        warm_mean = False
        plans = self._sampler.best_action_plans
        if hp.get('reuse_mean', False) and warm_ok and plans and \
                plans[-1] is not None:
            plan = np.asarray(plans[-1][0])       # remaining control-cadence
            # autograsp mode: the trailing grip dim is derived, not sampled
            plan = plan[:, :spec.adim]
            short = plan.shape[0] % spec.repeat
            if short:
                plan = np.concatenate(
                    [plan, np.zeros((spec.repeat - short, spec.adim))], 0)
            per_block = plan.reshape(-1, spec.repeat, spec.adim)[:, 0]
            blocks = np.zeros((spec.nactions, spec.adim), np.float32)
            blocks[:per_block.shape[0]] = per_block[:spec.nactions]
            mean = jnp.asarray(blocks.ravel())
            warm_mean = True
        else:
            mean = initial_mean(spec)

        if warm_cov or warm_mean:
            M = max(int(M * hp.reuse_factor), self.elite_count)
            if hp.get('stochastic_planning', None):
                k = int(hp.stochastic_planning[0])
                M = ((M + k - 1) // k) * k   # keep K copies per unique plan
        return mean, sigma, M, anchor, anchor_valid

    def perform_CEM(self, state):
        if self._fused is None:
            return super().perform_CEM(state)

        self._logger.log('fused on-device CEM at t{}'.format(self._t))
        n_ctx = self._net_context

        # context tensors: (ncam, n_ctx, H, W, ...)
        frames = self._images[-n_ctx:].astype(np.float32) / 255.0
        frames_cam = np.swapaxes(frames, 0, 1)
        input_distrib = self._make_input_distrib(0)         # (n_ctx, ncam, H, W, P)
        distrib_cam = np.swapaxes(input_distrib, 0, 1)
        states = np.asarray(state[-n_ctx:], np.float32)

        chosen = self._sampler.chosen_actions
        if len(chosen) >= n_ctx - 1:
            ctx_actions = np.asarray(chosen[-(n_ctx - 1):], np.float32) \
                if n_ctx > 1 else np.zeros((0, self._adim), np.float32)
        else:
            ctx_actions = np.zeros((n_ctx - 1, self._adim), np.float32)

        grids = self._cost_grids()                          # (ncam, P, H, W)

        mean, sigma, num_samples, anchor, anchor_valid = \
            self._fused_sampling_state(chosen)

        self._rng, sub = jax.random.split(self._rng)
        result = self._fused.replan(
            self.predictor.params, sub, jnp.asarray(frames_cam),
            jnp.asarray(states), jnp.asarray(distrib_cam),
            jnp.asarray(ctx_actions), grids, mean, sigma,
            anchor=anchor, anchor_valid=anchor_valid,
            num_samples=num_samples)
        # refit distribution feeds the next replan's reuse_mean/reuse_cov
        self._fused_state = (np.asarray(result['mean']),
                             np.asarray(result['sigma']))

        self._best_actions = np.asarray(result['best_actions'])
        scores_per_itr = np.asarray(result['scores_per_itr'])
        for itr in range(scores_per_itr.shape[0]):
            self.plan_stat['scores_itr{}'.format(itr)] = scores_per_itr[itr]
        self._best_indices = np.argsort(scores_per_itr[-1])[:self.elite_count]

        if self._hp.predictor_propagation:
            # reuse the best predicted distribution as the next context:
            # gen_distribs[0] is (T', ncam, H, W, P) -> context (n_ctx, ncam, ...)
            best_distrib = np.asarray(result['vis']['gen_distribs'])[0]
            self._chosen_distrib = best_distrib[-n_ctx:]

        if self._verbose_condition(self._n_iter - 1):
            self._dump_verbose(result)

        self._t_since_replan = 0

    def _dump_verbose(self, result):
        if self._verbose_worker is None:
            return
        import matplotlib.cm as cm
        vis = result['vis']
        gen_images = np.asarray(vis['gen_images'])        # (nv,T',ncam,H,W,C)
        gen_distribs = np.asarray(vis['gen_distribs'])
        scores = np.asarray(vis['scores'])
        verbose_folder = 'planning_{}_itr_{}'.format(self._t, self._n_iter - 1)
        content_dict = OrderedDict()

        nv = gen_images.shape[0]
        for c in range(self._n_cam):
            name = 'cam_{}_start'.format(c)
            start_img = self._images[-1, c].copy()
            for p in range(self._n_desig):
                h, w = np.clip(self._desig_pix[c, p],
                               [0, 0], [self._img_height - 1,
                                        self._img_width - 1])
                start_img[int(h), int(w)] = [255, 0, 0]
                h, w = np.clip(self._goal_pix[c, p],
                               [0, 0], [self._img_height - 1,
                                        self._img_width - 1])
                start_img[int(h), int(w)] = [0, 0, 255]
            path = save_img(self._verbose_worker, verbose_folder, name,
                            start_img)
            content_dict[name] = [path for _ in range(nv)]

        for c in range(self._n_cam):
            for p in range(self._n_desig):
                rows = []
                for v in range(nv):
                    frames = []
                    for t in range(gen_distribs.shape[1]):
                        d = gen_distribs[v, t, c, :, :, p]
                        d = d / (d.max() + 1e-6)
                        frames.append(
                            (cm.viridis(d)[:, :, :3] * 255).astype(np.uint8))
                    rows.append(frames)
                name = 'cam_{}_desig_{}'.format(c, p)
                content_dict[name] = save_gifs(self._verbose_worker,
                                               verbose_folder, name, rows)

        for c in range(self._n_cam):
            rows = [(gen_images[v, :, c] * 255).astype(np.uint8)
                    for v in range(nv)]
            name = 'cam_{}_pred_images'.format(c)
            content_dict[name] = save_gifs(self._verbose_worker,
                                           verbose_folder, name, rows)

        content_dict['scores'] = scores
        html = fill_template(self._n_iter - 1, self._t, content_dict,
                             img_height=self._hp.verbose_img_height)
        save_html(self._verbose_worker,
                  '{}/plan.html'.format(verbose_folder), html)

    # ------------------------------------------------------------- host-loop path
    def evaluate_rollouts(self, actions, cem_itr):
        context = {
            'context_frames': self._images[-self._net_context:]
            .astype(np.float32)[None] / 255.0,
            'context_actions': self._sampler.chosen_actions,
            'context_pixel_distributions': self._make_input_distrib(cem_itr)[None],
            'context_states': np.asarray(
                self._state[-self._net_context:], np.float32)[None],
        }
        prediction_dict = self.predictor(context, {'actions': actions})
        gen_images = prediction_dict['predicted_frames']
        gen_distrib = prediction_dict['predicted_pixel_distributions']
        return self._eval_pixel_cost(cem_itr, gen_distrib, gen_images)

    def _eval_pixel_cost(self, cem_itr, gen_distrib, gen_images):
        grids = np.asarray(cost_lib.distance_grid(
            self._goal_pix.reshape(self._n_cam, self._n_desig, 2),
            self._img_height, self._img_width))
        scores = np.asarray(cost_lib.expected_pixel_distance(
            jnp.asarray(gen_distrib), jnp.asarray(grids),
            self._hp.finalweight, normalize=True,
            only_first_view=self._hp.only_take_first_view))

        if self._hp.predictor_propagation and cem_itr == self._hp.iterations - 1:
            bestind = scores.argsort()[0]
            self._chosen_distrib = gen_distrib[bestind][-self._net_context:]
        return scores

    # --------------------------------------------------------------------- helpers
    def _make_input_distrib(self, itr):
        if self._hp.predictor_propagation and self._chosen_distrib is not None:
            return self._chosen_distrib[-self._net_context:]
        return self._switch_on_pix(self._desig_pix)

    def _switch_on_pix(self, desig):
        """One-hot pixel distributions at the designated pixels
        (reference ``_switch_on_pix``, ``pixel_cost_controller.py:206-215``)."""
        one_hot = np.zeros((self._net_context, self._n_cam, self._img_height,
                            self._img_width, self._n_desig), dtype=np.float32)
        desig = np.clip(
            desig, np.zeros(2), np.array([self._img_height,
                                          self._img_width]) - 1).astype(np.int64)
        for icam in range(self._n_cam):
            for p in range(self._n_desig):
                one_hot[:, icam, desig[icam, p, 0], desig[icam, p, 1], p] = 1.0
        return one_hot

    def act(self, t=None, i_tr=None, desig_pix=None, goal_pix=None,
            images=None, state=None, verbose_worker=None):
        # multi-object scenes hand over pixels for EVERY object; the policy
        # plans for the first n_desig of them (reference ntask semantics)
        self._desig_pix = np.array(desig_pix).reshape(
            (self._n_cam, -1, 2))[:, :self._n_desig]
        self._goal_pix = np.array(goal_pix).reshape(
            (self._n_cam, -1, 2))[:, :self._n_desig]
        self._images = images
        self._verbose_worker = verbose_worker
        return super().act(t, i_tr, state)
