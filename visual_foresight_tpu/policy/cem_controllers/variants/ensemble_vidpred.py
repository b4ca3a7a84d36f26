"""Ensemble-disagreement CEM controller (reference ``variants/ensemble_vidpred.py``).

Each action plan is scored by ``num_ensembles`` predictor copies; cost = mean
+ lambda * variance across the ensemble.  Where the reference tiled action
blocks across the batch to fan out over TF towers, here the ensemble axis is a
``vmap`` over stacked parameter pytrees — one device program, perfectly batched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.planners.cem import FusedCEMPlanner
from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                    initial_sigma,
                                                    make_action_spec)
from ..pixel_cost_controller import PixelCostController
from ..samplers.gaussian_sampler import GaussianCEMSampler


class CEMControllerEnsembleVidPred(PixelCostController):
    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        super().__init__(ag_params, policyparams, gpu_id, ngpu)

        # stack per-ensemble params: leaves gain a leading ensemble axis.
        # Each member may come from its own checkpoint dir (model_path is a
        # list) or be jittered copies of one restore.
        n_ens = self._hp.num_ensembles
        member_params = []
        if isinstance(self._hp.model_path, (list, tuple)):
            assert len(self._hp.model_path) == n_ens
            for path in self._hp.model_path:
                p = self._hp.predictor_class(
                    path, {'ncam': self._n_cam,
                           'img_dims': (self._img_height, self._img_width),
                           'adim': self._adim, 'sdim': self._sdim,
                           'designated_pixel_count': self._n_desig,
                           'sequence_length': self._hp.T + 2})
                p.restore()
                member_params.append(p.params[0])
        else:
            for i in range(n_ens):
                member_params.append(
                    jax.tree.map(lambda x: x, self.predictor.params[0]))
        self._ens_params = jax.tree.map(
            lambda *xs: jnp.stack(xs), *member_params)

        model = self.predictor.model
        finalweight = self._hp.finalweight
        lam = self._hp.ensemble_var_lambda
        n_ctx = self.predictor.n_context

        def rollout_and_cost(params_stacked, images, states, distribs,
                             actions, rng, grids):
            def single(p):
                m = actions.shape[0]
                imgs = jnp.broadcast_to(images[0][None],
                                        (m,) + images[0].shape)
                dstr = jnp.broadcast_to(distribs[0][None],
                                        (m,) + distribs[0].shape)
                sts = jnp.broadcast_to(states[None], (m,) + states.shape)
                out = model.apply(p, imgs, actions, sts, dstr, rng=rng)
                gd = out['gen_distribs'][:, n_ctx - 1:][:, :, None]
                return cost_lib.expected_pixel_distance(gd, grids, finalweight)

            per_model = jax.vmap(single)(params_stacked)   # (E, M)
            return cost_lib.ensemble_cost(per_model, lam)

        self._ens_rollout_cost = jax.jit(rollout_and_cost)

    def _default_hparams(self):
        parent_params = super()._default_hparams()
        parent_params.add_hparam('num_ensembles', 3)
        parent_params.add_hparam('ensemble_var_lambda', 1.0)
        # unlike the parent, model_path may be a LIST of per-member
        # checkpoint dirs; clear the str-typed default so the typed
        # override check accepts either form
        parent_params.set_hparam('model_path', None)
        return parent_params

    def perform_CEM(self, state):
        """CEM loop with ensemble scoring: sampling/refit on device via the
        gaussian module, rollout+cost vmapped over ensemble members."""
        from visual_foresight_tpu.planners.gaussian import (fit_elites,
                                                            sample_actions)
        spec = make_action_spec(self._hp.values(), self._adim)
        n_ctx = self.predictor.n_context
        frames = self._images[-n_ctx:].astype(np.float32) / 255.0
        frames_cam = jnp.asarray(np.swapaxes(frames, 0, 1))
        distrib_cam = jnp.asarray(np.swapaxes(
            self._make_input_distrib(0), 0, 1))
        states = jnp.asarray(np.asarray(state[-n_ctx:], np.float32))
        chosen = self._sampler.chosen_actions
        ctx_actions = jnp.asarray(
            np.asarray(chosen[-(n_ctx - 1):], np.float32)
            if n_ctx > 1 and len(chosen) else
            np.zeros((n_ctx - 1, self._adim), np.float32))
        grids = cost_lib.distance_grid(
            self._goal_pix.reshape(self._n_cam, self._n_desig, 2),
            self._img_height, self._img_width)

        mean, sigma = initial_mean(spec), initial_sigma(spec)
        K = self.elite_count
        for itr in range(self._n_iter):
            self._rng, k1, k2 = jax.random.split(self._rng, 3)
            plan = sample_actions(k1, mean, sigma, spec, self._hp.num_samples,
                                  rejection_rounds=0,
                                  action_bound=self._hp.action_bound)
            m = plan.shape[0]
            full_actions = jnp.concatenate(
                [jnp.broadcast_to(ctx_actions[None], (m,) + ctx_actions.shape),
                 plan], axis=1)
            scores = self._ens_rollout_cost(
                self._ens_params, frames_cam, states, distrib_cam,
                full_actions, k2, grids)
            scores_np = np.asarray(scores)
            self.plan_stat['scores_itr{}'.format(itr)] = scores_np
            self._best_indices = scores_np.argsort()[:K]
            self._best_actions = np.asarray(plan)[self._best_indices]
            if itr < self._n_iter - 1:
                mean, sigma = fit_elites(
                    jnp.asarray(self._best_actions), spec)
        self._t_since_replan = 0
