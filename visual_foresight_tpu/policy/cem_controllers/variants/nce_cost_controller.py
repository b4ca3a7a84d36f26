"""NCE-embedding cost controller (reference ``variants/nce_cost_controller.py``).

Cost = negative dot product between the (L2-normalized) embedding of the final
predicted frame and the goal-image embedding; the embedding net runs inside the
fused device program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.models.classifier import NCEEmbedding
from visual_foresight_tpu.planners.cem import FusedCEMPlanner
from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                    initial_sigma,
                                                    make_action_spec)
from visual_foresight_tpu.prediction import checkpoints
from .classifier_controller import ClassifierController
from ..samplers.gaussian_sampler import GaussianCEMSampler


class NCECostController(ClassifierController):
    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        super().__init__(ag_params, policyparams, gpu_id, ngpu)

        self.embedding = NCEEmbedding()
        self.embedding_params = self._restore_embedding()

        self._fused = None
        if self._hp.use_fused_planner and \
                self._hp.sampler is GaussianCEMSampler:
            spec = make_action_spec(self._hp.values(), self._adim)
            embedding = self.embedding
            final_frames = self._hp.final_frames

            def nce_cost(gen_images, gen_distribs, ctx):
                emb_params, goal_emb = ctx
                tail = gen_images[:, -final_frames:, 0]
                b, tt = tail.shape[:2]
                flat = tail.reshape((b * tt,) + tail.shape[2:])
                emb = embedding.apply(emb_params, flat).reshape(b, tt, -1)
                sim = jnp.einsum('btd,d->bt', emb, goal_emb)
                return -jnp.mean(sim, axis=1)

            self._fused = FusedCEMPlanner(
                self.predictor.model, spec, self._hp.num_samples,
                iterations=self._hp.iterations, k_elite=self.elite_count,
                rejection_rounds=10 if self._hp.rejection_sampling else 0,
                action_bound=self._hp.action_bound, cost_fn=nce_cost,
                sample_chunk=self._hp.sample_chunk)

    def _restore_embedding(self):
        template = self.embedding.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self._img_height, self._img_width, 3)))
        if self._hp.embedding_path:
            try:
                return checkpoints.restore_params(self._hp.embedding_path,
                                                  template=template)
            except FileNotFoundError:
                print('WARNING: no embedding checkpoint at {}; random init'
                      .format(self._hp.embedding_path))
        return template

    def _default_hparams(self):
        parent_params = super()._default_hparams()
        parent_params.add_hparam('embedding_path', '')
        return parent_params

    def perform_CEM(self, state):
        if self._fused is None:
            return super(ClassifierController, self).perform_CEM(state)
        frames_cam, states, distrib_cam, ctx_actions = \
            self._context_tensors(state)
        goal_emb = self.embedding.apply(
            self.embedding_params,
            jnp.asarray(self._goal_tensor())[None])[0]
        spec = self._fused.spec
        self._rng, sub = jax.random.split(self._rng)
        result = self._fused.replan(
            self.predictor.params, sub, jnp.asarray(frames_cam),
            jnp.asarray(states), jnp.asarray(distrib_cam),
            jnp.asarray(ctx_actions), (self.embedding_params, goal_emb),
            initial_mean(spec), initial_sigma(spec))
        self._best_actions = np.asarray(result['best_actions'])
        scores_per_itr = np.asarray(result['scores_per_itr'])
        for itr in range(scores_per_itr.shape[0]):
            self.plan_stat['scores_itr{}'.format(itr)] = scores_per_itr[itr]
        self._best_indices = np.argsort(scores_per_itr[-1])[:self.elite_count]
        self._t_since_replan = 0

    def evaluate_rollouts(self, actions, cem_itr):
        n_ctx = self._net_context
        context = {
            'context_frames': self._images[-n_ctx:].astype(np.float32)[None]
            / 255.0,
            'context_actions': self._sampler.chosen_actions,
            'context_pixel_distributions': np.zeros(
                (1, n_ctx, self._n_cam, self._img_height, self._img_width, 1),
                np.float32),
            'context_states': np.asarray(self._state[-n_ctx:],
                                         np.float32)[None],
        }
        pred = self.predictor(context, {'actions': actions})
        tail = jnp.asarray(
            pred['predicted_frames'][:, -self._hp.final_frames:, 0])
        b, tt = tail.shape[:2]
        flat = tail.reshape((b * tt,) + tail.shape[2:])
        emb = self.embedding.apply(self.embedding_params, flat).reshape(
            b, tt, -1)
        goal_emb = self.embedding.apply(
            self.embedding_params, jnp.asarray(self._goal_tensor())[None])[0]
        sim = jnp.einsum('btd,d->bt', emb, goal_emb)
        return np.asarray(-jnp.mean(sim, axis=1))
