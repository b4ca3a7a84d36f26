"""Classifier-cost CEM controller (reference ``variants/classifier_controller.py``).

Scores the final predicted frame(s) with a success classifier; cost =
-log p(success).  The classifier runs inside the fused CEM program (the
reference pinned it to the last GPU; here it is just more fused device work).
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.models.classifier import SuccessClassifier
from visual_foresight_tpu.planners.cem import FusedCEMPlanner
from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                    initial_sigma,
                                                    make_action_spec)
from visual_foresight_tpu.prediction import checkpoints
from visual_foresight_tpu.prediction.predictor import TPUPredictor
from ..cem_base_controller import CEMBaseController
from ..samplers.gaussian_sampler import GaussianCEMSampler
from ..visualizer.construct_html import (fill_template, save_gifs, save_html,
                                         save_img)


class ClassifierController(CEMBaseController):
    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        CEMBaseController.__init__(self, ag_params, policyparams)

        predictor_hparams = dict(self._hp.predictor_hparams or {})
        predictor_hparams.setdefault('designated_pixel_count', 1)
        predictor_hparams.setdefault('ncam', ag_params.get('ncam', 1))
        predictor_hparams.setdefault(
            'img_dims', (ag_params['image_height'], ag_params['image_width']))
        predictor_hparams.setdefault('adim', ag_params['adim'])
        predictor_hparams.setdefault('sdim', ag_params['sdim'])
        predictor_hparams.setdefault('sequence_length', self._hp.T + 2)
        self.predictor = self._hp.predictor_class(
            self._hp.model_path, predictor_hparams)
        self.predictor.restore()

        self._net_context = self.predictor.n_context
        if self._hp.start_planning < self._net_context - 1:
            self._hp.start_planning = self._net_context - 1

        self._img_height = ag_params['image_height']
        self._img_width = ag_params['image_width']
        self._n_cam = self.predictor.n_cam
        self._images, self._goal_image = None, None
        self._verbose_worker = None
        self._rng = jax.random.PRNGKey(policyparams.get('seed', 0))

        # classifier (per-camera params allowed; camera 0 by default)
        self.classifier = SuccessClassifier()
        self.classifier_params = self._restore_classifier()

        self._fused = None
        if self._hp.use_fused_planner and \
                self._hp.sampler is GaussianCEMSampler:
            spec = make_action_spec(self._hp.values(), self._adim)
            assert spec.nactions * spec.repeat == self._hp.T
            classifier = self.classifier
            final_frames = self._hp.final_frames
            goal_conditioned = self._hp.goal_conditioned

            def classifier_cost(gen_images, gen_distribs, ctx):
                clf_params, goal = ctx
                tail = gen_images[:, -final_frames:, 0]  # cam 0
                b, tt = tail.shape[:2]
                flat = tail.reshape((b * tt,) + tail.shape[2:])
                if goal_conditioned:
                    g = jnp.broadcast_to(goal[None], flat.shape)
                    logits = classifier.apply(clf_params, flat, g)
                else:
                    logits = classifier.apply(clf_params, flat)
                logp = jax.nn.log_sigmoid(logits).reshape(b, tt)
                return -jnp.mean(logp, axis=1)

            self._fused = FusedCEMPlanner(
                self.predictor.model, spec, self._hp.num_samples,
                iterations=self._hp.iterations, k_elite=self.elite_count,
                rejection_rounds=10 if self._hp.rejection_sampling else 0,
                action_bound=self._hp.action_bound, cost_fn=classifier_cost,
                sample_chunk=self._hp.sample_chunk)

    def _restore_classifier(self):
        template = self.classifier.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self._img_height, self._img_width, 3)),
            jnp.zeros((1, self._img_height, self._img_width, 3))
            if self._hp.goal_conditioned else None)
        if self._hp.classifier_path:
            try:
                return checkpoints.restore_params(self._hp.classifier_path,
                                                  template=template)
            except FileNotFoundError:
                print('WARNING: no classifier checkpoint at {}; random init'
                      .format(self._hp.classifier_path))
        return template

    def _default_hparams(self):
        default_dict = {
            'predictor_class': TPUPredictor,
            'predictor_hparams': None,
            'model_path': '',
            'classifier_path': '',
            'goal_conditioned': True,
            'final_frames': 1,
            'vpred_batch_size': 200,
            'verbose_img_height': 128,
            'use_fused_planner': True,
            'seed': 0,
        }
        parent_params = super()._default_hparams()
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def _context_tensors(self, state):
        n_ctx = self._net_context
        frames = self._images[-n_ctx:].astype(np.float32) / 255.0
        frames_cam = np.swapaxes(frames, 0, 1)
        distrib_cam = np.zeros(
            (self._n_cam, n_ctx, self._img_height, self._img_width, 1),
            np.float32)
        states = np.asarray(state[-n_ctx:], np.float32)
        chosen = self._sampler.chosen_actions
        ctx_actions = np.asarray(chosen[-(n_ctx - 1):], np.float32) \
            if n_ctx > 1 and len(chosen) else \
            np.zeros((n_ctx - 1, self._adim), np.float32)
        return frames_cam, states, distrib_cam, ctx_actions

    def _goal_tensor(self):
        goal = np.asarray(self._goal_image, np.float32) \
            if self._goal_image is not None else \
            np.zeros((self._n_cam, self._img_height, self._img_width, 3),
                     np.float32)
        if goal.ndim == 5:
            goal = goal[-1]
        return goal[0]  # camera 0

    def perform_CEM(self, state):
        if self._fused is None:
            return super().perform_CEM(state)
        frames_cam, states, distrib_cam, ctx_actions = \
            self._context_tensors(state)
        spec = self._fused.spec
        self._rng, sub = jax.random.split(self._rng)
        result = self._fused.replan(
            self.predictor.params, sub, jnp.asarray(frames_cam),
            jnp.asarray(states), jnp.asarray(distrib_cam),
            jnp.asarray(ctx_actions),
            (self.classifier_params, jnp.asarray(self._goal_tensor())),
            initial_mean(spec), initial_sigma(spec))

        self._best_actions = np.asarray(result['best_actions'])
        scores_per_itr = np.asarray(result['scores_per_itr'])
        for itr in range(scores_per_itr.shape[0]):
            self.plan_stat['scores_itr{}'.format(itr)] = scores_per_itr[itr]
        self._best_indices = np.argsort(scores_per_itr[-1])[:self.elite_count]

        if self._verbose_condition(self._n_iter - 1) and \
                self._verbose_worker is not None:
            vis = result['vis']
            gen_images = np.asarray(vis['gen_images'])
            folder = 'planning_{}_itr_{}'.format(self._t, self._n_iter - 1)
            content = OrderedDict()
            rows = [(gen_images[v, :, 0] * 255).astype(np.uint8)
                    for v in range(gen_images.shape[0])]
            content['pred'] = save_gifs(self._verbose_worker, folder, 'pred',
                                        rows)
            content['scores'] = np.asarray(vis['scores'])
            save_html(self._verbose_worker, '{}/plan.html'.format(folder),
                      fill_template(self._n_iter - 1, self._t, content))
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
        tail = jnp.asarray(pred['predicted_frames'][:, -self._hp.final_frames:, 0])
        b, tt = tail.shape[:2]
        flat = tail.reshape((b * tt,) + tail.shape[2:])
        if self._hp.goal_conditioned:
            g = jnp.broadcast_to(jnp.asarray(self._goal_tensor())[None],
                                 flat.shape)
            logits = self.classifier.apply(self.classifier_params, flat, g)
        else:
            logits = self.classifier.apply(self.classifier_params, flat)
        logp = jax.nn.log_sigmoid(logits).reshape(b, tt)
        return np.asarray(-jnp.mean(logp, axis=1))

    def act(self, t=None, i_tr=None, images=None, goal_image=None, state=None,
            verbose_worker=None):
        self._images = images
        self._goal_image = goal_image
        self._verbose_worker = verbose_worker
        return super().act(t, i_tr, state)
