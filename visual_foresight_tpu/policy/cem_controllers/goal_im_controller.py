"""Goal-image CEM controller (reference ``goal_im_controller.py``).

Cost = MSE between the final predicted frame(s) and a goal image; otherwise
the same fused on-device CEM machinery as the pixel-cost controller.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.planners.cem import FusedCEMPlanner
from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                    initial_sigma,
                                                    make_action_spec)
from visual_foresight_tpu.prediction.predictor import TPUPredictor
from .cem_base_controller import CEMBaseController
from .samplers.gaussian_sampler import GaussianCEMSampler
from .visualizer.construct_html import (fill_template, save_gifs, save_html,
                                        save_img)


class GoalImController(CEMBaseController):
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
            self._hp.model_path, predictor_hparams, n_gpus=ngpu,
            first_gpu=gpu_id)
        self.predictor.restore()

        self._net_context = self.predictor.n_context
        if self._hp.start_planning < self._net_context - 1:
            self._hp.start_planning = self._net_context - 1

        self._img_height = ag_params['image_height']
        self._img_width = ag_params['image_width']
        self._n_cam = self.predictor.n_cam
        self._images = None
        self._goal_image = None
        self._verbose_worker = None
        self._rng = jax.random.PRNGKey(policyparams.get('seed', 0))

        self._fused = None
        if self._hp.use_fused_planner and \
                self._hp.sampler is GaussianCEMSampler:
            spec = make_action_spec(self._hp.values(), self._adim)
            assert spec.nactions * spec.repeat == self._hp.T

            final_frames = self._hp.final_frames

            def goal_cost(gen_images, gen_distribs, goal_image):
                return cost_lib.goal_image_mse(gen_images, goal_image,
                                               final_frames=final_frames)

            self._fused = FusedCEMPlanner(
                self.predictor.model, spec, self._hp.num_samples,
                iterations=self._hp.iterations, k_elite=self.elite_count,
                rejection_rounds=10 if self._hp.rejection_sampling else 0,
                action_bound=self._hp.action_bound, cost_fn=goal_cost,
                sample_chunk=self._hp.sample_chunk)

    def _default_hparams(self):
        default_dict = {
            'predictor_class': TPUPredictor,
            'predictor_hparams': None,
            'model_path': '',
            'vpred_batch_size': 200,
            'final_frames': 1,          # how many tail frames enter the MSE
            'verbose_img_height': 128,
            'state_append': None,
            'use_fused_planner': True,
            'seed': 0,
        }
        parent_params = super()._default_hparams()
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def perform_CEM(self, state):
        if self._fused is None:
            return super().perform_CEM(state)
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

        goal = np.asarray(self._goal_image, np.float32)
        if goal.ndim == 5:          # (1, ncam, H, W, 3)
            goal = goal[-1]

        spec = self._fused.spec
        self._rng, sub = jax.random.split(self._rng)
        result = self._fused.replan(
            self.predictor.params, sub, jnp.asarray(frames_cam),
            jnp.asarray(states), jnp.asarray(distrib_cam),
            jnp.asarray(ctx_actions), jnp.asarray(goal),
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
            for c in range(self._n_cam):
                content['goal_cam{}'.format(c)] = [save_img(
                    self._verbose_worker, folder, 'goal_cam{}'.format(c),
                    (goal[c] * 255).astype(np.uint8))]
                rows = [(gen_images[v, :, c] * 255).astype(np.uint8)
                        for v in range(gen_images.shape[0])]
                content['cam_{}_pred'.format(c)] = save_gifs(
                    self._verbose_worker, folder, 'cam_{}_pred'.format(c), rows)
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
        gen_images = pred['predicted_frames']
        goal = np.asarray(self._goal_image, np.float32)
        if goal.ndim == 5:
            goal = goal[-1]
        return np.asarray(cost_lib.goal_image_mse(
            jnp.asarray(gen_images), jnp.asarray(goal),
            final_frames=self._hp.final_frames))

    def act(self, t=None, i_tr=None, images=None, goal_image=None, state=None,
            verbose_worker=None):
        self._images = images
        self._goal_image = goal_image
        self._verbose_worker = verbose_worker
        return super().act(t, i_tr, state)
