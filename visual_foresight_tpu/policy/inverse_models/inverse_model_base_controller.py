"""Inverse-model (non-CEM) controller
(reference ``policy/inverse_models/inverse_model_base_controller.py``).

An inverse model maps (current image, goal image, context) -> an action
sequence; the controller replans every ``replan_every`` steps.  The reference
used an external RoboNet ``ActionInferenceInterface``; here the default
predictor is the native JAX inverse model below, and any object implementing
``predictor(current, goal, context_actions, context_frames) -> (1, T, adim)``
can be swapped in via ``predictor_class``.
"""

from typing import Any, Tuple

import numpy as np

from visual_foresight_tpu.policy.policy import Policy
from visual_foresight_tpu.utils.logger import Logger


def convert_to_float(x):
    assert x.dtype == np.uint8, 'expected uint8 input'
    return x.astype(np.float32) / 255.0


class JAXInverseModel:
    """Native inverse model: conv trunk over (current, goal, context frames)
    -> dense action-sequence head.  Restores orbax params from
    ``model_params_path``; random init (with warning) otherwise."""

    def __init__(self, model_params_path, hparams=None, n_gpus=1, first_gpu=0):
        import jax

        from visual_foresight_tpu.models.inverse import InverseNet

        hp = {'adim': 4, 'plan_T': 7, 'num_context': 2}
        hp.update(hparams or {})
        self._hp = hp

        self._net = InverseNet(hp['adim'], hp['plan_T'])
        self._path = model_params_path
        self._jax = jax
        self._params = None

    def restore(self):
        import jax
        import jax.numpy as jnp

        from visual_foresight_tpu.prediction import checkpoints
        h, w = self._hp.get('img_dims', (48, 64))
        template = self._net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, self._hp['num_context'], h, w, 3)))
        try:
            self._params = checkpoints.restore_params(str(self._path),
                                                      template=template)
        except (FileNotFoundError, TypeError):
            print('WARNING: no inverse-model checkpoint; random init')
            self._params = template
        self._apply = self._jax.jit(
            lambda p, c, g, cf: self._net.apply(p, c, g, cf))
        return self

    def __call__(self, current, goal, context_actions, context_frames):
        import jax.numpy as jnp
        out = self._apply(self._params, jnp.asarray(current[None]),
                          jnp.asarray(goal[None]),
                          jnp.asarray(context_frames))
        return np.asarray(out)


class InvModelBaseController(Policy):
    """Inverse model policy."""

    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        self._hp = self._default_hparams()
        self._override_defaults(policyparams)
        self.agentparams = ag_params

        if self._hp.logging_dir:
            self._logger = Logger(self._hp.logging_dir, 'invmodel_log.txt')
        else:
            self._logger = Logger(printout=True)
        self._logger.log('init inverse model controller')

        self._adim = self.agentparams['adim']
        self._sdim = self.agentparams['sdim']

        predictor_hparams = {'adim': self._adim, 'plan_T': self._hp.load_T,
                             'num_context': self._hp.num_context,
                             'img_dims': (ag_params['image_height'],
                                          ag_params['image_width'])}
        self.predictor = self._hp.predictor_class(
            self._hp.model_params_path, predictor_hparams, n_gpus=ngpu,
            first_gpu=gpu_id)
        self.predictor.restore()

        self.action_counter = 0
        self.actions = None
        self.context_actions = [None] * self._hp.num_context
        self.context_frames = [None] * self._hp.num_context

    def _default_hparams(self):
        default_dict = {
            'T': 15,
            'predictor_class': JAXInverseModel,
            'model_params_path': '',
            'model_restore_path': '',
            'logging_dir': '',
            'load_T': 7,
            'num_context': 2,
            'replan_every': 2,
            'context_action_weight': [1, 1, 1, 1],
            'initial_action_low': [-0.025, -0.025, -0.025, 0],
            'initial_action_high': [0.025, 0.025, 0.025, 0],
        }
        parent_params = super()._default_hparams()
        for k, v in default_dict.items():
            parent_params.add_hparam(k, v)
        return parent_params

    def reset(self):
        self.plan_stat = {}
        self.action_counter = 0
        self.actions = None
        self.context_actions = [None] * self._hp.num_context
        self.context_frames = [None] * self._hp.num_context

    def _sample_initial_action(self):
        return np.random.uniform(self._hp.initial_action_low,
                                 self._hp.initial_action_high)

    def act(self, t=None, i_tr=None, images=None, goal_image=None):
        if t < self._hp.num_context:
            action = self._sample_initial_action() * \
                np.asarray(self._hp.context_action_weight)[:self._adim]
        else:
            if (t - self._hp.num_context) % self._hp.replan_every == 0:
                float_ctx = [frame[None, None] for frame in self.context_frames]
                prepped_ctx_im = np.concatenate(float_ctx, axis=1)
                prepped_ctx_act = np.array(self.context_actions)[None]
                goal = goal_image[-1, 0]
                if goal.dtype == np.uint8:
                    goal = convert_to_float(goal)
                self.actions = self.predictor(
                    convert_to_float(images[-1, 0]), goal,
                    prepped_ctx_act, prepped_ctx_im)
                self.action_counter = 0
            assert self.actions.shape[1] > self.action_counter, \
                'ran past plan length — replan more often'
            action = self.actions[0, self.action_counter]
            self.action_counter += 1

        new_context_image = convert_to_float(np.copy(images[-1, 0]))
        self.update_context(new_context_image, action)
        return {'actions': action, 'plan_stat': self.plan_stat}

    def update_context(self, new_image, new_action):
        self.context_frames.append(new_image)
        self.context_actions.append(new_action)
        if len(self.context_frames) > self._hp.num_context:
            self.context_frames.pop(0)
            self.context_actions.pop(0)
