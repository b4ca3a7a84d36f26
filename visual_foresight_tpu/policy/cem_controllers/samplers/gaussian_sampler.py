"""Host-side Gaussian CEM sampler (reference ``samplers/gaussian_sampler.py``).

This is the numpy implementation used by the generic host CEM loop (for
exotic cost controllers); the fused on-device planner replicates the same math
in JAX (``planners/gaussian.py``) — unit tests pin the two to each other.
"""

import numpy as np

from visual_foresight_tpu.policy.utils.controller_utils import (
    construct_initial_sigma, discretize, make_blockdiagonal, reuse_cov,
    truncate_movement)
from .cem_sampler import CEMSampler


class GaussianCEMSampler(CEMSampler):
    def __init__(self, hp, adim, sdim, **kwargs):
        super().__init__(hp, adim, sdim, **kwargs)
        self._sigma, self._sigma_prev = None, None
        self._mean = None
        self._last_reduce = None

    def sample_initial_actions(self, t, nsamples, current_state):
        reduce_samp = False
        if not self._hp.reuse_cov or t < self._hp.repeat - 1 or self._sigma is None:
            self._sigma = construct_initial_sigma(self._hp, self._adim, t)
        else:
            reduce_samp = True
            self._sigma = reuse_cov(self._sigma, self._adim, self._hp)
        self._sigma_prev = self._sigma

        if not self._hp.reuse_mean or t < self._hp.repeat - 1 or self._mean is None:
            self._mean = np.zeros(self._adim * self._hp.nactions)
        else:
            assert self._best_action_plans[-1] is not None, \
                'cannot reuse mean without logged best actions'
            best_plan = self._best_action_plans[-1][0]
            n_extra = best_plan.shape[0] % self._hp.repeat
            if n_extra > 0:
                pad = np.zeros((self._hp.repeat - n_extra, self._adim))
                last_actions = np.concatenate((best_plan, pad), axis=0)
            else:
                last_actions = best_plan
            last_actions = last_actions.reshape(
                (-1, self._hp.repeat, self._adim))[:, 0, :]
            self._mean = np.zeros((self._hp.nactions, self._adim))
            self._mean[:last_actions.shape[0]] = last_actions
            self._mean = self._mean.flatten()
            reduce_samp = True

        self._last_reduce = reduce_samp
        return self._sample(nsamples, reduce_samp)

    def sample_next_actions(self, n_samples, best_actions, scores):
        self._fit_gaussians(best_actions)
        return self._sample(n_samples, self._last_reduce)

    @staticmethod
    def get_default_hparams():
        return {
            'action_order': None,
            'initial_std': 0.05,
            'initial_std_lift': 0.15,
            'initial_std_rot': np.pi / 18,
            'initial_std_grasp': 2,
            'discrete_ind': None,
            'reuse_mean': False,
            'reduce_std_dev': 1.,
            'reuse_cov': False,
            'rejection_sampling': True,
            'cov_blockdiag': False,
            'smooth_cov': False,
            'nactions': 5,
            'repeat': 3,
            'add_zero_action': False,
            'action_bound': True,
            'reuse_factor': 0.5,
            'stochastic_planning': None,
        }

    # -- internals --------------------------------------------------------------
    def _sample(self, M, reduce_samp):
        if reduce_samp:
            M = max(int(M * self._hp.reuse_factor), 1)
        if self._hp.rejection_sampling:
            return self._sample_actions_rej(M)
        return self._sample_actions(M)

    def _sample_actions(self, M):
        actions = np.random.multivariate_normal(self._mean, self._sigma, M)
        actions = actions.reshape(M, self._hp.nactions, self._adim)
        if self._hp.discrete_ind is not None:
            actions = discretize(actions, M, self._hp.nactions,
                                 self._hp.discrete_ind)
        if self._hp.action_bound:
            actions = truncate_movement(actions, self._hp)
        actions = np.repeat(actions, self._hp.repeat, axis=1)
        if self._hp.add_zero_action:
            actions[0] = 0
        return actions

    def _fit_gaussians(self, actions):
        actions = actions.reshape(-1, self._hp.nactions, self._hp.repeat,
                                  self._adim)
        actions = actions[:, :, -1, :]  # one action per repeat block
        flat = actions.reshape(-1, self._hp.nactions * self._adim)
        self._sigma = np.cov(flat, rowvar=False, bias=False)
        if self._hp.cov_blockdiag:
            self._sigma = make_blockdiagonal(self._sigma, self._hp.nactions,
                                             self._adim)
        if self._hp.smooth_cov:
            self._sigma = 0.5 * self._sigma + 0.5 * self._sigma_prev
            self._sigma_prev = self._sigma
        self._mean = np.mean(flat, axis=0)

    def _sample_actions_rej(self, M, max_rounds=1000):
        """Rejection sampling within 1.5 sigma bounds on xy/lift dims; bounded
        (the reference's loop at ``gaussian_sampler.py:109-150`` is unbounded)."""
        std_fac = 1.5
        xy_lim = std_fac * self._hp.initial_std
        lift_lim = std_fac * self._hp.initial_std_lift

        kept = []
        rounds = 0
        while len(kept) < M and rounds < max_rounds:
            rounds += 1
            need = M - len(kept)
            cand = np.random.multivariate_normal(self._mean, self._sigma,
                                                 need)
            cand = cand.reshape(need, self._hp.nactions, self._adim)
            ok = (np.all(np.abs(cand[:, :, :2]) <= xy_lim, axis=(1, 2)))
            if self._adim > 2:
                ok &= np.all(np.abs(cand[:, :, 2]) <= lift_lim, axis=1)
            kept.extend(cand[ok])
        if len(kept) < M:  # clip stragglers rather than looping forever
            need = M - len(kept)
            cand = np.random.multivariate_normal(self._mean, self._sigma,
                                                 need)
            cand = cand.reshape(need, self._hp.nactions, self._adim)
            cand[:, :, :2] = np.clip(cand[:, :, :2], -xy_lim, xy_lim)
            if self._adim > 2:
                cand[:, :, 2] = np.clip(cand[:, :, 2], -lift_lim, lift_lim)
            kept.extend(cand)
        actions = np.stack(kept[:M], axis=0)

        if self._hp.stochastic_planning:
            actions = np.repeat(actions, self._hp.stochastic_planning[0], 0)
        if self._hp.discrete_ind is not None:
            actions = discretize(actions, M, self._hp.nactions,
                                 self._hp.discrete_ind)
        return np.repeat(actions, self._hp.repeat, axis=1)
