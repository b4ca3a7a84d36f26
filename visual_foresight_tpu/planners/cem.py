"""Fully fused on-device CEM replanning.

The reference's replan loop crosses host<->device 3x(ceil(M/batch)) times and
does sampling, cost math, elite selection, and refit in numpy
(``cem_base_controller.py:85-116``, ``pred_util.py:21-48``,
``pixel_cost_controller.py:135-187``).  Here the WHOLE box — Gaussian sampling
(device PRNG), predictor rollout (``nn.scan`` over the horizon, sample batch in
one program), pixel cost, ``lax.top_k`` elite selection and mean/cov refit —
compiles into a single XLA program.  Zero host round trips per replan; the CEM
iteration loop is unrolled (iterations=3 is static).

Multi-chip: the sample axis shards over a ``jax.sharding.Mesh`` — see
``parallel/mesh.py``; scores all-gather over ICI (KB-scale), exactly the layout
SURVEY.md §5.8 prescribes.
"""

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.planners.gaussian import (
    ActionSpec, ag_epsilon_transform, autograsp_gripper_latch,
    autograsp_gripper_resample, fit_elites, folding_sample, sample_actions)


class FusedCEMPlanner:
    """Compiles and runs the fused replan program.

    :param model: a CDNAPredictor-like flax module (shared across cameras)
    :param spec: ActionSpec (static sampling description)
    :param num_samples: M candidates per CEM iteration
    :param iterations: CEM iterations (statically unrolled)
    :param k_elite: elite count for the refit
    :param finalweight: last-step weight in the pixel cost
    :param rejection_rounds: bounded rejection-resample rounds (0 = off)
    :param action_bound: clip xy/theta after sampling
    :param cost_fn: optional override mapping (gen_images, gen_distribs,
        cost_ctx) -> (M,) scores; defaults to expected pixel distance with
        cost_ctx = the (ncam, P, H, W) goal distance grids
    :param n_vis: how many elite rollouts to return for visualization
    """

    def __init__(self, model, spec: ActionSpec, num_samples: int,
                 iterations: int = 3, k_elite: int = 10,
                 finalweight: float = 10.0, rejection_rounds: int = 0,
                 action_bound: bool = True, only_first_view: bool = False,
                 cost_fn=None, n_vis: int = 10, blockdiag_refit: bool = False,
                 donate_dist: bool = True, mesh=None,
                 smooth_cov: bool = False, add_zero_action: bool = False,
                 mppi: Optional[dict] = None,
                 autograsp: Optional[dict] = None,
                 stochastic_k: int = 1,
                 discrete_dims: Sequence[int] = (),
                 ag_epsilon: Optional[dict] = None,
                 folding: Optional[dict] = None,
                 sample_chunk: int = 0,
                 stochastic_penalty: float = 0.0):
        self._model = model
        self._spec = spec
        self._M = num_samples
        self._iterations = iterations
        self._K = k_elite
        self._finalweight = finalweight
        self._rej = rejection_rounds
        self._bound = action_bound
        self._ofv = only_first_view
        self._cost_fn = cost_fn
        self._n_vis = min(n_vis, num_samples)
        self._blockdiag = blockdiag_refit
        self._smooth_cov = smooth_cov
        self._add_zero = add_zero_action
        # MPPI mode (CorrelatedNoiseSampler semantics,
        # reference samplers/correlated_noise.py:17-66): AR(1)-smoothed noise
        # around a soft elite-weighted mean plan instead of Gaussian refit.
        # Keys: kappa, beta_0, beta_1, refit_cov, mean_bias, per_dim_std.
        self._mppi = dict(mppi) if mppi else None
        # Autograsp mode (AutograspSampler semantics for explicit-gripper
        # action spaces): the spec covers the base xyz/theta dims; the grip
        # command is derived on device from the cumulative-z latch and
        # appended as the trailing plan dim.  Keys: z_thresh, norm_factor,
        # close_cmd, open_cmd, reopen, deviation_prob, no_refit,
        # z_index (plan z dim), state_z_index (z in the state vector).
        self._ag = dict(autograsp) if autograsp else None
        assert not (self._ag and self._mppi), \
            'autograsp latch composes with Gaussian sampling, not MPPI'
        # stochastic_planning=(K,) semantics (reference
        # gaussian_sampler.py:140-141): every unique plan appears K times in
        # the batch; with a stochastic predictor each copy draws its own
        # prior latent, so elites favor plans that score well across latents
        self._stoch_k = int(stochastic_k)
        assert self._stoch_k >= 1 and num_samples % self._stoch_k == 0, \
            'num_samples must be a multiple of stochastic_k'
        # Latent-dispersion penalty (round-5 hard-set lever, docs/EVAL.md):
        # with stochastic_k copies per unique plan, aggregate the K per-latent
        # costs into  mean + lambda * std  per unique plan before elite
        # selection.  The reference's stochastic_planning lets individually
        # optimistic (plan, latent) rows win top-k; the penalty makes plans
        # whose predicted OUTCOME disperses across latents — the signature of
        # predictor optimism — lose to plans that succeed under every latent.
        # 0.0 = reference semantics (per-row top-k).
        self._stoch_penalty = float(stochastic_penalty)
        if self._stoch_penalty:
            assert self._stoch_k > 1, \
                'stochastic_penalty needs stochastic_k > 1 copies'
        # discrete_ind semantics (reference controller_utils.py:107):
        # floor-and-clip the listed plan dims into {0..4}
        self._discrete = tuple(int(d) for d in discrete_dims)
        # AutograspEpsilon mode (explicit-gripper spaces): a per-iteration
        # decaying fraction of rows gets the cumulative-z pivot gripper +
        # epsilon flips.  Keys: z_dim, grip_dim, z_norm, zthresh, epsilon,
        # base_frac, base_frac_reduce, repeat, state_z_index.
        self._ag_eps = dict(ag_epsilon) if ag_epsilon else None
        assert not (self._ag_eps and (self._ag or self._mppi)), \
            'ag_epsilon is its own sampling mode'
        # Folding mode (FoldingCEMSampler): structured 5-phase pick-fold-
        # place prior mixed with refit-Gaussian rows.  Keys: split_frac,
        # max_shift.
        self._folding = dict(folding) if folding else None
        assert not (self._folding and (self._ag or self._ag_eps or
                                       self._mppi)), \
            'folding is its own sampling mode'
        # Multi-chip: shard the sample axis over the mesh.  A single sharding
        # constraint on the sampled plans is enough — XLA propagates the
        # partitioning through the rollout and inserts an all-gather of the
        # (M,)-sized scores before top_k (KB-scale, rides ICI).
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axis = mesh.axis_names[0]
            self._plan_sharding = NamedSharding(mesh, PartitionSpec(axis))
            assert num_samples % mesh.size == 0, \
                'num_samples must divide the mesh size'
        else:
            self._plan_sharding = None
        # Sample microbatching: roll the M-sample batch as an internal
        # lax.map over chunks of this size, so only the (chunk,)-scale
        # working set is live at once.  Measured per-sample cost grows
        # superlinearly past M=256 (204 -> 347 us/sample at M=800,
        # docs/PERFORMANCE.md sample sweep) because the full-res warp-tail
        # working set outgrows the on-chip hierarchy — chunking restores
        # the small-M operating point at large M.  Scores/elites/refit are
        # exact (per-sample costs are independent); with a stochastic
        # predictor each chunk folds its own latent key (same distribution,
        # different draws than the unchunked program), and the final-iter
        # vis videos re-roll the n_vis elites in one extra small rollout.
        self._chunk = int(sample_chunk)
        if self._chunk:
            assert num_samples % self._chunk == 0, \
                'num_samples must be a multiple of sample_chunk'
            assert self._chunk >= max(k_elite, self._n_vis), \
                'sample_chunk must cover k_elite and n_vis'
            assert mesh is None, \
                'sample_chunk and mesh sharding are separate regimes '\
                '(shard large M over chips instead)'
        # num_samples is static so a warm-started replan (reuse_mean/reuse_cov
        # shrink the sample count by reuse_factor) compiles as a second
        # variant instead of failing
        self._replan_jit = jax.jit(self._replan,
                                   static_argnames=('num_samples',))

    # -- core program --------------------------------------------------------------
    def _encode_contexts(self, params, images, states, distribs,
                         context_actions, num_samples):
        """Consume the context ONCE per camera at batch 1 and broadcast the
        recurrent carry across the sample batch — the context work is
        identical for every sample and every CEM iteration, so it runs
        exactly once per replan instead of iterations x M times."""
        carries = []
        for c, cam_params in enumerate(params):
            carry1 = self._model.apply(
                cam_params, images[c][None], context_actions[None],
                states[None], distribs[c][None], method='encode_context')
            carries.append(jax.tree.map(
                lambda x: (jnp.broadcast_to(x, (num_samples,) + x.shape[1:])
                           if hasattr(x, 'shape') else x), carry1))
        return carries

    def _rollout(self, params, carries, plan, rng):
        """Roll all cameras from pre-encoded context carries.

        :param plan: (M, T_plan, adim) candidate plans
        :return: (M,T',ncam,H,W,C), (M,T',ncam,H,W,P)
        """
        gen_images, gen_distribs, gen_images_tm = [], [], []
        for cam_params, carry in zip(params, carries):
            out = self._model.apply(cam_params, carry, plan, rng=rng,
                                    method='rollout_from')
            gen_images.append(out['gen_images'])
            gen_distribs.append(out['gen_distribs'])
            gen_images_tm.append(out['gen_images_tm'])
        return (jnp.stack(gen_images, axis=2), jnp.stack(gen_distribs, axis=2),
                jnp.stack(gen_images_tm, axis=2))

    def _sample_mppi(self, key, mean, cov, anchor, anchor_valid, M):
        """AR(1)-correlated noise around a mean plan (CorrelatedNoiseSampler
        semantics, reference ``samplers/correlated_noise.py:39-64``).

        :param mean: (n*adim,) flattened mean plan (zeros on the first iter)
        :param cov: optional (n*adim, n*adim) elite covariance; the host twin
            colors noise by multiplying with the covariance itself (not a
            matrix sqrt) — mirrored exactly for parity
        :param anchor: (adim,) previously executed action
        :param anchor_valid: scalar in {0,1}: use the anchor (vs the
            reference's wrap-around on the final step's raw noise)
        """
        spec, hp = self._spec, self._mppi
        n, adim = spec.nactions, spec.adim
        eps = jax.random.normal(key, (M, n, adim))
        if cov is not None:
            noise = (eps.reshape(M, -1) @ cov).reshape(eps.shape)
        else:
            scale = jnp.asarray(hp['per_dim_std'], jnp.float32)
            bias = jnp.asarray(hp.get('mean_bias') or [0.0] * adim,
                               jnp.float32)
            noise = eps * scale[None, None] + bias[None, None]
        b0, b1 = hp['beta_0'], hp['beta_1']
        wrap = noise[:, -1, :]
        first = b0 * noise[:, 0, :] + \
            b1 * (anchor_valid * anchor[None] + (1.0 - anchor_valid) * wrap)

        def body(prev, eps_t):
            cur = b0 * eps_t + b1 * prev
            return cur, cur
        _, rest = jax.lax.scan(body, first,
                               jnp.swapaxes(noise[:, 1:], 0, 1))
        plan = jnp.concatenate([first[:, None], jnp.swapaxes(rest, 0, 1)],
                               axis=1)
        return plan + mean.reshape(1, n, adim)

    def _mppi_update(self, elite_actions, elite_scores):
        """Soft elite-weighted mean (+ optional covariance refit):
        ``S = exp(kappa * (r - max r))`` over rewards = negated costs."""
        hp = self._mppi
        rewards = -elite_scores
        S = jnp.exp(hp['kappa'] * (rewards - jnp.max(rewards)))
        mean_plan = jnp.einsum('n,nta->ta', S, elite_actions) / \
            (jnp.sum(S) + 1e-4)
        cov = None
        if hp.get('refit_cov'):
            flat = elite_actions.reshape(elite_actions.shape[0], -1)
            centered = flat - jnp.mean(flat, axis=0, keepdims=True)
            cov = centered.T @ centered / jnp.maximum(flat.shape[0] - 1, 1)
        return mean_plan.reshape(-1), cov

    def _replan(self, params, key, context_images, context_states,
                context_distribs, context_actions, cost_ctx, mean, sigma,
                anchor=None, anchor_valid=0.0, num_samples=None):
        """One full replan.

        :param context_images: (ncam, n_ctx, H, W, C) float [0,1]
        :param context_states: (n_ctx, sdim)
        :param context_distribs: (ncam, n_ctx, H, W, P)
        :param context_actions: (n_ctx - 1, adim) actions already executed
            between the context frames (prepended to every candidate plan)
        :param cost_ctx: cost context pytree (distance grids for the default
            pixel cost; a goal image, classifier params, ... for overrides)
        :param mean/sigma: current sampling distribution (flattened plan);
            warm-started by the controller under reuse_mean/reuse_cov
        :param anchor/anchor_valid: MPPI smooth_across_last_action input
        :param num_samples: sample count for this replan (static; defaults
            to the configured M — warm starts shrink it by reuse_factor)
        :return: dict with best actions, scores, refit mean/sigma, vis tensors
        """
        spec = self._spec
        M = num_samples or self._M
        K = self._K
        plan_scores = []
        best_actions = None
        vis = None
        if anchor is None:
            anchor = jnp.zeros(spec.adim, jnp.float32)

        # chunked mode: the rollout batch is sample_chunk, not M (falls back
        # to unchunked for warm-start sample counts the chunk doesn't divide)
        use_chunk = bool(self._chunk) and M > self._chunk \
            and M % self._chunk == 0
        carries = self._encode_contexts(
            params, context_images, context_states, context_distribs,
            context_actions, self._chunk if use_chunk else M)

        sigma_prev = sigma   # smooth_cov blends each refit with the previous
        mppi_cov = None
        grip_close_prob_elites = None   # no_refit=False: last iter's elites
        for itr in range(self._iterations):
            key, k_sample, k_model, k_grip = jax.random.split(key, 4)
            if self._mppi is not None:
                plan = self._sample_mppi(k_sample, mean, mppi_cov, anchor,
                                         anchor_valid, M)       # (M,T,adim)
            elif self._folding is not None:
                fo = self._folding
                plan = folding_sample(
                    k_sample, mean, sigma,
                    context_states[-1, :2], M, spec,
                    split_frac=fo.get('split_frac', 0.5),
                    max_shift=tuple(fo.get('max_shift',
                                           (0.2, 0.2, 1.0 / 3))),
                    first_itr=(itr == 0))
            else:
                if self._stoch_k > 1:
                    plan = sample_actions(k_sample, mean, sigma, spec,
                                          M // self._stoch_k,
                                          rejection_rounds=self._rej,
                                          action_bound=self._bound)
                    plan = jnp.repeat(plan, self._stoch_k, axis=0)
                else:
                    plan = sample_actions(k_sample, mean, sigma, spec, M,
                                          rejection_rounds=self._rej,
                                          action_bound=self._bound)  # (M,T,adim)
                for d in self._discrete:
                    plan = plan.at[..., d].set(
                        jnp.clip(jnp.floor(plan[..., d]), 0.0, 4.0))
                if self._add_zero:
                    # one candidate is always the null plan (reference
                    # gaussian_sampler add_zero_action)
                    plan = plan.at[0].set(0.0)
            if self._ag_eps is not None:
                ae = self._ag_eps
                amount = max(int(M * ae.get('base_frac', 1.0) *
                                 ae.get('base_frac_reduce', 0.3) ** itr), 1)
                state_z = context_states[-1, ae.get('state_z_index',
                                                    ae['z_dim'])]
                plan = ag_epsilon_transform(
                    k_grip, plan, state_z, amount, ae['z_dim'],
                    ae['grip_dim'], z_norm=ae.get('z_norm', 1.0),
                    zthresh=ae.get('zthresh', 1.0 / 3),
                    epsilon=ae.get('epsilon', 0.5),
                    repeat=ae.get('repeat', 1))
            if self._ag is not None:
                ag = self._ag
                if grip_close_prob_elites is None:
                    current_z = context_states[
                        -1, ag.get('state_z_index', 2)]
                    k_grip, k_dev = jax.random.split(k_grip)
                    plan = autograsp_gripper_latch(
                        plan, current_z, ag['z_thresh'],
                        norm_factor=ag.get('norm_factor', 1.0),
                        reopen=ag.get('reopen', False),
                        close_cmd=ag.get('close_cmd', 1.0),
                        open_cmd=ag.get('open_cmd', -1.0),
                        z_index=ag.get('z_index', 2),
                        deviation_key=k_dev,
                        deviation_prob=ag.get('deviation_prob', 0.0))
                else:
                    grip = autograsp_gripper_resample(
                        k_grip, grip_close_prob_elites, M, plan.shape[1],
                        close_cmd=ag.get('close_cmd', 1.0),
                        open_cmd=ag.get('open_cmd', -1.0))
                    plan = jnp.concatenate([plan, grip[..., None]], axis=-1)
            if self._plan_sharding is not None:
                plan = jax.lax.with_sharding_constraint(
                    plan, self._plan_sharding)

            if use_chunk:
                n_chunks = M // self._chunk
                plan_c = plan.reshape((n_chunks, self._chunk) +
                                      plan.shape[1:])
                chunk_keys = jax.random.split(k_model, n_chunks)

                def score_chunk(args):
                    plan_i, key_i = args
                    gi, gd, _ = self._rollout(params, carries, plan_i, key_i)
                    if self._cost_fn is not None:
                        return self._cost_fn(gi, gd, cost_ctx)
                    return cost_lib.expected_pixel_distance(
                        gd, cost_ctx, self._finalweight,
                        normalize=True, only_first_view=self._ofv)

                scores = jax.lax.map(score_chunk,
                                     (plan_c, chunk_keys)).reshape(M)
                gen_images = gen_distribs = gen_images_tm = None
            else:
                gen_images, gen_distribs, gen_images_tm = self._rollout(
                    params, carries, plan, k_model)

                if self._cost_fn is not None:
                    scores = self._cost_fn(gen_images, gen_distribs,
                                           cost_ctx)
                else:
                    scores = cost_lib.expected_pixel_distance(
                        gen_distribs, cost_ctx, self._finalweight,
                        normalize=True, only_first_view=self._ofv)

            if self._stoch_penalty:
                # aggregate the K latent copies of each unique plan:
                # mean + lambda*std, then select GROUPS (copies are identical
                # plans, so the first row of a group is its action sequence)
                kk = self._stoch_k
                g = scores.reshape(M // kk, kk)
                group_scores = g.mean(axis=1) + \
                    self._stoch_penalty * g.std(axis=1)
                neg_top, elite_gidx = jax.lax.top_k(-group_scores, K)
                elite_idx = elite_gidx * kk
            else:
                neg_top, elite_idx = jax.lax.top_k(-scores, K)
            elite_actions = plan[elite_idx]
            best_actions = elite_actions
            plan_scores.append(scores)

            if itr == self._iterations - 1:
                nv = self._n_vis
                # n_vis=0 drops the verbose payload entirely: with the
                # default pixel cost nothing then reads the stacked
                # gen_images, so XLA dead-code-eliminates the full-res image
                # stacking/f32 conversion inside the rollouts (a real MPC
                # loop only consumes vis on save steps; controllers keep
                # vis on by default)
                if nv and use_chunk:
                    # chunked scoring never materializes the full-batch
                    # videos; re-roll just the nv elite plans (one small
                    # rollout — nv << chunk).  With a stochastic predictor
                    # these draws differ from the scored ones (vis is
                    # illustrative, scores are authoritative).
                    vis_carries = [jax.tree.map(
                        lambda x: x[:nv] if hasattr(x, 'shape') else x, c)
                        for c in carries]
                    vi, vd, vtm = self._rollout(
                        params, vis_carries, plan[elite_idx[:nv]], k_model)
                    vis = {
                        'indices': elite_idx[:nv],
                        'gen_images': jnp.swapaxes(vtm, 0, 1).astype(
                            jnp.float32),
                        'gen_distribs': vd,
                        'scores': -neg_top[:nv],
                    }
                elif nv:
                    # gather the nv elite videos from the time-major
                    # compute-dtype stack and convert AFTER the gather: the
                    # full-batch f32 video (and its 10-dynamic-slice gather,
                    # ~2 ms/replan measured on v5e) is then dead code unless
                    # a custom cost fn reads it
                    vis_imgs = jnp.take(gen_images_tm, elite_idx[:nv], axis=1)
                    vis = {
                        'indices': elite_idx[:nv],
                        'gen_images': jnp.swapaxes(vis_imgs, 0, 1).astype(
                            jnp.float32),
                        'gen_distribs': gen_distribs[elite_idx[:nv]],
                        'scores': -neg_top[:nv],
                    }
            elif self._mppi is not None:
                mean, mppi_cov = self._mppi_update(elite_actions, -neg_top)
            else:
                refit_elites = elite_actions
                if self._ag is not None:
                    # the latched grip dim is derived, never refit
                    refit_elites = elite_actions[..., :-1]
                    if not self._ag.get('no_refit', True):
                        grip_close_prob_elites = elite_actions
                mean, sigma = fit_elites(refit_elites, spec,
                                         blockdiag=self._blockdiag)
                if self._smooth_cov:
                    # reference gaussian_sampler.py smooth_cov: blend each
                    # refit with the previous iteration's covariance
                    sigma = (sigma + sigma_prev) / 2.0
                    sigma_prev = sigma

        return {
            'best_actions': best_actions,          # (K, T, adim) sorted best-first
            'best_scores': -neg_top,               # (K,)
            'scores_per_itr': jnp.stack(plan_scores),  # (iters, M)
            'mean': mean,
            'sigma': sigma,
            'vis': vis,
        }

    # -- public -----------------------------------------------------------------------
    def replan(self, params, key, context_images, context_states,
               context_distribs, context_actions, cost_ctx, mean, sigma,
               anchor=None, anchor_valid=0.0, num_samples=None):
        """Run the jitted replan; returns the result dict of device arrays."""
        return self._replan_jit(params, key, context_images, context_states,
                                context_distribs, context_actions, cost_ctx,
                                mean, sigma, anchor,
                                jnp.asarray(anchor_valid, jnp.float32),
                                num_samples=num_samples or self._M)

    @property
    def spec(self):
        return self._spec

    @property
    def is_mppi(self):
        return self._mppi is not None
