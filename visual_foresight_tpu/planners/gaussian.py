"""On-device Gaussian CEM action distribution.

JAX re-formulation of the reference's numpy sampler math
(``visual_mpc/policy/cem_controllers/samplers/gaussian_sampler.py`` and
``policy/utils/controller_utils.py``): full-covariance sampling over the
flattened (nactions*adim) plan via Cholesky, per-dimension std table keyed by
``action_order``, bounded rejection sampling (jit-safe: a fixed number of
resample rounds followed by clipping, instead of the reference's unbounded
python loop at ``gaussian_sampler.py:109-150``), repeat-expansion, xy/theta
truncation, and elite mean/covariance refit.
"""

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAX_ROT = np.pi / 4


class ActionSpec(NamedTuple):
    """Static description of the action distribution."""
    adim: int
    nactions: int
    repeat: int
    per_dim_std: tuple           # len adim, initial std per dim
    clip_dims_xy: tuple          # dims clipped to ±2*initial_std (x/y)
    clip_dims_rot: tuple         # dims clipped to ±pi/4 (theta)
    rej_dims_xy: tuple           # dims rejection-bounded at 1.5*xy std
    rej_dims_lift: tuple         # dims rejection-bounded at 1.5*lift std
    xy_std: float
    lift_std: float


def make_action_spec(hp_dict, adim):
    """Build an ActionSpec from controller hparams (dict-like with
    initial_std/initial_std_lift/initial_std_rot/initial_std_grasp,
    action_order, nactions, repeat)."""
    xy_std = hp_dict['initial_std']
    lift_std = hp_dict['initial_std_lift']
    rot_std = hp_dict['initial_std_rot']
    grasp_std = hp_dict['initial_std_grasp']
    order = hp_dict.get('action_order')

    if order is not None:
        table = {'x': xy_std, 'y': xy_std, 'z': lift_std, 'theta': rot_std,
                 'grasp': grasp_std}
        stds = [table[a] for a in order]
        clip_xy = tuple(i for i, a in enumerate(order) if a in ('x', 'y'))
        clip_rot = tuple(i for i, a in enumerate(order) if a == 'theta')
        rej_xy = clip_xy
        rej_lift = tuple(i for i, a in enumerate(order) if a == 'z')
    else:
        names = ['x', 'y', 'z', 'theta', 'grasp'][:adim]
        table = {'x': xy_std, 'y': xy_std, 'z': lift_std, 'theta': rot_std,
                 'grasp': grasp_std}
        stds = [table[n] for n in names]
        clip_xy = tuple(i for i in range(min(2, adim)))
        clip_rot = (3,) if adim >= 4 else ()
        rej_xy = clip_xy
        rej_lift = (2,) if adim >= 3 else ()

    return ActionSpec(adim=len(stds), nactions=hp_dict['nactions'],
                      repeat=hp_dict['repeat'], per_dim_std=tuple(stds),
                      clip_dims_xy=clip_xy, clip_dims_rot=clip_rot,
                      rej_dims_xy=rej_xy, rej_dims_lift=rej_lift,
                      xy_std=xy_std, lift_std=lift_std)


def initial_sigma(spec: ActionSpec, reduce_std_dev: float = 1.0,
                  reduce: bool = False):
    """Diagonal covariance over the flattened plan
    (reference ``controller_utils.py:47-84``)."""
    diag = np.tile(np.square(np.array(spec.per_dim_std)), spec.nactions)
    if reduce:
        diag[:(spec.nactions - 1) * spec.adim] *= reduce_std_dev
    return jnp.asarray(np.diag(diag), jnp.float32)


def initial_mean(spec: ActionSpec):
    return jnp.zeros(spec.adim * spec.nactions, jnp.float32)


def _plan_bounds(spec: ActionSpec, factor: float):
    """(lo, hi) per flattened-plan dim for rejection bounds; ±inf elsewhere."""
    lo = np.full(spec.adim, -np.inf)
    hi = np.full(spec.adim, np.inf)
    for d in spec.rej_dims_xy:
        lo[d], hi[d] = -factor * spec.xy_std, factor * spec.xy_std
    for d in spec.rej_dims_lift:
        lo[d], hi[d] = -factor * spec.lift_std, factor * spec.lift_std
    lo = np.tile(lo, spec.nactions)
    hi = np.tile(hi, spec.nactions)
    return jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)


def truncate(actions, spec: ActionSpec):
    """Clip xy to ±2*xy_std and theta to ±pi/4 over (..., adim)
    (reference ``controller_utils.py:6-44``)."""
    maxshift = 2.0 * spec.xy_std
    for d in spec.clip_dims_xy:
        actions = actions.at[..., d].set(
            jnp.clip(actions[..., d], -maxshift, maxshift))
    for d in spec.clip_dims_rot:
        actions = actions.at[..., d].set(
            jnp.clip(actions[..., d], -MAX_ROT, MAX_ROT))
    return actions


@partial(jax.jit, static_argnames=('spec', 'nsamples', 'rejection_rounds',
                                   'action_bound'))
def sample_actions(key, mean, sigma, spec: ActionSpec, nsamples: int,
                   rejection_rounds: int = 0, action_bound: bool = True):
    """Draw nsamples plans and repeat-expand to (nsamples, nactions*repeat, adim).

    rejection_rounds > 0 emulates the reference's rejection sampler with a
    bounded resample-then-clip loop (each round resamples still-invalid rows).
    """
    dim = spec.adim * spec.nactions
    # robust Cholesky: covariance from a small elite set can be singular
    chol = jnp.linalg.cholesky(
        sigma + 1e-10 * jnp.eye(dim, dtype=sigma.dtype))
    chol = jnp.where(jnp.isnan(chol),
                     jnp.sqrt(jnp.maximum(jnp.diag(sigma), 1e-12))[:, None] *
                     jnp.eye(dim), chol)

    def draw(k):
        z = jax.random.normal(k, (nsamples, dim))
        return mean[None] + z @ chol.T

    key, sub = jax.random.split(key)
    flat = draw(sub)

    if rejection_rounds > 0:
        lo, hi = _plan_bounds(spec, 1.5)

        def body(i, carry):
            flat, key = carry
            key, sub = jax.random.split(key)
            invalid = jnp.any((flat < lo[None]) | (flat > hi[None]), axis=1)
            fresh = draw(sub)
            flat = jnp.where(invalid[:, None], fresh, flat)
            return flat, key

        flat, key = jax.lax.fori_loop(0, rejection_rounds, body, (flat, key))
        flat = jnp.clip(flat, lo[None], hi[None])  # clamp stragglers

    actions = flat.reshape(nsamples, spec.nactions, spec.adim)
    if action_bound:
        actions = truncate(actions, spec)
    return jnp.repeat(actions, spec.repeat, axis=1)


def fit_elites(elite_actions, spec: ActionSpec, blockdiag: bool = False):
    """Refit (mean, sigma) from elite plans
    (reference ``gaussian_sampler.py:96-107``): keep one action per repeat
    block, flatten, unbiased covariance."""
    k = elite_actions.shape[0]
    acts = elite_actions.reshape(k, spec.nactions, spec.repeat, spec.adim)
    acts = acts[:, :, -1, :].reshape(k, spec.nactions * spec.adim)
    mean = jnp.mean(acts, axis=0)
    centered = acts - mean[None]
    sigma = centered.T @ centered / jnp.maximum(k - 1, 1)
    if blockdiag:
        mask = np.zeros((spec.nactions * spec.adim,) * 2, np.float32)
        for i in range(spec.nactions - 1):
            a = i * spec.adim
            mask[a:a + 2 * spec.adim, a:a + 2 * spec.adim] = 1.0
        sigma = sigma * jnp.asarray(mask)
    return mean, sigma


def shift_sigma(sigma, spec: ActionSpec, reuse_fraction: float):
    """Between-replan covariance shift (reference ``controller_utils.py:87-96``)."""
    adim, n = spec.adim, spec.nactions
    init = np.tile(np.square(np.array(spec.per_dim_std)), n)
    init = jnp.asarray(np.diag(init), jnp.float32)
    dim = adim * n
    out = jnp.zeros_like(sigma)
    out = out.at[:dim - adim, :dim - adim].set(
        sigma[adim:, adim:] + init[:dim - adim, :dim - adim] * reuse_fraction)
    out = out.at[dim - adim:, dim - adim:].set(init[:adim, :adim])
    return out


def autograsp_gripper_latch(base_actions, current_z, z_thresh,
                            norm_factor=1.0, reopen=False,
                            close_cmd=1.0, open_cmd=-1.0, z_index=2,
                            deviation_key=None, deviation_prob=0.0):
    """AutograspSampler's cumulative-z gripper derivation as device math
    (host twin: ``samplers/autograsp_sampler.py _sample_gripper``, reference
    ``samplers/autograsp_sampler.py:21-58``).

    :param base_actions: (M, T, adim_base) sampled xyz/theta plans
    :param current_z: scalar gripper z at plan time (state index 2)
    :return: (M, T, adim_base + 1) plans with the latched grip appended
    """
    z = base_actions[:, :, z_index]
    close = (jnp.cumsum(z * norm_factor, axis=1) + current_z) < z_thresh
    if not reopen:
        # sticky: once closed, stays closed for the rest of the plan
        close = jnp.cumsum(close.astype(jnp.int32), axis=1) > 0
    if deviation_prob and deviation_key is not None:
        flip = jax.random.uniform(deviation_key, close.shape) < deviation_prob
        close = jnp.logical_xor(close, flip)
    grip = jnp.where(close, close_cmd, open_cmd).astype(base_actions.dtype)
    return jnp.concatenate([base_actions, grip[..., None]], axis=-1)


def autograsp_gripper_resample(key, elite_actions, nsamples, nactions,
                               close_cmd=1.0, open_cmd=-1.0):
    """``no_refit=False`` refit semantics: per-timestep close probability
    from the elites, Bernoulli gripper per fresh sample (reference
    ``samplers/autograsp_sampler.py sample_next_actions``)."""
    close_prob = jnp.mean(
        (elite_actions[:, :, -1] == close_cmd).astype(jnp.float32), axis=0)
    cmd = jax.random.uniform(key, (nsamples, nactions)) < close_prob[None]
    return jnp.where(cmd, close_cmd, open_cmd)


def ag_epsilon_transform(key, plan, state_z, amount, z_dim, grip_dim,
                         z_norm=1.0, zthresh=1.0 / 3, epsilon=0.5,
                         repeat=1):
    """AutograspEpsilon gripper derivation for the first ``amount`` rows
    (host twin: ``samplers/autograsp_epsilon.py _apply_ag_epsilon``): close
    from the first repeat-boundary at/below the cumulative-z threshold
    (open before, closed after — argmax semantics: all-open plans close at
    t=0, matching the host), then flip every step with prob ``epsilon``.

    ``amount`` must be static (the CEM iteration loop is unrolled).
    """
    T = plan.shape[1]
    z = plan[:amount, :, z_dim]
    cum = jnp.cumsum(z / z_norm, axis=1) + state_z
    close = (cum <= zthresh).astype(jnp.int32)
    first = jnp.argmax(close, axis=1)
    pivot = first - first % repeat
    tidx = jnp.arange(T)
    grip = jnp.where(tidx[None, :] >= pivot[:, None], 1.0, -1.0)
    flips = jnp.where(
        jax.random.uniform(key, grip.shape) < epsilon, -1.0, 1.0)
    grip = (grip * flips).astype(plan.dtype)
    return plan.at[:amount, :, grip_dim].set(grip)


def _psd_factor(sigma, eps=1e-10):
    """Symmetric PSD factor F with F @ F.T = the eigenvalue-clipped
    projection of sigma (host twin: ``folding_sampler._ensure_psd`` +
    multivariate_normal's internal factorization)."""
    sigma = 0.5 * (sigma + sigma.T)
    w, v = jnp.linalg.eigh(sigma)
    return v * jnp.sqrt(jnp.clip(w, eps, None))[None, :]


def folding_sample(key, mean, sigma, state_xy, nsamples, spec: ActionSpec,
                   split_frac=0.5, max_shift=(0.2, 0.2, 1.0 / 3),
                   first_itr=False):
    """FoldingCEMSampler's structured 5-phase prior as device math
    (host twin: ``samplers/folding_sampler.py _sample``).

    Three row groups: a pick->fold->place prior (waypoint-conditioned phase
    means, tight z/theta noise on the grasp phases), a direct move->descend
    prior whose tail HOLDS one draw, and plain Gaussian samples from the
    refit distribution.  xy/z clipped to ``max_shift``; repeat-expanded.
    """
    n, adim = spec.nactions, spec.adim
    assert adim == 4, 'folding prior requires 4 base action dims'
    per_split = int((nsamples * split_frac) / 2)
    if first_itr:
        per_split = max(int(per_split / 2), 1)
    p2 = 2 * per_split
    n_def = nsamples - p2

    f_base = _psd_factor(sigma[:4, :4])
    lower_sigma = sigma[:4, :4]
    lower_sigma = lower_sigma.at[:2, :2].divide(10.0)
    lower_sigma = lower_sigma.at[3, 3].divide(2.0)
    f_lower = _psd_factor(lower_sigma)
    f_full = _psd_factor(sigma)

    k_w, k_eps, k_def = jax.random.split(key, 3)
    # phase waypoints in the unit square (host: np.random.uniform(size=2))
    way = jax.random.uniform(k_w, (p2, 2, 2))
    eps = jax.random.normal(k_eps, (p2, n, 4))

    # per-(group, step) factor selection: True -> tight "lower" noise
    steps = jnp.arange(n)
    lower_steps_1 = (steps == 1) | (steps == 2) | (steps == 4)
    lower_steps_2 = (steps == 0) | (steps >= 2)
    is_split2 = (jnp.arange(p2) >= per_split)[:, None]
    use_lower = jnp.where(is_split2, lower_steps_2[None, :],
                          lower_steps_1[None, :])
    noise = jnp.where(use_lower[..., None],
                      eps @ f_lower.T, eps @ f_base.T)
    # split 2 tail: steps >= 3 repeat ONE hold draw
    hold = noise[:, 3, :][:, None, :]
    noise = jnp.where((is_split2 & (steps >= 3)[None, :])[..., None],
                      hold, noise)

    first_pnt, second_pnt = way[:, 0], way[:, 1]
    d1 = (first_pnt - state_xy[None]) / spec.repeat
    d2s1 = (second_pnt - first_pnt) / spec.repeat          # split 1
    d2s2 = (second_pnt - state_xy[None]) / spec.repeat     # split 2

    means = jnp.zeros((p2, n, 4))
    z_up = jnp.array([0.0, 0.0, 1.0, 0.0])
    z_dn = jnp.array([0.0, 0.0, -1.0, 0.0])
    # split 1: move(d1,up) descend grasp move(d2,up) release [0...]
    m1 = jnp.zeros((p2, n, 4))
    m1 = m1.at[:, 0, :2].set(d1).at[:, 0, 2].set(1.0)
    m1 = m1.at[:, 1].set(z_dn).at[:, 2].set(z_up)
    m1 = m1.at[:, 3, :2].set(d2s1).at[:, 3, 2].set(1.0)
    m1 = m1.at[:, 4].set(z_dn)
    # split 2: up, move(d2,up), descend, hold zeros
    m2 = jnp.zeros((p2, n, 4))
    m2 = m2.at[:, 0].set(z_up)
    m2 = m2.at[:, 1, :2].set(d2s2).at[:, 1, 2].set(1.0)
    m2 = m2.at[:, 2].set(z_dn)
    means = jnp.where(is_split2[..., None], m2, m1)

    structured = means + noise
    if n_def > 0:
        flat = mean[None] + \
            jax.random.normal(k_def, (n_def, n * adim)) @ f_full.T
        plans = jnp.concatenate(
            [structured, flat.reshape(n_def, n, adim)], axis=0)
    else:
        plans = structured[:nsamples]
    ms = jnp.asarray(max_shift)
    plans = plans.at[:, :, :3].set(
        jnp.clip(plans[:, :, :3], -ms[None, None], ms[None, None]))
    return jnp.repeat(plans, spec.repeat, axis=1)
