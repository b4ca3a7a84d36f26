"""On-device planning costs.

JAX ports of the reference's numpy cost math:
- expected pixel distance (``pixel_cost_controller.py:135-197``)
- goal-image MSE (``goal_im_controller.py:77-99``)
- registration warp-error tradeoffs (``register_gtruth_controller.py:54-111``)
"""

import jax
import jax.numpy as jnp


def distance_grid(goal_pix, height, width):
    """(..., 2) goal pixels -> (..., H, W) Euclidean distance grids
    (reference ``_get_distancegrid``, ``pixel_cost_controller.py:189-197``)."""
    rows = jnp.arange(height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(rows, cols, indexing='ij')
    goal = jnp.asarray(goal_pix, jnp.float32)
    dr = rr - goal[..., 0:1, None]
    dc = cc - goal[..., 1:2, None]
    return jnp.sqrt(dr * dr + dc * dc)


def time_weights(horizon, finalweight):
    """Per-step weights: 1 everywhere, ``finalweight`` on the last step
    (reference ``_expected_distance``, ``pixel_cost_controller.py:175-177``)."""
    w = jnp.ones(horizon, jnp.float32)
    return w.at[-1].set(finalweight)


def expected_pixel_distance(gen_distribs, dist_grids, finalweight=10.0,
                            normalize=True, only_first_view=False):
    """Expected distance of predicted pixel distributions to goal pixels.

    :param gen_distribs: (B, T, ncam, H, W, P)
    :param dist_grids: (ncam, P, H, W) precomputed distance grids
    :param finalweight: weight of the final timestep
    :return: (B,) scores (lower = better), averaged over cams & tasks
        (reference ``_eval_pixel_cost``, ``pixel_cost_controller.py:135-166``)
    """
    d = gen_distribs.astype(jnp.float32)
    if normalize:
        tot = jnp.sum(d, axis=(3, 4), keepdims=True)
        d = d / jnp.maximum(tot, 1e-6)
    # scores per (B, T, ncam, P)
    per_t = jnp.einsum('btchwp,cphw->btcp', d, dist_grids.astype(jnp.float32))
    w = time_weights(per_t.shape[1], finalweight)
    per_task = jnp.sum(per_t * w[None, :, None, None], axis=1) / jnp.sum(w)
    if only_first_view:
        per_task = per_task[:, 0:1]
    b = per_task.shape[0]
    return jnp.mean(per_task.reshape(b, -1), axis=1)


def goal_image_mse(gen_images, goal_image, final_frames=1):
    """MSE between the last ``final_frames`` predicted frames and a goal image.

    :param gen_images: (B, T, ncam, H, W, C) in [0, 1]
    :param goal_image: (ncam, H, W, C)
    :return: (B,) scores (lower = better)
    """
    tail = gen_images[:, -final_frames:].astype(jnp.float32)
    diff = tail - goal_image[None, None].astype(jnp.float32)
    return jnp.mean(jnp.square(diff), axis=(1, 2, 3, 4, 5))


def classifier_logprob_cost(logits):
    """Success-classifier cost: -log p(success) (reference
    ``variants/classifier_controller.py:83-105``)."""
    return -jax.nn.log_sigmoid(logits.astype(jnp.float32))


def ensemble_cost(per_model_scores, lambda_var=1.0):
    """Ensemble disagreement cost: mean + lambda * var across model copies
    (reference ``variants/ensemble_vidpred.py:18-62``).

    :param per_model_scores: (n_ensemble, B)
    :return: (B,)
    """
    mean = jnp.mean(per_model_scores, axis=0)
    var = jnp.var(per_model_scores, axis=0)
    return mean + lambda_var * var
