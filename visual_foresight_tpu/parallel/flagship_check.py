"""Mesh-sharded replan at the SERVING geometry — shared multi-chip check.

The tiny-shape mesh tests prove the sharded CEM program is semantically
equal to the unsharded one, but production runs 48x64 frames, 200 samples
and a real trained checkpoint; layout, padding and collective shapes all
change with geometry.  This module builds exactly that configuration (the
one ``bench.py`` measures on hardware) so that

* the suite pins sharded-vs-unsharded numerics at flagship shapes
  (``tests/test_planner.py``), and
* the driver's ``dryrun_multichip`` exercises the same program over the
  virtual n-device mesh (``__graft_entry__.py``),

covering SURVEY §2.8/§5.8 where the reference's only analog was slicing the
CEM batch across GPU towers (visual_mpc/video_prediction/
setup_predictor.py:31-58).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

H, W, NCAM, P = 48, 64, 1, 1
N_CTX = 2
NACT, REPEAT = 5, 3

VENDORED_FLAGSHIP = os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..',
    'benchmarks', 'models', 'xz_flagship'))


def load_flagship_predictor(model_dir=None, num_samples=200):
    """Restore the vendored serving checkpoint (arch comes from its
    ``model_config.json``; see prediction/predictor.py)."""
    from visual_foresight_tpu.prediction.predictor import TPUPredictor
    predictor = TPUPredictor(model_dir or VENDORED_FLAGSHIP, {
        'designated_pixel_count': P, 'run_batch_size': num_samples,
        'sequence_length': NACT * REPEAT + N_CTX, 'context_frames': N_CTX,
        'ncam': NCAM, 'img_dims': (H, W), 'adim': 3, 'sdim': 3,
        'dtype': 'bfloat16', 'std_factor': 4,
        'enc_features': (128, 256, 256), 'separable_lstm': True,
        'lstm_kernel': 3})
    predictor.restore()
    return predictor


def flagship_replan(mesh=None, model_dir=None, num_samples=200,
                    iterations=2, seed=0, predictor=None):
    """One full CEM replan at serving geometry; returns (result, predictor).

    ``mesh=None`` runs the unsharded program; otherwise the sample axis is
    partitioned over the mesh.  Pass ``predictor`` to reuse a restored
    checkpoint across the sharded/unsharded pair.
    """
    from visual_foresight_tpu.planners import costs as cost_lib
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                        initial_sigma,
                                                        make_action_spec)

    if predictor is None:
        predictor = load_flagship_predictor(model_dir, num_samples)

    hp = {'initial_std': 0.05, 'initial_std_lift': 0.15,
          'initial_std_rot': np.pi / 18, 'initial_std_grasp': 2,
          'action_order': ['x', 'z', 'grasp'], 'nactions': NACT,
          'repeat': REPEAT}
    spec = make_action_spec(hp, 3)
    planner = FusedCEMPlanner(predictor.model, spec, num_samples,
                              iterations=iterations, k_elite=10,
                              finalweight=10.0, rejection_rounds=0,
                              action_bound=True, n_vis=4, mesh=mesh)

    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(NCAM, N_CTX, H, W, 3), jnp.float32)
    states = jnp.asarray(rng.randn(N_CTX, 3) * 0.05, jnp.float32)
    distribs = jnp.zeros((NCAM, N_CTX, H, W, P)).at[:, :, 24, 32, 0].set(1.0)
    ctx_actions = jnp.zeros((N_CTX - 1, 3))
    grids = cost_lib.distance_grid(jnp.asarray([[[10.0, 50.0]]]), H, W)

    # orbax-restored params are committed to device 0; the sharded program
    # needs them replicated over the mesh (a real multi-chip serve does the
    # same broadcast once at restore time)
    params = predictor.params
    if mesh is not None:
        from visual_foresight_tpu.parallel.mesh import replicate
        params = replicate(mesh, params)

    result = planner.replan(params, jax.random.PRNGKey(seed),
                            images, states, distribs, ctx_actions, grids,
                            initial_mean(spec), initial_sigma(spec))
    jax.block_until_ready(result['best_scores'])
    return result, predictor
