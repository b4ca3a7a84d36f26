"""Sweep the CEM sample count at the flagship serving point.

Motivation (docs/PERFORMANCE.md): the sample axis rides the TPU lane
dimension, which pads to multiples of 128 — 200 pads to 256 (22 % tax) and
the campaign operating point 800 pads to 896 (12 % tax).  The reference
picked 200/800 for GPU towers (`cem_base_controller.py:55`,
`experiments/sim/cartgripper_2d_grasping/pixel_cost/hparams.py:37`); on TPU
the natural operating points are the padded sizes themselves.  This sweep
measures ms/replan across M and reports the per-sample efficiency so the
campaign configs can sit on a lane boundary, getting plan-quality headroom
for free.

Methodology identical to bench.py: chain replans inside one jitted scan
with a sequential dependency (refit mean/sigma feed the next replan) and
fetch once; the tunnel RTT (~30 ms) is measured separately and subtracted.

Run on a FREE tunnel (single-client!):  timeout 1800 python scripts/bench_sample_sweep.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visual_foresight_tpu.planners import costs as cost_lib
    from visual_foresight_tpu.planners.cem import FusedCEMPlanner
    from visual_foresight_tpu.planners.gaussian import (initial_mean,
                                                        initial_sigma,
                                                        make_action_spec)
    from visual_foresight_tpu.prediction.predictor import TPUPredictor

    H, W, NCAM, P = 48, 64, 1, 1
    ITERS, NACT, REPEAT = 3, 5, 3
    T = NACT * REPEAT
    N_CTX = 2

    predictor = TPUPredictor('/root/data/models/xz_flagship', {
        'designated_pixel_count': P, 'run_batch_size': 200,
        'sequence_length': T + N_CTX, 'context_frames': N_CTX, 'ncam': NCAM,
        'img_dims': (H, W), 'adim': 3, 'sdim': 3, 'dtype': 'bfloat16',
        'std_factor': 4, 'enc_features': (128, 256, 256),
        'separable_lstm': True, 'lstm_kernel': 3,
    })
    predictor.restore()
    params = predictor.params

    hp = {'initial_std': 0.05, 'initial_std_lift': 0.15,
          'initial_std_rot': np.pi / 18, 'initial_std_grasp': 2,
          'action_order': ['x', 'z', 'grasp'], 'nactions': NACT,
          'repeat': REPEAT}
    spec = make_action_spec(hp, 3)

    rng = np.random.RandomState(0)
    ctx_actions = jnp.zeros((N_CTX - 1, 3))
    grids = cost_lib.distance_grid(jnp.asarray([[[10.0, 50.0]]]), H, W)
    mean0, sigma0 = initial_mean(spec), initial_sigma(spec)

    trivial = jax.jit(lambda x: x * 2 + 1)
    np.asarray(trivial(jnp.ones((8, 128))))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.ones((8, 128))))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.percentile(rtts, 50))
    print(f'tunnel rtt p50 {rtt * 1e3:.1f} ms', flush=True)

    results = []
    for M in (int(m) for m in os.environ.get(
            'VF_SWEEP_M', '200,256,512,640,768,800,896').split(',')):
        chain = max(4, min(20, 3200 // M))
        planner = FusedCEMPlanner(predictor.model, spec, M, iterations=ITERS,
                                  k_elite=10, finalweight=10.0,
                                  rejection_rounds=0, action_bound=True,
                                  n_vis=0)
        chain_images = jnp.asarray(rng.rand(chain, NCAM, N_CTX, H, W, 3),
                                   jnp.float32)
        chain_states = jnp.asarray(rng.randn(chain, N_CTX, 3) * 0.05,
                                   jnp.float32)
        ctx_distribs = jnp.zeros(
            (NCAM, N_CTX, H, W, P)).at[:, :, 24, 32, 0].set(1.0)
        chain_distribs = jnp.broadcast_to(ctx_distribs,
                                          (chain,) + ctx_distribs.shape)

        def chained(params, key, mean, sigma, images_seq, states_seq,
                    distribs_seq, planner=planner, chain=chain):
            def body(carry, xs):
                key, mean, sigma = carry
                imgs_t, states_t, distribs_t = xs
                key, sub = jax.random.split(key)
                out = planner._replan(params, sub, imgs_t, states_t,
                                      distribs_t, ctx_actions, grids, mean,
                                      sigma)
                new_mean = 0.5 * out['mean']
                new_sigma = 0.5 * out['sigma'] + 0.5 * sigma0
                return (key, new_mean, new_sigma), out['best_actions'][0, 0, 0]
            (_, _, _), probe = jax.lax.scan(
                body, (key, mean, sigma),
                (images_seq, states_seq, distribs_seq), length=chain)
            return probe

        cj = jax.jit(chained)
        t0 = time.time()
        np.asarray(cj(params, jax.random.PRNGKey(0), mean0, sigma0,
                      chain_images, chain_states, chain_distribs))
        compile_s = time.time() - t0

        totals = []
        key = jax.random.PRNGKey(1)
        for _ in range(5):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            np.asarray(cj(params, sub, mean0, sigma0, chain_images,
                          chain_states, chain_distribs))
            totals.append(time.perf_counter() - t0)
        per = max(float(np.percentile(totals, 50)) - rtt, 1e-6) / chain
        row = {'M': M, 'chain': chain, 'ms_per_replan': round(per * 1e3, 2),
               'hz': round(1.0 / per, 2),
               'us_per_sample': round(per / M * 1e6, 2),
               'compile_s': round(compile_s, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({'sweep': results}))


if __name__ == '__main__':
    main()
