"""Headline benchmark: full fused CEM replan on one TPU chip.

Operating point per BASELINE.md: 200 samples x 15-step horizon x 48x64 RGB,
3 CEM iterations, 1 camera, 1 designated pixel — the reference's default
visual-MPC configuration (``cem_base_controller.py:53-55``,
``pixel_cost_controller.py:56``).  North star: >= 20 Hz full replans
(p50 latency <= 50 ms).  The whole replan (Gaussian sampling, conv-LSTM CDNA
rollout of all samples, pixel cost, top-K, refit) is one jitted program.

Prints ONE json line:
  {"metric": "cem_replan_hz_p50", "value": N, "unit": "Hz", "vs_baseline": N/20}
"""

import json
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
    M, ITERS, NACT, REPEAT = 200, 3, 5, 3
    T = NACT * REPEAT  # 15
    N_CTX = 2

    predictor = TPUPredictor('', {
        'designated_pixel_count': P, 'run_batch_size': M,
        'sequence_length': T + N_CTX, 'context_frames': N_CTX, 'ncam': NCAM,
        'img_dims': (H, W), 'adim': 3, 'sdim': 3, 'dtype': 'bfloat16',
    })
    predictor.restore()

    hp = {'initial_std': 0.05, 'initial_std_lift': 0.15,
          'initial_std_rot': np.pi / 18, 'initial_std_grasp': 2,
          'action_order': ['x', 'z', 'grasp'], 'nactions': NACT,
          'repeat': REPEAT}
    spec = make_action_spec(hp, 3)
    planner = FusedCEMPlanner(predictor.model, spec, M, iterations=ITERS,
                              k_elite=10, finalweight=10.0,
                              rejection_rounds=0, action_bound=True)

    rng = np.random.RandomState(0)
    ctx_images = jnp.asarray(rng.rand(NCAM, N_CTX, H, W, 3), jnp.float32)
    ctx_states = jnp.asarray(rng.randn(N_CTX, 3) * 0.05, jnp.float32)
    ctx_distribs = jnp.zeros((NCAM, N_CTX, H, W, P)).at[:, :, 24, 32, 0].set(1.0)
    ctx_actions = jnp.zeros((N_CTX - 1, 3))
    grids = cost_lib.distance_grid(jnp.asarray([[[10.0, 50.0]]]), H, W)
    mean, sigma = initial_mean(spec), initial_sigma(spec)

    key = jax.random.PRNGKey(0)

    def run(k):
        out = planner.replan(predictor.params, k, ctx_images, ctx_states,
                             ctx_distribs, ctx_actions, grids, mean, sigma)
        jax.block_until_ready(out['best_actions'])
        return out

    # warmup / compile
    t0 = time.time()
    run(key)
    compile_s = time.time() - t0

    times = []
    for i in range(30):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        run(sub)
        times.append(time.perf_counter() - t0)

    p50 = float(np.percentile(times, 50))
    hz = 1.0 / p50
    frames_per_sec = M * T * NCAM * ITERS / p50

    print(json.dumps({
        'metric': 'cem_replan_hz_p50',
        'value': round(hz, 2),
        'unit': 'Hz',
        'vs_baseline': round(hz / 20.0, 3),
        'extra': {
            'p50_ms': round(p50 * 1e3, 2),
            'p90_ms': round(float(np.percentile(times, 90)) * 1e3, 2),
            'predicted_frames_per_sec': round(frames_per_sec),
            'compile_s': round(compile_s, 1),
            'device': str(jax.devices()[0]),
            'config': '200 samples x 15 steps x 48x64, 3 CEM iters',
        },
    }))


if __name__ == '__main__':
    main()
