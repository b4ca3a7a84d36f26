"""Headline benchmark: full fused CEM replan on one TPU chip.

Operating point per BASELINE.md: 200 samples x 15-step horizon x 48x64 RGB,
3 CEM iterations, 1 camera, 1 designated pixel — the reference's default
visual-MPC configuration (``cem_base_controller.py:53-55``,
``pixel_cost_controller.py:56``).  North star: >= 20 Hz full replans
(p50 latency <= 50 ms).  The whole replan (Gaussian sampling, conv-LSTM CDNA
rollout of all samples, pixel cost, top-K, refit) is one jitted program.

Measurement notes: this box reaches its TPU through an RPC tunnel whose
~25-30 ms round trip dwarfs the on-chip time, and async dispatch means
``block_until_ready`` does not reflect device completion.  The primary
number therefore CHAINS ``CHAIN`` replans inside one jitted program (each
consuming the previous refit mean/sigma — a true sequential MPC dependency)
and fetches once: per-replan latency = (total - tunnel RTT) / CHAIN.

Prints ONE json line:
  {"metric": "cem_replan_hz_p50", "value": N, "unit": "Hz", "vs_baseline": N/20}
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _arm_tunnel_watchdog(timeout_s=300):
    """The axon tunnel on this box can wedge with clients blocked at 0 % CPU
    indefinitely; emit an honest failure line instead of hanging the driver.
    Returns an Event the main path sets after the first successful device
    round trip."""
    import os as _os
    import threading

    ready = threading.Event()

    def _watch():
        if not ready.wait(timeout_s):
            print(json.dumps({
                'metric': 'cem_replan_hz_p50', 'value': 0.0, 'unit': 'Hz',
                'vs_baseline': 0.0,
                'extra': {'error': 'TPU tunnel unreachable: no device round '
                                   'trip within {}s'.format(timeout_s),
                          'last_good_measurement':
                              '22.2 Hz (45.2 ms/replan) 2026-08-17, '
                              'see docs/PERFORMANCE.md'},
            }), flush=True)
            _os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return ready


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
    CHAIN = 20

    # flagship checkpoint: prefer a freshly trained one under /root/data
    # (make bench_model), else fall back to the checkpoint vendored in the
    # repo — /root/data does not survive this box between rounds, and the
    # bench must serve REAL weights either way (reference restore semantics:
    # visual_mpc/video_prediction/setup_predictor.py:125-147)
    model_path = os.environ.get('VF_BENCH_MODEL', '')
    if not model_path:
        # gate candidates on a RESTORABLE checkpoint, not a bare view0 dir —
        # a partial/stale /root/data run must not shadow the vendored model
        # (tests/test_flagship_mesh.py pins this fallback)
        from visual_foresight_tpu.prediction.checkpoints import (
            resolve_model_dir)
        model_path = resolve_model_dir(
            ('/root/data/models/xz_flagship',
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'benchmarks', 'models', 'xz_flagship'))
        ) or '/root/data/models/xz_flagship'

    # flagship serving configuration: space-to-depth (r=4) backbone — every
    # conv-LSTM gate is a lane-aligned >=128-channel matmul at 12x16/6x8, the
    # CDNA warp/compositing runs at full 48x64 via shift-and-accumulate
    # fusions (see docs/PERFORMANCE.md for the optimization ledger)
    predictor = TPUPredictor(model_path, {
        'designated_pixel_count': P, 'run_batch_size': M,
        'sequence_length': T + N_CTX, 'context_frames': N_CTX, 'ncam': NCAM,
        'img_dims': (H, W), 'adim': 3, 'sdim': 3, 'dtype': 'bfloat16',
        'std_factor': 4, 'enc_features': (128, 256, 256),
        'separable_lstm': True, 'lstm_kernel': 3,
        'scan_unroll': int(os.environ.get('VF_BENCH_UNROLL', '1')),
        # A/B knob for the decode-path 1x1 composition (models/cdna.py
        # fuse_decode; identical params, fp-reassociation-level change)
        'fuse_decode': bool(int(os.environ.get('VF_BENCH_FUSE_DECODE', '0'))),
    })
    ready = _arm_tunnel_watchdog()
    predictor.restore()
    ready.set()

    hp = {'initial_std': 0.05, 'initial_std_lift': 0.15,
          'initial_std_rot': np.pi / 18, 'initial_std_grasp': 2,
          'action_order': ['x', 'z', 'grasp'], 'nactions': NACT,
          'repeat': REPEAT}
    spec = make_action_spec(hp, 3)
    planner = FusedCEMPlanner(predictor.model, spec, M, iterations=ITERS,
                              k_elite=10, finalweight=10.0,
                              rejection_rounds=0, action_bound=True,
                              n_vis=int(os.environ.get('VF_BENCH_NVIS', '10')))

    rng = np.random.RandomState(0)
    ctx_images = jnp.asarray(rng.rand(NCAM, N_CTX, H, W, 3), jnp.float32)
    ctx_states = jnp.asarray(rng.randn(N_CTX, 3) * 0.05, jnp.float32)
    ctx_distribs = jnp.zeros((NCAM, N_CTX, H, W, P)).at[:, :, 24, 32, 0].set(1.0)
    ctx_actions = jnp.zeros((N_CTX - 1, 3))
    # DISTINCT context per chained replan: a real MPC loop sees fresh camera
    # frames/state every step, so the per-step context encode must stay
    # inside the measured chain — scanning over a pre-staged (CHAIN, ...)
    # stream makes it loop-carried data XLA cannot hoist
    chain_images = jnp.asarray(rng.rand(CHAIN, NCAM, N_CTX, H, W, 3),
                               jnp.float32)
    chain_states = jnp.asarray(rng.randn(CHAIN, N_CTX, 3) * 0.05, jnp.float32)
    chain_distribs = jnp.broadcast_to(ctx_distribs,
                                      (CHAIN,) + ctx_distribs.shape)
    grids = cost_lib.distance_grid(jnp.asarray([[[10.0, 50.0]]]), H, W)
    mean0, sigma0 = initial_mean(spec), initial_sigma(spec)
    params = predictor.params

    # ---- tunnel RTT baseline (fetch of a trivial op) --------------------------
    trivial = jax.jit(lambda x: x * 2 + 1)
    np.asarray(trivial(jnp.ones((8, 128))))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.ones((8, 128))))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.percentile(rtts, 50))

    # ---- chained replans: one program, sequential data dependency --------------
    def chained(params, key, mean, sigma, images_seq, states_seq,
                distribs_seq):
        def body(carry, xs):
            key, mean, sigma = carry
            imgs_t, states_t, distribs_t = xs
            key, sub = jax.random.split(key)
            out = planner._replan(params, sub, imgs_t, states_t,
                                  distribs_t, ctx_actions, grids, mean,
                                  sigma)
            # warm-start the next replan from this one's refit distribution
            # (blend back toward the prior so the chain stays well-conditioned)
            new_mean = 0.5 * out['mean']
            new_sigma = 0.5 * out['sigma'] + 0.5 * sigma0
            return (key, new_mean, new_sigma), out['best_actions'][0, 0, 0]
        (_, _, _), probe = jax.lax.scan(
            body, (key, mean, sigma),
            (images_seq, states_seq, distribs_seq), length=CHAIN)
        return probe

    chained_jit = jax.jit(chained)
    t0 = time.time()
    np.asarray(chained_jit(params, jax.random.PRNGKey(0), mean0, sigma0,
                           chain_images, chain_states, chain_distribs))
    compile_s = time.time() - t0

    totals = []
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        np.asarray(chained_jit(params, sub, mean0, sigma0, chain_images,
                               chain_states, chain_distribs))
        totals.append(time.perf_counter() - t0)
    total_p50 = float(np.percentile(totals, 50))
    per_replan = max(total_p50 - rtt, 1e-6) / CHAIN
    hz = 1.0 / per_replan

    # ---- 800-sample operating point: what every EVAL campaign and the
    # reference's experiments actually run (600-800 samples,
    # experiments/sim/cartgripper_2d_grasping/pixel_cost/hparams.py:37) —
    # measured with the same chained-sequential-dependency methodology
    M_BIG, CHAIN_BIG = 800, 8
    # sample microbatching at the big operating point: M=800 rolled as 4
    # chunks of 200 restores the small-M per-sample cost (the sample sweep
    # measured 204 -> 347 us/sample superlinearity past M=256; see
    # docs/PERFORMANCE.md).  VF_BENCH_CHUNK=0 reproduces the round-4
    # unchunked number.
    chunk_big = int(os.environ.get('VF_BENCH_CHUNK', '200'))
    planner_big = FusedCEMPlanner(predictor.model, spec, M_BIG,
                                  iterations=ITERS, k_elite=10,
                                  finalweight=10.0, rejection_rounds=0,
                                  action_bound=True, n_vis=10,
                                  sample_chunk=chunk_big)

    def chained_big(params, key, mean, sigma, images_seq, states_seq,
                    distribs_seq):
        def body(carry, xs):
            key, mean, sigma = carry
            imgs_t, states_t, distribs_t = xs
            key, sub = jax.random.split(key)
            out = planner_big._replan(params, sub, imgs_t, states_t,
                                      distribs_t, ctx_actions, grids, mean,
                                      sigma)
            new_mean = 0.5 * out['mean']
            new_sigma = 0.5 * out['sigma'] + 0.5 * sigma0
            return (key, new_mean, new_sigma), out['best_actions'][0, 0, 0]
        (_, _, _), probe = jax.lax.scan(
            body, (key, mean, sigma),
            (images_seq, states_seq, distribs_seq), length=CHAIN_BIG)
        return probe

    chained_big_jit = jax.jit(chained_big)
    big_args = (chain_images[:CHAIN_BIG], chain_states[:CHAIN_BIG],
                chain_distribs[:CHAIN_BIG])
    t0 = time.time()
    np.asarray(chained_big_jit(params, jax.random.PRNGKey(3), mean0, sigma0,
                               *big_args))
    compile_big_s = time.time() - t0
    totals_big = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        np.asarray(chained_big_jit(params, sub, mean0, sigma0, *big_args))
        totals_big.append(time.perf_counter() - t0)
    per_replan_big = max(float(np.percentile(totals_big, 50)) - rtt,
                         1e-6) / CHAIN_BIG
    hz_big = 1.0 / per_replan_big

    # ---- single-shot replan: one tunnel round trip + fresh context upload
    # (what a host-resident MPC loop would pay per step on this box)
    out = planner.replan(params, jax.random.PRNGKey(2), ctx_images, ctx_states,
                         ctx_distribs, ctx_actions, grids, mean0, sigma0)
    np.asarray(out['best_scores'])
    singles = []
    for i in range(10):
        key, sub = jax.random.split(key)
        fresh_images = rng.rand(NCAM, N_CTX, H, W, 3).astype(np.float32)
        fresh_states = (rng.randn(N_CTX, 3) * 0.05).astype(np.float32)
        t0 = time.perf_counter()
        out = planner.replan(params, sub, jnp.asarray(fresh_images),
                             jnp.asarray(fresh_states), ctx_distribs,
                             ctx_actions, grids, mean0, sigma0)
        np.asarray(out['best_scores'])
        singles.append(time.perf_counter() - t0)

    print(json.dumps({
        'metric': 'cem_replan_hz_p50',
        'value': round(hz, 2),
        'unit': 'Hz',
        'vs_baseline': round(hz / 20.0, 3),
        # degraded=true means the checkpoint restore FAILED and the run
        # served random-init weights (latency is weight-independent, but the
        # run no longer exercises the restore path) — VERDICT r3 weak #1
        'degraded': not predictor.restored,
        'extra': {
            'restored_checkpoint': bool(predictor.restored),
            'model_path': model_path,
            'hz_800_samples': round(hz_big, 2),
            'sample_chunk_800': chunk_big,
            'per_replan_ms_device_800': round(per_replan_big * 1e3, 2),
            'compile_800_s': round(compile_big_s, 1),
            'per_replan_ms_device': round(per_replan * 1e3, 2),
            'chain_total_ms': round(total_p50 * 1e3, 1),
            'chain_len': CHAIN,
            'tunnel_rtt_ms': round(rtt * 1e3, 2),
            'single_shot_ms_incl_rtt': round(
                float(np.percentile(singles, 50)) * 1e3, 2),
            'predicted_frames_per_sec': round(M * T * NCAM * ITERS / per_replan),
            'compile_s': round(compile_s, 1),
            'device': str(jax.devices()[0]),
            'config': '200 samples x 15 steps x 48x64, 3 CEM iters, '
                      'space-to-depth conv-LSTM flagship (std_factor=4); '
                      'distinct context frames per chained replan, '
                      'single-shot includes fresh context upload',
        },
    }))


if __name__ == '__main__':
    main()
