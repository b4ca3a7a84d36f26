"""Standalone probe: compile + time the Pallas CDNA warp on the real TPU.

The remote Mosaic compile service on this box has hung in past rounds
(>10 min on one `fused_warp_composite` compile, wedging the single-client
axon tunnel).  This probe therefore runs as its OWN process — launch it
under `timeout` so a hang cannot wedge a long-lived bench/test process:

    timeout 900 python scripts/pallas_device_probe.py

It escalates in stages, printing + flushing a line before each compile so a
hang leaves an exact failure signature:

  1. trivial pallas add kernel (is Mosaic alive at all?)
  2. warp kernel at a tiny shape (8x8x16, block_b=1)
  3. warp kernel at the serving operating point (200x48x64, block_b=8)
  4. timing vs the XLA effective-kernel formulation at the operating point

Timing methodology matches bench.py: chain ITERS applications inside one
jitted scan and fetch once (the tunnel's per-fetch RTT is ~30 ms; a no-op
`block_until_ready` makes naive timing meaningless).

Counterpart of the reference's CDNA motion-transform tail
(`/root/reference/visual_mpc/video_prediction/vpred_model_interface.py:52-88`
serves it from TF1); the XLA baseline lives in `ops/cdna_warp.py`.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def say(msg):
    print(msg, flush=True)


def timed_chain(fn, args, iters, tag):
    """Compile fn, then time `iters` chained applications fetched once."""

    @jax.jit
    def chain(a):
        def body(carry, _):
            img, dist = fn(carry[0], a[1], carry[1], a[3], a[4], a[5])
            return (img, dist), ()

        (img, dist), _ = jax.lax.scan(body, (a[0], a[2]), None, length=iters)
        return img.sum() + dist.sum()

    say(f'[{tag}] compiling chain...')
    t0 = time.time()
    out = chain(args)
    out.block_until_ready()
    _ = float(out)          # force a fetch through the tunnel
    say(f'[{tag}] compile+first-run {time.time() - t0:.1f}s')
    t0 = time.time()
    _ = float(chain(args))
    dt = time.time() - t0
    per = dt / iters * 1e3
    say(f'[{tag}] {iters} chained steps in {dt * 1e3:.1f} ms '
        f'-> {per:.3f} ms/step')
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stage', type=int, default=4,
                    help='run stages 1..N (default all)')
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--block_b', type=int, default=8,
                    help='pallas batch block at the operating point '
                         '(round-4 finding: the NHWC kernel OOMs scoped '
                         'VMEM at 200x48x64 for ANY block_b; bisect one '
                         'bounded process per value)')
    ap.add_argument('--kernel', choices=('eff', 'chw'), default='chw',
                    help='NHWC kernel (eff) or the layout-correct '
                         'channel-major kernel (chw)')
    ap.add_argument('--vmem_mb', type=int, default=0,
                    help='>0: pass vmem_limit_bytes to Mosaic')
    args = ap.parse_args()

    say(f'jax {jax.__version__} devices={jax.devices()}')
    dev = jax.devices()[0]

    # ---- stage 1: trivial pallas kernel ------------------------------
    from jax.experimental import pallas as pl

    def add_one(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    say('[stage1] compiling trivial pallas add...')
    t0 = time.time()
    x = jnp.zeros((8, 128), jnp.float32)
    y = pl.pallas_call(
        add_one, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
    say(f'[stage1] OK ({time.time() - t0:.1f}s), sum={float(y.sum())}')
    if args.stage < 2:
        return

    from visual_foresight_tpu.ops.cdna_warp import dna_warp
    from visual_foresight_tpu.ops.pallas_cdna import (fused_warp_composite_chw,
                                                      fused_warp_composite_eff)
    warp_fn = functools.partial(
        fused_warp_composite_chw if args.kernel == 'chw'
        else fused_warp_composite_eff,
        vmem_limit_bytes=args.vmem_mb * 2**20 or None)

    def xla_warp(prev, first, pd, fd, eff, bg):
        """The serving XLA formulation (models/cdna.py else-branch): one
        patch extraction/contraction for frame + distributions, then
        composite against the background masks."""
        m0, m1 = bg[..., 0:1], bg[..., 1:2]
        nc = prev.shape[-1]
        warped = dna_warp(jnp.concatenate([prev, pd], axis=-1), eff)
        img = prev * m0 + first * m1 + warped[..., :nc]
        dist = pd * m0 + fd * m1 + warped[..., nc:]
        return img, dist

    def make_args(b, h, w, c, p, kk, dtype=jnp.float32):
        rng = np.random.RandomState(0)
        prev = jnp.asarray(rng.rand(b, h, w, c), dtype)
        first = jnp.asarray(rng.rand(b, h, w, c), dtype)
        pd = jnp.asarray(rng.rand(b, h, w, p), dtype)
        fd = jnp.asarray(rng.rand(b, h, w, p), dtype)
        eff = jnp.asarray(rng.rand(b, h, w, kk) / kk, dtype)
        bg = jnp.asarray(rng.rand(b, h, w, 2) * 0.1, dtype)
        return tuple(jax.device_put(a, dev)
                     for a in (prev, first, pd, fd, eff, bg))

    # ---- stage 2: warp kernel, tiny shape ----------------------------
    tiny = make_args(2, 8, 128, 3, 1, 25)
    say('[stage2] compiling fused warp (tiny 2x8x128, block_b=1)...')
    t0 = time.time()
    img, dist = warp_fn(*tiny, sna=True, block_b=1)
    say(f'[stage2] OK ({time.time() - t0:.1f}s), '
        f'img_mean={float(img.mean()):.4f}')
    if args.stage < 3:
        return

    # ---- stage 3: operating point ------------------------------------
    op = make_args(200, 48, 64, 3, 1, 25)
    say(f'[stage3] compiling fused warp ({args.kernel}, 200x48x64, '
        f'block_b={args.block_b}, vmem_mb={args.vmem_mb})...')
    t0 = time.time()
    img, dist = warp_fn(*op, sna=True, block_b=args.block_b)
    say(f'[stage3] OK ({time.time() - t0:.1f}s), '
        f'img_mean={float(img.mean()):.4f}')

    # correctness vs the XLA formulation at the operating point
    ximg, xdist = xla_warp(*op)
    err = float(jnp.abs(img - ximg).max())
    derr = float(jnp.abs(dist - xdist).max())
    say(f'[stage3] max|pallas - xla| img={err:.2e} distrib={derr:.2e}')
    if args.stage < 4:
        return

    # ---- stage 4: timing, pallas vs XLA ------------------------------
    pallas_fn = functools.partial(warp_fn, sna=True, block_b=args.block_b)
    ms_p = timed_chain(pallas_fn, op, args.iters, 'stage4:pallas')
    ms_x = timed_chain(xla_warp, op, args.iters, 'stage4:xla')
    say(json.dumps({'kernel': args.kernel, 'block_b': args.block_b,
                    'pallas_ms_per_step': round(ms_p, 4),
                    'xla_ms_per_step': round(ms_x, 4),
                    'speedup': round(ms_x / ms_p, 3)}))


if __name__ == '__main__':
    sys.exit(main())
