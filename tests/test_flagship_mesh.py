"""Flagship-geometry multi-chip parity + vendored-checkpoint fallback.

The tiny-shape mesh test (test_planner.py) proves the sharded CEM program's
semantics; these tests pin the SERVING configuration — 48x64 frames, 200
samples, the real vendored checkpoint — where layouts, padding and
collective shapes all differ (SURVEY §2.8/§5.8).  The full-geometry parity
run costs minutes of CPU, so it carries the ``slow`` marker; the driver's
``dryrun_multichip`` exercises the same program every round.
"""

import numpy as np
import pytest

from visual_foresight_tpu.parallel.flagship_check import (VENDORED_FLAGSHIP,
                                                          flagship_replan,
                                                          load_flagship_predictor)
from visual_foresight_tpu.parallel.mesh import make_mesh
from visual_foresight_tpu.prediction.checkpoints import resolve_model_dir


def test_bench_fallback_resolves_vendored_checkpoint():
    """bench.py's model fallback: with no /root/data run (here: a
    nonexistent first candidate and a second candidate that exists but holds
    no restorable step), the VENDORED checkpoint must be chosen — wiping
    /root/data between rounds must not degrade the bench to random weights
    (round-3 wipe incident)."""
    assert resolve_model_dir(('/nonexistent/models/xz_flagship',
                              VENDORED_FLAGSHIP)) == VENDORED_FLAGSHIP
    # a dir that exists with an empty/partial view0 must NOT win
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, 'view0'))
        assert resolve_model_dir((d, VENDORED_FLAGSHIP)) == VENDORED_FLAGSHIP
    assert resolve_model_dir(('/nonexistent/a', '/nonexistent/b')) is None


def test_vendored_flagship_restores_real_weights():
    """The vendored checkpoint restores (no silent random-init fallback) and
    its weights are distinguishable from a fresh init."""
    predictor = load_flagship_predictor(num_samples=8)
    assert predictor.restored
    fresh = predictor._init_params()
    import jax
    restored_leaves = jax.tree.leaves(predictor.params[0])
    fresh_leaves = jax.tree.leaves(fresh)
    diffs = [float(np.abs(np.asarray(a, np.float32)
                          - np.asarray(b, np.float32)).max())
             for a, b in zip(restored_leaves, fresh_leaves)]
    assert max(diffs) > 1e-3, 'restored params equal a fresh init'


@pytest.mark.slow
def test_fused_planner_sharded_flagship_geometry():
    """Sharded-vs-unsharded replan parity at the full serving operating
    point: 48x64, 200 samples, bf16, real restored weights, 8-device mesh.
    Measured bitwise-identical on the CPU backend; the tolerance leaves
    headroom only for cross-version XLA reduction-order drift."""
    sharded, predictor = flagship_replan(mesh=make_mesh(8), num_samples=200,
                                         iterations=2)
    assert predictor.restored
    plain, _ = flagship_replan(mesh=None, num_samples=200, iterations=2,
                               predictor=predictor)
    bs_s = np.asarray(sharded['best_scores'], np.float64)
    bs_p = np.asarray(plain['best_scores'], np.float64)
    assert np.allclose(bs_s, bs_p, rtol=1e-3, atol=1e-3), (bs_s, bs_p)
    assert np.allclose(np.asarray(sharded['best_actions']),
                       np.asarray(plain['best_actions']),
                       atol=1e-4)
    # scores are sorted ascending and finite at this geometry
    assert np.all(np.isfinite(bs_s)) and np.all(np.diff(bs_s) >= -1e-6)
