"""Replan-phase profiling hooks (SURVEY §5.1 rebuild item).

The reference had only ad-hoc timing prints; here every replan can be wrapped
in ``jax.profiler`` trace annotations plus a lightweight host-side phase timer
whose report mirrors the per-phase breakdown (sample/predict/score/refit is
one fused program on TPU, so device phases come from the profiler trace; the
host timer covers the controller-side phases around it).
"""

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock phase timer with JSON reporting."""

    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self._totals[name] += dt
                self._counts[name] += 1

    def report(self):
        out = {}
        for name, total in sorted(self._totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self._counts[name]
            out[name] = {'total_s': round(total, 4), 'count': n,
                         'mean_ms': round(total / n * 1e3, 3)}
        return out

    def log(self, logger=None):
        line = json.dumps(self.report())
        if logger is not None:
            logger.log(line)
        else:
            print(line)


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a device profiler trace around a code block; view with
    tensorboard or parse the trace json (see docs/PERFORMANCE.md)."""
    with jax.profiler.trace(str(log_dir)):
        yield
