"""visual_foresight_tpu — TPU-native visual-MPC framework.

Process-wide JAX setup lives here so every entry point (collection CLI,
benchmark runs, training, bench.py) gets it, not just the test suite:
a persistent XLA compilation cache.  The planner/predictor programs are
identical run-to-run, and every campaign process otherwise pays the full
multi-minute compile again (measured 173 s -> 57 s on the CDNA model tests
when the suite gained the same cache).  The test conftest configures its
own cache dir first; anything already configured wins.
"""

import os as _os

import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _cache_dir = _os.environ.get(
        'VF_JAX_CACHE', _os.path.expanduser('~/.cache/vf_jax_cache'))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        _jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except OSError:  # read-only home: run uncached
        pass
