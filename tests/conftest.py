"""Test harness setup: force JAX onto a virtual 8-device CPU mesh (multi-chip
sharding is validated without TPU hardware) and headless EGL rendering for
MuJoCo, before either library is imported."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('MUJOCO_GL', 'egl')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')

# the axon TPU plugin ignores the JAX_PLATFORMS env var, so force via config
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu'

# Persistent compilation cache: the suite is dominated by XLA compiles of
# planner/predictor programs that are identical run-to-run — cache them on
# disk so repeat runs (local loops, CI re-runs) skip compilation entirely.
# Traced-but-uncached first runs are unaffected.
_cache_dir = os.environ.get('VF_TEST_JAX_CACHE',
                            os.path.expanduser('~/.cache/vf_jax_test_cache'))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
