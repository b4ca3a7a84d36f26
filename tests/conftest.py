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
