"""Device-mesh helpers for multi-chip execution.

The reference's only multi-device mechanism was data-parallel inference towers
(batch sliced per GPU, ``setup_predictor.py:31-58``).  The TPU-native
equivalent: shard the CEM-sample / training-batch axis over a 1-D
``jax.sharding.Mesh`` and let XLA insert the (KB-scale) collectives over ICI —
no host-side scatter/gather, no backend code (SURVEY.md §5.8).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name='data'):
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Shard the leading (batch/sample) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, tree, axis_name='data'):
    """Device-put a pytree with leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
