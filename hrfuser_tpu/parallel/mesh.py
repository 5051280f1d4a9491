"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL DDP stack
(`mmdet/apis/train.py:113-121`, `tools/dist_train.sh`; SURVEY §2.7): a
single `jax.sharding.Mesh`, batch-dim sharding for data parallelism, and
XLA-inserted collectives. Parameters/optimizer state are replicated
(models are 30-120M params — well within one chip); gradient allreduce and
cross-replica BN statistics fall out of `jit`'s partitioner because the
batch reduction axes span the mesh.

For multi-host slices call `jax.distributed.initialize()` first; the mesh
spans all global devices and `process_allgather` handles eval collection
(`hrfuser_tpu.parallel.gather`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the given/available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every leaf with its leading axis over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def gather(tree: Any) -> Any:
    """Bring a (possibly sharded) pytree to host numpy (eval collection)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
