"""Device mesh + sharding helpers — the distributed runtime of the framework.

Replaces the reference's NCCL stack (Spark/dist.py, mmengine dist_cfg,
Lightning DDP plugins — SURVEY §2.7) with the TPU-native model: one
`jax.sharding.Mesh` over a `data` axis, batch-sharded `NamedSharding`, and
collectives compiled into the jitted step by XLA (gradient psum is implicit in
the global-view program; BN batch-stat reductions become SyncBN for free;
contrastive all_gathers disappear because the jitted program sees the global
batch).

The reference's graceful single-process degradation (Spark/dist.py:24-32)
maps to a 1-device mesh running the identical code path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[Any]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding.

    Single-process: plain `device_put` against the global sharding.
    Multi-process (jax.distributed): each host holds only its sampler shard
    (cli/pretrain.py divides the batch by world size, like the reference's
    DistInfiniteBatchSampler rank slice, Spark/sampler.py:21-67), so the
    global array must be ASSEMBLED from per-process shards —
    `jax.make_array_from_process_local_data`. `device_put` with a global
    NamedSharding would treat each host's local batch as the whole global
    batch and desync the hosts.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated (params, opt state, queues)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
