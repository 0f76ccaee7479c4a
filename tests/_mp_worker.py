"""Worker for the 2-process distributed-feed test (run as __main__ in
subprocesses by tests/test_multiprocess.py; also imported by the test for the
shared model/loss definitions).

Each process owns a rank-sliced batch shard (InfiniteBatchSampler) and feeds
it through shard_batch, which must assemble the GLOBAL batch via
jax.make_array_from_process_local_data (reference semantics:
Spark/sampler.py:21-67 rank slice + DDP global loss)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SEED = 7
N_IMGS = 16
SIZE = 16
PER_HOST_BATCH = 2
WORLD = 2


def make_data():
    rng = np.random.default_rng(SEED)
    imgs = rng.normal(size=(N_IMGS, SIZE, SIZE)).astype(np.float32)
    return imgs


def model_params():
    rng = np.random.default_rng(SEED + 1)
    k = rng.normal(size=(3, 3, 1, 4)).astype(np.float32) * 0.1
    return {"kernel": k}


def loss_fn(params, batch):
    """Tiny conv + global-mean loss — enough to force a cross-device
    reduction over the sharded batch."""
    import jax
    import jax.numpy as jnp

    x = batch[..., None]
    y = jax.lax.conv_general_dilated(
        x, params["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.mean(jnp.square(y) * jnp.sin(x))


def global_batch_for_iter0(imgs):
    """The global batch the 2-process run assembles at iter 0: concat of the
    two contiguous rank slices."""
    from cmx.parallel.dist import InfiniteBatchSampler

    parts = []
    for rank in range(WORLD):
        s = InfiniteBatchSampler(N_IMGS, PER_HOST_BATCH, rank=rank,
                                 world_size=WORLD, seed=SEED)
        parts.append(imgs[next(iter(s))])
    return np.concatenate(parts, axis=0)


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=WORLD,
        process_id=rank,
    )
    import jax.numpy as jnp

    from cmx.parallel.dist import InfiniteBatchSampler, process_info
    from cmx.parallel.mesh import make_mesh, replicate, shard_batch

    assert process_info() == (rank, WORLD), process_info()
    imgs = make_data()
    sampler = InfiniteBatchSampler(N_IMGS, PER_HOST_BATCH, rank=rank,
                                   world_size=WORLD, seed=SEED)
    local = imgs[next(iter(sampler))]  # (PER_HOST_BATCH, S, S) host shard

    mesh = make_mesh()  # global mesh over all processes' devices
    batch = shard_batch(jnp.asarray(local), mesh)
    assert batch.shape[0] == PER_HOST_BATCH * WORLD, batch.shape  # GLOBAL

    params = replicate(jax.tree.map(jnp.asarray, model_params()), mesh)
    loss = jax.jit(loss_fn)(params, batch)
    if rank == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": float(loss),
                       "n_devices": jax.device_count(),
                       "local_devices": jax.local_device_count()}, f)
    # all processes must reach here before exit (avoid coordinator teardown
    # races)
    jax.effects_barrier()


if __name__ == "__main__":
    main()
