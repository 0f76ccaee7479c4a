"""Subprocess program for the fp64 spatial-mesh parity check.

Run with env: JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu
              XLA_FLAGS=--xla_force_host_platform_device_count=8
In float64 the reassociation noise of the halo-exchange partitioning is
~1e-12, so a loose 1e-9 bound separates "different summation order" from
"wrong halo exchange" decisively — which fp32 cannot (measured fp32 global
param deviation 7e-4 is compatible with both).
Prints one JSON line with the measured deviations.
"""

import json
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmx.ops.masking import spark_active_mask
from cmx.ssl.spark import SparKModel, make_spark_task
from cmx.train.optim import make_optimizer
from cmx.train.state import TrainState
from cmx.train.trainer import make_train_step


def main():
    # 64, not 32: the spatial axis requires >= 2 pooled rows per shard
    # (tools/xla_gspmd_repro.py — GSPMD pool->conv miscompile at extent 1).
    # 4 devices / batch 4 / narrow widths, not the 31M reference model:
    # fp64 CPU convs are slow — reference-width runs took >20 min on a
    # 1-core container and exceeded XLA:CPU's 40 s collective-rendezvous
    # terminator (the test env also raises that timeout). Halo-exchange /
    # GSPMD-partitioning correctness is structural (same op graph, same
    # shardings, same 5-scale pool->conv chain), not width-dependent.
    size, batch = 64, 4
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(batch, size, size)))
    model = SparKModel(mask_ratio=0.6, full_unet=True, dtype=jnp.float64,
                       widths=(8, 16, 32, 64), bottleneck_width=128)
    task, _ = make_spark_task(model, augment=False, input_size=size)
    active0 = spark_active_mask(jax.random.key(1), 1, size // 16, 0.6)
    v = model.init(jax.random.key(0), imgs[:1], active0)
    tx = make_optimizer("sgd", 1e-2, momentum=0.9, params_example=v["params"])
    step = make_train_step(task, tx, donate=False)

    def run(mesh, batch_spec):
        state = TrainState.create(
            params=v["params"], batch_stats=v["batch_stats"], tx=tx,
            rng=jax.random.key(7))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        b = jax.device_put(imgs, NamedSharding(mesh, batch_spec))
        return step(state, b)

    devices = np.asarray(jax.devices())
    s1, m1 = run(Mesh(devices[:1], ("data",)), P("data"))
    s2, m2 = run(Mesh(devices[:4].reshape(2, 2), ("data", "spatial")),
                 P("data", "spatial", None))
    # pure 1-D data mesh too: fp32 bitwise sharded==single-device equality
    # was lost when the BN moment shift changed XLA's fusion structure
    # (tests/test_distributed_parity.py documents this); the fp64 run is
    # where the exactness guarantee now lives, for BOTH mesh shapes.
    s3, m3 = run(Mesh(devices[:4], ("data",)), P("data"))

    def maxdiff(t1, t2):
        return max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)))

    print(json.dumps({
        "loss_diff": abs(float(m1["loss"]) - float(m2["loss"])),
        "param_maxdiff": maxdiff(s1.params, s2.params),
        "bs_maxdiff": maxdiff(s1.batch_stats, s2.batch_stats),
        "data_loss_diff": abs(float(m1["loss"]) - float(m3["loss"])),
        "data_param_maxdiff": maxdiff(s1.params, s3.params),
        "data_bs_maxdiff": maxdiff(s1.batch_stats, s3.batch_stats),
    }))


if __name__ == "__main__":
    main()
