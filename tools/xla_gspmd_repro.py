"""Minimal repro: XLA GSPMD miscompiles reduce_window(maxpool) -> conv3x3
when the pooled tensor's PER-SHARD spatial extent is 1 (smaller than the
conv halo).

Found while numerically verifying cmx's 2-D (data x spatial) mesh (round-4
VERDICT item 5): at input 32^2 the UNet bottleneck is 2x2; sharded over 2
spatial devices each shard holds 1 row, and the partitioned pool+conv chain
returns values wrong by O(1) — in BOTH float32 and float64, on the CPU
backend's SPMD partitioner (the same platform-independent GSPMD pass TPU
uses). A standalone conv at extent 1 is exact; a conv on a strided slice is
exact; only the reduce_window -> conv chain breaks. Extent >= 2 is exact to
fp32 noise. Neither jax.lax.optimization_barrier between the ops nor a
reshape-max pool formulation avoids it.

Consequence for cmx: the spatial mesh axis carries a documented contract —
per-shard extent at the deepest pooled level must be >= 2 (production
256^2 / 2-shard configs give extent 8; parity at extent >= 2 is covered by
tests/test_distributed_parity.py). This script preserves the evidence.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/xla_gspmd_repro.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def main():
    rng = np.random.default_rng(0)
    devices = np.asarray(jax.devices())
    mesh1 = Mesh(devices[:1], ("data",))
    mesh8 = Mesh(devices[:8].reshape(4, 2), ("data", "spatial"))

    def cmp(name, f, x):
        o1 = np.asarray(jax.jit(f)(
            jax.device_put(x, NamedSharding(mesh1, P("data")))))
        o2 = np.asarray(jax.jit(f)(
            jax.device_put(x, NamedSharding(mesh8, P("data", "spatial", None)))))
        d = float(np.max(np.abs(o1 - o2)))
        print(f"{name}: maxdiff {d:.3e} {'BUG' if d > 1e-3 else 'ok'}")
        return d

    w = jnp.asarray((rng.normal(size=(3, 3, 32, 16)) * 0.05).astype(np.float32))

    def conv(a):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x4 = jnp.asarray(rng.normal(size=(8, 4, 4, 32)).astype(np.float32))
    x8 = jnp.asarray(rng.normal(size=(8, 8, 8, 32)).astype(np.float32))
    d1 = cmp("pool->conv, pooled extent 1/shard", lambda a: conv(pool(a)), x4)
    cmp("conv alone at extent 1/shard", conv, jnp.asarray(
        rng.normal(size=(8, 2, 2, 32)).astype(np.float32)))
    cmp("pool->conv, pooled extent 2/shard", lambda a: conv(pool(a)), x8)
    assert d1 > 1e-3, "repro no longer triggers — XLA fixed? revisit the contract"


if __name__ == "__main__":
    main()
