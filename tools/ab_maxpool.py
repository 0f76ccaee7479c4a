"""A/B: reduce_window max-pool (SelectAndScatter backward) vs reshape-max
(compare/select backward) on the real TPU, standalone and inside the full
SparK step.

TPU context: lax.reduce_window's VJP emits SelectAndScatter, a windowed
sequential op that Mosaic/XLA lowers poorly; reshaping (B,H,W,C) ->
(B,H/2,2,W/2,2,C) and reducing the two size-2 axes gives the same forward
values while the backward becomes an elementwise equality-mask select that
fuses into the surrounding backward graph.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_maxpool.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, n=20, warmup=5):
    f = jax.jit(fn)

    def sync(out):
        # transfer ONE scalar (device-side reduce first): np.asarray would
        # pull the full array through the tunnel and dominate the timing.
        float(jnp.ravel(jax.tree.leaves(out)[0])[0])

    out = None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def pool_rw(x):
    import flax.linen as nn
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def pool_rs(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def main():
    rng = np.random.default_rng(0)
    B = 128
    for c, s in [(64, 256), (128, 128), (256, 64)]:
        x = jnp.asarray(np.maximum(rng.normal(size=(B, s, s, c)), 0)
                        .astype(np.float32)).astype(jnp.bfloat16)

        for name, pool in [("reduce_window", pool_rw), ("reshape", pool_rs)]:
            def loss(x):
                return jnp.sum(pool(x).astype(jnp.float32) ** 2)
            dt_f = t(pool, x)
            dt_b = t(jax.grad(loss), x)
            print(json.dumps({"pool": name, "shape": [B, s, s, c],
                              "fwd_ms": round(dt_f * 1e3, 3),
                              "fwdbwd_ms": round(dt_b * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
