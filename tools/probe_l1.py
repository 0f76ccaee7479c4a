"""L1 bandwidth/layout probes on the real TPU (VERDICT item 1c groundwork).

Round-2 measured the L1 DoubleConv (256^2 x 64ch) at 26% MFU with time ~=
HBM traffic; the open question is whether that traffic is LOGICAL bytes at
speed-of-light (nothing to win without fusion) or carries a layout tax on
the 64-channel minor dim (then space-to-depth to 128^2 x 256ch wins).

Probes (b128, bf16):
  1. copy-bandwidth of (B,256,256,64) vs (B,256,256,128)@half-B vs flat —
     same logical bytes, different minor dims.
  2. conv 3x3 64->64 @256^2 vs the SAME FLOPs as 3x3 256->256 @128^2 and
     2x2 256->256 @128^2 (s2d-shaped) — MXU efficiency by shape.
  3. L1-like DoubleConv fwd+bwd vs an s2d-layout equivalent cost model.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Barrier via a ONE-ELEMENT host transfer. np.asarray(out) would pull
    the whole buffer through the axon tunnel (~seconds/GB) and dominate the
    measurement; a device-side slice moves 4 bytes."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.reshape(leaf, (-1,))[0].astype(jnp.float32))


def t(fn, *args, n=20, warmup=5):
    f = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def report(name, dt, logical_gb=None, gflop=None):
    r = {"probe": name, "ms": round(dt * 1e3, 2)}
    if logical_gb is not None:
        r["GBps_effective"] = round(logical_gb / dt, 0)
    if gflop is not None:
        r["TFLOPS"] = round(gflop / dt / 1e3, 1)
        r["mfu_pct"] = round(100 * gflop / dt / 1e3 / 197, 1)
    print(json.dumps(r), flush=True)


def main():
    B = 128
    rng = np.random.default_rng(0)

    # -- probe 1: pure copy bandwidth by minor-dim width
    for name, shape in [
        ("copy_256x256x64", (B, 256, 256, 64)),
        ("copy_128x128x256", (B, 128, 128, 256)),
        ("copy_halfB_256x256x128", (B // 2, 256, 256, 128)),
        ("copy_flat", (B, 256 * 256 * 64)),
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(jnp.bfloat16)
        gb = 2 * x.size * 2 / 1e9  # read + write
        dt = t(lambda a: a + jnp.bfloat16(1.0), x)
        report(name, dt, logical_gb=gb)

    # -- probe 2: conv MXU efficiency by shape (equal logical FLOPs where noted)
    def conv(x, w, strides=(1, 1)):
        return jax.lax.conv_general_dilated(
            x, w, strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    cfgs = [
        # (name, in-shape, kernel)
        ("conv3x3_64_64_@256", (B, 256, 256, 64), (3, 3, 64, 64)),
        ("conv3x3_256_256_@128", (B, 128, 128, 256), (3, 3, 256, 256)),
        ("conv2x2_256_256_@128", (B, 128, 128, 256), (2, 2, 256, 256)),
        ("conv3x3_1_64_@256", (B, 256, 256, 1), (3, 3, 1, 64)),
        ("conv3x3_4_256_@128", (B, 128, 128, 4), (3, 3, 4, 256)),
        ("conv3x3_128_128_@128", (B, 128, 128, 128), (3, 3, 128, 128)),
    ]
    for name, xs, ws in cfgs:
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=ws).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        flops = 2 * np.prod(xs[:3]) * np.prod(ws)
        dt = t(conv, x, w)
        report(name, dt, gflop=flops / 1e9)

    # -- probe 3: conv fwd+bwd at the two shapes
    def loss(x, w):
        y = conv(x, w)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    for name, xs, ws in cfgs[:3]:
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=ws).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        flops = 3 * 2 * np.prod(xs[:3]) * np.prod(ws)  # fwd + dx + dw
        dt = t(jax.grad(loss, argnums=(0, 1)), x, w)
        report(name + "_fwdbwd", dt, gflop=flops / 1e9)


if __name__ == "__main__":
    main()
