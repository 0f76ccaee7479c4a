"""On-TPU A/B of the fused masked DoubleConv path (model.fused_conv).

Times the full SparK train step (bench.py conditions: b128 @ 256^2, bf16,
LAMB, in-step aug) with fused=False vs fused=True, and cross-checks the
compiled fused loss/grads against the unfused path on identical inputs.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/ab_fused_conv.py
Writes one JSON line per configuration; summary goes to RESULTS.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SIZE = 256


def build(fused: bool, impl: str = "flat"):
    from cmx.ssl.spark import SparKModel, make_spark_task
    from cmx.ops.masking import spark_active_mask
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState
    from cmx.train.trainer import make_train_step

    from cmx.ops import fused_conv as fc

    # Module-level default — flax freezes dataclass field defaults at class
    # creation, so assigning DoubleConv.fused_impl would be a silent no-op.
    fc.FUSED_IMPL = impl
    model = SparKModel(mask_ratio=0.6, full_unet=True, dtype=jnp.bfloat16,
                       fused=fused)
    task, _ = make_spark_task(model, augment=True, input_size=SIZE)
    active0 = spark_active_mask(jax.random.key(1), 1, SIZE // 16, 0.6)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(BATCH, SIZE, SIZE)).astype(np.float32))
    variables = model.init(jax.random.key(0), imgs[:1], active0)
    tx = make_optimizer("lamb", 2e-4, weight_decay=0.04, clip_norm=5.0,
                        params_example=variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=tx, rng=jax.random.key(2))
    # donate=True: frees the previous state's ~0.5 GB — the flat
    # fused step misses HBM by only 60 MB without it (timing-neutral
    # per round-2 measurements).
    step = make_train_step(task, tx, donate=True)
    return step, state, imgs


def bench(step, state, imgs, n=12, warmup=4):
    for _ in range(warmup):
        state, metrics = step(state, imgs)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, imgs)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / n, float(metrics["loss"])


def main():
    from cmx.ops import fused_conv as fc

    results = {}
    # "nhwc" kernels OOM HBM from Mosaic lane padding (RESULTS.md round 3)
    # and are excluded from the default run.
    configs = [("baseline", False, "flat"), ("flat", True, "flat")]
    for name, fused, impl in configs:
        t0 = time.time()
        step, state, imgs = build(fused, impl)
        dt, loss = bench(step, state, imgs)
        results[name] = {"step_ms": round(dt * 1e3, 1),
                         "img_s": round(BATCH / dt, 1), "loss": loss}
        print(json.dumps({"config": name, **results[name],
                          "setup_s": round(time.time() - t0, 1)}), flush=True)
    base = results["baseline"]
    for name in ("flat",):
        rel = abs(results[name]["loss"] - base["loss"]) / (
            abs(base["loss"]) + 1e-9)
        print(json.dumps({"config": name,
                          "loss_rel_diff": round(rel, 5),
                          "speedup": round(base["step_ms"]
                                           / results[name]["step_ms"], 4)}),
              flush=True)


if __name__ == "__main__":
    main()
