"""A/B: CM-UNet composed train step with the bank matmul view tail vs the
default scale_translate crop (round-3 VERDICT item 6 — "point the
moco_fast machinery at cmunet and measure").

Per the round-3 lesson (RESULTS "composed-vs-isolated"), the comparison is
the FULL composed train step (views + masked encoder + dual decoders +
InfoNCE + EMA post_update), not the view stage in isolation — XLA overlap
decides the outcome. Also prints the isolated two-view pipeline for
attribution. One JSON line at the end for harvest.

Usage: python tools/ab_cmunet_views.py [--out artifacts/r4/ab_cmunet.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64  # the cmunet preset trains at global 256; 64 is the r4 recipe
SIZE = 256
VIEW = 224


def _sync(x):
    float(jnp.ravel(x)[0])  # one-scalar sync (tunnel-safe; see ab_moco_aug)


def _time(fn, *args, n=12, warmup=4, repeats=3, thread_state=False):
    out = None
    st = args[0] if thread_state else None
    for _ in range(warmup):
        if thread_state:
            st, out = fn(st, *args[1:])
        else:
            out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            if thread_state:
                st, out = fn(st, *args[1:])
            else:
                out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cmx.ops.augment import cmunet_two_views_batch
    from cmx.ssl.cmunet import CMUNetOnline, init_cmunet_extra, make_cmunet_task
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState
    from cmx.train.trainer import make_train_step

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((BATCH, SIZE, SIZE), dtype=np.float32))
    key = jax.random.key(0)
    results = {}

    # isolated two-view pipeline
    for impl in ("scale_translate", "bank"):
        f = jax.jit(lambda k, b, impl=impl: cmunet_two_views_batch(
            k, b, VIEW, 31, crop_impl=impl))
        dt = _time(f, key, imgs)
        results[f"views_{impl}_ms"] = round(dt * 1e3, 2)
        print(f"# views {impl}: {dt * 1e3:.2f} ms/batch", flush=True)

    # composed train step
    for impl in ("scale_translate", "bank"):
        model = CMUNetOnline(dtype=jnp.bfloat16)
        task, _ = make_cmunet_task(
            model, mask_ratio=0.65, patch_size=16, view_size=VIEW,
            augment=True, crop_impl=impl)
        variables = model.init(jax.random.key(0), imgs[:1, :VIEW, :VIEW],
                               jnp.ones((1, VIEW, VIEW)))
        tx = make_optimizer("adamw", 1.5e-4, weight_decay=0.05,
                            params_example=variables["params"])
        extra = init_cmunet_extra(jax.random.key(1), variables["params"],
                                  variables["batch_stats"])
        state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"],
            tx=tx, extra=extra, rng=jax.random.key(2))
        step = make_train_step(task, tx, donate=True)
        dt = _time(step, state, imgs, thread_state=True)
        results[f"step_{impl}_img_s"] = round(BATCH / dt, 1)
        print(f"# composed step {impl}: {BATCH / dt:.1f} img/s "
              f"({dt * 1e3:.1f} ms)", flush=True)

    results["speedup_composed"] = round(
        results["step_bank_img_s"] / results["step_scale_translate_img_s"], 4)
    line = json.dumps(results)
    print(line)
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
