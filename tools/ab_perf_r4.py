"""Round-4 perf experiments on the real TPU (VERDICT items 1-2).

Subcommands (each a short independent run; XLA flags must be set per
process, so the flag sweep is driven by a shell loop around `step`):

  remat   — selective-remat x batch grid on the SparK step: does remat of
            the L1/L2/d1 stages unlock batch 256, and at what cost?
  step    — one SparK step config (env XLA_FLAGS applies): --batch,
            --remat; prints one JSON line. For the conv-backward flag sweep.
  cmunet  — CM-UNet step breakdown: full step, fwd-only, no-aug, no-EMA,
            online-only (no target forward), projector-free; finds where
            the 299-vs-384 img/s gap lives.
  moco    — MoCo v2 step breakdown (round-5): full step, fwd-only,
            aug-only (the two 224² view pipelines), XLA cost analysis;
            MoCo has NO decoder so its FLOP ceiling is far higher than
            SparK's — is 346 img/s leaving real headroom on the table?

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/ab_perf_r4.py <cmd>
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256


def _sync(x):
    float(np.asarray(jax.device_get(x)).ravel()[0])


def _time(fn, *args, n=12, warmup=4, repeats=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def build_spark(batch, remat=(), donate=False):
    from cmx.ssl.spark import SparKModel, make_spark_task
    from cmx.ops.masking import spark_active_mask
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState
    from cmx.train.trainer import make_train_step

    model = SparKModel(mask_ratio=0.6, full_unet=True, dtype=jnp.bfloat16,
                       remat_levels=tuple(remat))
    task, _ = make_spark_task(model, augment=True, input_size=SIZE)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE)).astype(np.float32))
    active0 = spark_active_mask(jax.random.key(1), 1, SIZE // 16, 0.6)
    variables = model.init(jax.random.key(0), imgs[:1], active0)
    tx = make_optimizer("lamb", 2e-4, weight_decay=0.04, clip_norm=5.0,
                        params_example=variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=tx, rng=jax.random.key(2))
    step = make_train_step(task, tx, donate=donate)
    return step, state, imgs


def run_one(batch, remat, donate=False):
    label = ",".join(remat) if remat else "none"
    try:
        step, state, imgs = build_spark(batch, remat, donate=donate)
        if donate:
            # donation needs the state rebound each call
            def f(st):
                st, m = step(st, imgs)
                return st, m
            for _ in range(4):
                state, m = f(state)
            _sync(m["loss"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(12):
                    state, m = f(state)
                _sync(m["loss"])
                best = min(best, time.perf_counter() - t0)
            dt = best / 12
        else:
            dt = _time(lambda: step(state, imgs))
        r = {"remat": label, "batch": batch, "step_ms": round(dt * 1e3, 1),
             "img_s": round(batch / dt, 1)}
    except Exception as e:  # noqa: BLE001 — OOM comes wrapped in various types
        msg = str(e)
        r = {"remat": label, "batch": batch,
             "error": ("OOM" if ("RESOURCE_EXHAUSTED" in msg or "500" in msg
                                 or "memory" in msg.lower()) else msg[:200])}
    print(json.dumps(r), flush=True)
    return r


def cmd_remat(args):
    grid = [
        ((), 128),
        (("e1",), 128),
        (("e1", "e2"), 128),
        (("e1", "e2", "d1"), 128),
        (("e1", "e2", "d1", "d2"), 128),
        (("e1", "e2"), 256),
        (("e1", "e2", "d1"), 256),
        (("e1", "e2", "d1", "d2"), 256),
        (("e1", "e2", "e3", "d1", "d2"), 256),
    ]
    for remat, batch in grid:
        run_one(batch, remat, donate=(batch >= 256))


def cmd_step(args):
    remat = tuple(s for s in args.remat.split(",") if s)
    run_one(args.batch, remat, donate=args.donate)


def cmd_cmunet(args):
    """One variant per process (~2 GB of state + executables each; holding
    several at once OOMs the 16 GB HBM). Drive with:
      for v in full fwd_only no_aug no_ema cost; do
        python -u tools/ab_perf_r4.py cmunet --variant $v; done
    """
    from cmx.ssl.cmunet import CMUNetOnline, init_cmunet_extra, make_cmunet_task
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState
    from cmx.train.trainer import make_train_step

    batch = args.batch
    view = 224
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE)).astype(np.float32))

    variant = args.variant
    kw = {"no_aug": {"augment": False},
          "no_ema": {"base_momentum": 1.0}}.get(variant, {})
    model = CMUNetOnline(dtype=jnp.bfloat16)
    task, _ = make_cmunet_task(model, mask_ratio=0.6, patch_size=16,
                               temperature=0.07, view_size=view, **kw)
    variables = model.init(jax.random.key(0), imgs[:1, :view, :view],
                           jnp.ones((1, view, view)))
    extra = init_cmunet_extra(jax.random.key(1), variables["params"],
                              variables["batch_stats"])
    tx = make_optimizer("adamw", 2e-4, weight_decay=0.04, clip_norm=5.0,
                        params_example=variables["params"])
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              tx=tx, extra=extra, rng=jax.random.key(2))
    del variables

    if variant == "fwd_only":
        lf = jax.jit(lambda p, s, b, k: task.loss_fn(p, s, b, k)[0])
        dt = _time(lambda: lf(state.params, state, imgs, jax.random.key(3)))
    elif variant == "cost":
        step = make_train_step(task, tx, donate=True)
        ca = step.lower(state, imgs).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(json.dumps({
            "config": "cost",
            "gflop_per_img": round(ca.get("flops", 0) / batch / 1e9, 1),
            "hbm_mb_per_img": round(ca.get("bytes accessed", 0) / batch / 1e6, 1),
        }), flush=True)
        return
    else:
        step = make_train_step(task, tx, donate=True)

        def f(st):
            return step(st, imgs)

        for _ in range(4):
            state, m = f(state)
        _sync(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(12):
                state, m = f(state)
            _sync(m["loss"])
            best = min(best, time.perf_counter() - t0)
        dt = best / 12
    print(json.dumps({"config": variant, "step_ms": round(dt * 1e3, 1),
                      "img_s": round(batch / dt, 1)}), flush=True)


def cmd_moco(args):
    """Variants: full | fwd_only | aug_only | no_aug | cost. Drive with:
      for v in full fwd_only aug_only no_aug cost; do
        python -u tools/ab_perf_r4.py moco --variant $v; done
    no_aug feeds pre-augmented 224² views straight into the step (aug
    removed from the compiled program, FLOPs otherwise identical), so
    full - no_aug isolates what the in-step aug REALLY costs after fusion.
    """
    from cmx.ops import augment as _aug
    from cmx.ops.augment import moco_view_aug, vmap_aug
    from cmx.ssl.moco import init_moco_extra, make_moco_task
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState
    from cmx.train.trainer import make_train_step

    # --rot flips the module-level default so BOTH the aug_only probe and
    # the task built below (rotation_method=None -> global) use it.
    _aug.ROTATION_METHOD = args.rot

    batch, view = args.batch, 224
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE)).astype(np.float32))
    variant = args.variant

    if variant == "aug_only":
        def aug2(key, im):
            kq, kk = jax.random.split(key)
            return (vmap_aug(moco_view_aug, kq, im, view),
                    vmap_aug(moco_view_aug, kk, im, view))
        f = jax.jit(aug2)
        dt = _time(lambda: f(jax.random.key(3), imgs))
        print(json.dumps({"config": variant, "step_ms": round(dt * 1e3, 1)}),
              flush=True)
        return

    task, model = make_moco_task(augment=variant != "no_aug",
                                 view_size=view)
    feed = imgs
    if variant == "no_aug":
        # pre-cropped views; the step sees (B,224,224) like the aug output
        feed = imgs[:, :view, :view]
    variables = model.init(jax.random.key(0), feed[:1, :view, :view])
    extra = init_moco_extra(jax.random.key(1), variables["params"],
                            variables["batch_stats"])
    tx = make_optimizer("sgd", 0.03, params_example=variables["params"])
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              tx=tx, extra=extra, rng=jax.random.key(2))
    del variables

    if variant == "fwd_only":
        lf = jax.jit(lambda p, s, b, k: task.loss_fn(p, s, b, k)[0])
        dt = _time(lambda: lf(state.params, state, feed, jax.random.key(3)))
    elif variant == "cost":
        step = make_train_step(task, tx, donate=True)
        ca = step.lower(state, feed).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(json.dumps({
            "config": "cost",
            "gflop_per_img": round(ca.get("flops", 0) / batch / 1e9, 1),
            "hbm_mb_per_img": round(ca.get("bytes accessed", 0) / batch / 1e6, 1),
        }), flush=True)
        return
    else:
        step = make_train_step(task, tx, donate=True)

        def f(st):
            return step(st, feed)

        for _ in range(4):
            state, m = f(state)
        _sync(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(12):
                state, m = f(state)
            _sync(m["loss"])
            best = min(best, time.perf_counter() - t0)
        dt = best / 12
    print(json.dumps({"config": variant, "step_ms": round(dt * 1e3, 1),
                      "img_s": round(batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("remat")
    p = sub.add_parser("step")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--remat", default="")
    p.add_argument("--donate", action="store_true")
    p = sub.add_parser("cmunet")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variant", default="full",
                   choices=["full", "fwd_only", "no_aug", "no_ema", "cost"])
    p = sub.add_parser("moco")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variant", default="full",
                   choices=["full", "fwd_only", "aug_only", "no_aug", "cost"])
    p.add_argument("--rot", default="nearest", choices=["nearest", "shear3"])
    args = ap.parse_args()
    {"remat": cmd_remat, "step": cmd_step, "cmunet": cmd_cmunet,
     "moco": cmd_moco}[args.cmd](args)
