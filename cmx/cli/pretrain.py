"""Pretraining entry point: all five SSL regimes, one CLI.

Replaces the reference's four separate entries (Genesis_Chest_CT.py,
Spark/main.py, moco2_module.py cli_main, CM-UNet dist_train.sh+train.py)
with `python -m cmx.cli.pretrain --task spark [a.b=c ...]`.
"""

from __future__ import annotations

import argparse
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmx.config.config import Config, apply_overrides, display, to_dict
from cmx.parallel.dist import InfiniteBatchSampler, initialize_distributed, process_info
from cmx.parallel.mesh import make_mesh, shard_batch
from cmx.train.optim import make_optimizer
from cmx.train.schedules import cosine_anneal, scaled_base_lr, warmup_cosine
from cmx.train.state import TrainState, param_count
from cmx.train.trainer import make_train_step
from cmx.utils.logging import JsonlLogger, MetricLogger
from cmx.utils.seeding import seed_everything


def build_task(cfg: Config, dtype):
    """Instantiate (task, model, init_fn, extra_fn) for cfg.task.name."""
    t = cfg.task
    remat = tuple(s for s in cfg.model.remat.split(",") if s)

    if t.name == "genesis":
        from cmx.models.unet import UNet
        from cmx.ssl.reconstruction import make_genesis_task

        model = UNet(out_classes=1, dtype=dtype, fused=cfg.model.fused_conv,
                     remat_levels=remat)
        task, _ = make_genesis_task(
            model,
            flip_rate=t.genesis_flip_rate,
            local_rate=t.genesis_local_rate,
            nonlinear_rate=t.genesis_nonlinear_rate,
            paint_rate=t.genesis_paint_rate,
            inpaint_rate=t.genesis_inpaint_rate,
        )
        init = lambda key, x: model.init(key, x[:1])
        extra = None
    elif t.name == "mae":
        from cmx.models.unet import UNet
        from cmx.ssl.reconstruction import make_mae_task

        model = UNet(out_classes=1, dtype=dtype, fused=cfg.model.fused_conv,
                     remat_levels=remat)
        task, _ = make_mae_task(model, mask_ratio=t.mask_ratio,
                                patch_size=t.patch_size,
                                shared_mask=t.shared_mask,
                                masked_loss_only=t.masked_loss_only)
        init = lambda key, x: model.init(key, x[:1])
        extra = None
    elif t.name == "moco":
        from cmx.models.unet import UNetEncoderGAP
        from cmx.ssl.moco import init_moco_extra, make_moco_task

        model = UNetEncoderGAP(dtype=dtype)
        task, _ = make_moco_task(
            model,
            temperature=t.temperature,
            num_negatives=t.num_negatives,
            view_size=t.view_size,
            augment=t.augment,
            rotation_method=t.rotation_method,
            crop_method=t.crop_method,
            crop_impl=t.crop_impl,
        )
        init = lambda key, x: model.init(key, x[:1, : t.view_size, : t.view_size])

        def extra(key, variables):
            return init_moco_extra(
                key, variables["params"], variables["batch_stats"], t.num_negatives
            )
    elif t.name == "spark":
        from cmx.ops.masking import spark_active_mask
        from cmx.ssl.spark import SparKModel, make_spark_task

        model = SparKModel(mask_ratio=t.mask_ratio, full_unet=t.full_unet,
                           dtype=dtype, fused=cfg.model.fused_conv,
                           remat_levels=remat)
        task, _ = make_spark_task(model, augment=t.augment,
                                  input_size=cfg.data.image_size,
                                  pallas_loss=t.pallas_loss)
        def init(key, x):
            f = x.shape[1] // 16
            active = spark_active_mask(key, 1, f, t.mask_ratio)
            return model.init(key, x[:1], active)
        extra = None
    elif t.name == "cmunet":
        from cmx.ssl.cmunet import CMUNetOnline, init_cmunet_extra, make_cmunet_task

        model = CMUNetOnline(dtype=dtype)
        task, _ = make_cmunet_task(
            model,
            mask_ratio=t.mask_ratio,
            patch_size=t.patch_size,
            temperature=t.temperature,
            base_momentum=t.ema_momentum,
            view_size=t.view_size,
            augment=t.augment,
            crop_impl=t.crop_impl,
        )
        init = lambda key, x: model.init(
            key,
            x[:1, : t.view_size, : t.view_size],
            jnp.ones((1, t.view_size, t.view_size)),
        )

        def extra(key, variables):
            return init_cmunet_extra(key, variables["params"], variables["batch_stats"])
    else:
        raise ValueError(f"unknown pretrain task {t.name!r}")
    return task, model, init, extra


def make_device_feed(imgs, mesh, task=None, tx=None, scan=True):
    """Device-resident corpus feed + optional scan-compiled segment runner.

    Returns (corpus_dev, fetch, scan_run):
      * corpus_dev — the whole pretrain corpus device-put replicated over
        the mesh (one upload; whole-image row gathers are in the cheap
        class of TPU gathers, RESULTS.md round 2).
      * fetch(corpus_dev, idx) — jitted on-device batch gather with
        batch-dim out-sharding (the per-step host-loop feed).
      * scan_run(state, idxs) — when scan and a task/tx are given: one
        jitted device program running idxs.shape[0] train steps as a
        lax.scan (gather + step fused; the _fit_scan pattern from
        cmx/train/harness.py). None otherwise.

    Shared by the pretrain CLI and `bench.py --live` so the benchmarked
    path IS the deliverable path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    corpus_dev = jax.device_put(jnp.asarray(imgs), NamedSharding(mesh, P()))
    bat_sh = NamedSharding(
        mesh, P(*((mesh.axis_names[0],) + (None,) * (imgs.ndim - 1))))
    fetch = jax.jit(lambda c, i: jnp.take(c, i, axis=0), out_shardings=bat_sh)
    scan_run = None
    if scan and task is not None:
        inner_step = make_train_step(task, tx, donate=False)

        def _seg(st, idxs):
            def body(st, idx):
                b = jax.lax.with_sharding_constraint(
                    jnp.take(corpus_dev, idx, axis=0), bat_sh)
                return inner_step(st, b)

            return jax.lax.scan(body, st, idxs)

        scan_run = jax.jit(_seg, donate_argnums=(0,))
    return corpus_dev, fetch, scan_run


def load_pretrain_images(cfg: Config) -> np.ndarray:
    from cmx.data.corpus import load_corpus
    from cmx.data.splits import list_corpus, make_splits
    from cmx.data.synthetic import resolve_corpus

    data_dir = resolve_corpus(cfg.data)
    xs, ys = list_corpus(data_dir)
    splits = make_splits(xs, ys, ratio=cfg.data.ratio)
    imgs = None
    if cfg.data.native_loader:
        from cmx.native.loader import load_corpus_native

        imgs = load_corpus_native(splits.pretrain_x, cfg.data.image_size)
    if imgs is None:
        imgs, _ = load_corpus(splits.pretrain_x, None, size=cfg.data.image_size)
    if cfg.data.extra_data_dir:
        # --arcade analog: extra unlabeled images appended to the pool
        extra_paths = [
            os.path.join(cfg.data.extra_data_dir, f)
            for f in sorted(os.listdir(cfg.data.extra_data_dir))
            if f.endswith(".npy")
        ]
        extra, _ = load_corpus(extra_paths, None, size=cfg.data.image_size)
        imgs = np.concatenate([imgs, extra], axis=0)
    return imgs


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default=None,
                   help="genesis|mae|mae_tuned|moco|spark|cmunet "
                        "(mae_tuned requires --preset: it is a preset key "
                        "that resolves task.name back to mae)")
    p.add_argument("--preset", action="store_true",
                   help="start from the reference recipe for --task "
                        "(cmx.config.presets) before applying overrides")
    p.add_argument("--corpus-seed", type=int, default=None,
                   help="corpus-seed axis: sugar for data.corpus_seed=N "
                        "(resolves data_dir -> data_dir_sN, seeds synthetic "
                        "generation)")
    p.add_argument("overrides", nargs="*", help="dotted config overrides a.b=c")
    args = p.parse_args(argv)

    from cmx.utils.compile_cache import enable_default_cache

    enable_default_cache()
    initialize_distributed()
    cfg = Config()
    cfg.task.name = args.task or cfg.task.name
    if args.preset:
        from cmx.config.presets import PRESETS

        cfg = PRESETS[cfg.task.name](cfg)
    apply_overrides(cfg, args.overrides)
    if args.corpus_seed is not None:
        cfg.data.corpus_seed = args.corpus_seed
    print(display(cfg))

    root_key = seed_everything(cfg.train.seed)
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    imgs = load_pretrain_images(cfg)
    n_pretrain_imgs = int(imgs.shape[0])
    rank, world = process_info()
    per_host_batch = cfg.train.batch_size // world
    if world == 1:
        # Data-parallel degree = largest device count dividing the batch
        # (a 4-image batch on an 8-device test mesh fails out-sharding
        # divisibility otherwise; the gcd submesh keeps the fast path).
        k = math.gcd(per_host_batch, len(jax.devices()))
        mesh = make_mesh(jax.devices()[:k])
    else:
        mesh = make_mesh()
    sampler = InfiniteBatchSampler(
        imgs.shape[0], per_host_batch, rank=rank, world_size=world,
        seed=cfg.train.seed,
    )

    task, model, init_fn, extra_fn = build_task(cfg, dtype)
    k_init, k_extra, k_state = jax.random.split(root_key, 3)
    variables = init_fn(k_init, jnp.asarray(imgs[:1]))
    extra = extra_fn(k_extra, variables) if extra_fn else None
    print(f"[{cfg.task.name}] params: {param_count(variables['params'])/1e6:.1f}M")

    steps_per_epoch = sampler.iters_per_epoch
    total_steps = cfg.train.epochs * steps_per_epoch
    lr_peak = (
        scaled_base_lr(cfg.optim.lr, cfg.train.batch_size)
        if cfg.optim.base_lr_scaled
        else cfg.optim.lr
    )
    lr_sched = warmup_cosine(lr_peak, total_steps, cfg.optim.warmup_epochs * steps_per_epoch)
    wd = (
        cosine_anneal(cfg.optim.weight_decay, cfg.optim.wd_end, total_steps)
        if cfg.optim.wd_end is not None
        else cfg.optim.weight_decay
    )
    tx = make_optimizer(
        cfg.optim.name, lr_sched, wd, momentum=cfg.optim.momentum,
        clip_norm=cfg.optim.clip_norm, params_example=variables["params"],
    )
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=tx, extra=extra, rng=k_state,
    )
    from cmx.parallel.mesh import replicate

    # commit the state replicated over the mesh up front: otherwise the first
    # step compiles against uncommitted single-device buffers and the second
    # epoch recompiles against the step's output shardings.
    state = replicate(state, mesh)

    from cmx.ckpt.checkpoint import CheckpointManager, export_encoder, export_model

    ckpt_dir = os.path.join(cfg.train.ckpt_dir, cfg.task.name)
    mgr = CheckpointManager(ckpt_dir)
    if cfg.train.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        # orbax restores to single-device placement; re-replicate over the
        # mesh or the jitted step sees mixed shardings and refuses.
        state = replicate(state, mesh)
        print(f"resumed from step {int(state.step)}")

    if cfg.train.tee:
        # mirror stdout/stderr into the run dir (Spark/utils/misc.py:72-86)
        from cmx.utils.logging import tee_output

        tee_output(ckpt_dir)
    step_fn = make_train_step(task, tx)
    logger = MetricLogger()
    jsonl = JsonlLogger(os.path.join(ckpt_dir, "log.jsonl"))
    tb = None
    if cfg.train.tensorboard:
        from cmx.utils.tensorboard import TensorboardLogger

        tb = TensorboardLogger(os.path.join(ckpt_dir, "tb"))

    # Genesis-style validation slice + early stopping (patience 50 in the
    # reference config; off by default here).
    val_imgs = None
    moco_validate = None
    val_queue = None
    if cfg.train.patience > 0 and imgs.shape[0] > 4:
        n_val = max(per_host_batch, int(imgs.shape[0] * cfg.train.val_fraction))
        n_val = min(n_val, imgs.shape[0] // 2)
        val_imgs, imgs = imgs[:n_val], imgs[n_val:]
        sampler = InfiniteBatchSampler(
            imgs.shape[0], per_host_batch, rank=rank, world_size=world,
            seed=cfg.train.seed,
        )
        steps_per_epoch = sampler.iters_per_epoch

        if cfg.task.name == "moco":
            # MoCo validates against a SEPARATE negatives queue with
            # precision@1/5, like the reference's validation_step
            # (moco2_module.py:311-336) — not a generic train-loss replay.
            from cmx.ssl.moco import init_val_queue, make_moco_validate

            moco_validate = make_moco_validate(
                model, temperature=cfg.task.temperature,
                view_size=cfg.task.view_size, augment=cfg.task.augment,
                rotation_method=cfg.task.rotation_method,
                crop_method=cfg.task.crop_method,
                crop_impl=cfg.task.crop_impl,
            )
            val_queue = init_val_queue(
                jax.random.fold_in(root_key, 97), cfg.task.num_negatives
            )
        else:

            @jax.jit
            def val_loss_fn(state, batch, key):
                loss, _ = task.loss_fn(state.params, state, batch, key)
                return loss

    # Device-resident corpus feed (DataConfig.device_feed): one replicated
    # upload, then an on-device row gather per step. The reference streams
    # every batch host->GPU via DataLoader workers (Spark/utils/dataset.py);
    # through a remote-TPU tunnel that per-step upload is the bottleneck, and
    # whole-image gathers are cheap on TPU (RESULTS.md round-2: patch-level
    # gathers ~3 ms/batch vs ~100 ms of 16 MB upload).
    fetch = None
    scan_run = None
    if (cfg.data.device_feed and world == 1
            and imgs.nbytes <= cfg.data.device_feed_max_bytes):
        # Scan-compiled epoch segments (train.scan): the segment — on-device
        # batch gather + train step — is ONE device program, so live
        # throughput matches bench.py instead of paying a tunnel round-trip
        # per step. Indices are drawn from the SAME InfiniteBatchSampler
        # stream as the host loop (identical batch sequence;
        # tests/test_pretrain_scan.py).
        corpus_dev, fetch, scan_run = make_device_feed(
            imgs, mesh, task=task, tx=tx, scan=cfg.train.scan)
        print(f"device feed: corpus resident ({imgs.nbytes / 1e6:.0f} MB)")

    best_val = float("inf")
    bad_epochs = 0
    last_best_save_ep = -(10**9)
    it = iter(sampler)
    start_ep = int(state.step) // steps_per_epoch
    ep = start_ep - 1  # loop may be empty on a fully-trained resume
    from cmx.utils.profiling import trace

    for ep in range(start_ep, cfg.train.epochs):
        profile_this = cfg.train.profile_dir and ep == start_ep + 1
        t0 = time.time()
        step_metrics = []
        # per-iteration progress (iter/data timing meters) for long epochs —
        # the MetricLogger.log_every surface (Spark/utils/misc.py:289-339);
        # metric VALUES still sync once per epoch below.
        freq = cfg.train.log_every if steps_per_epoch > cfg.train.log_every else 0
        with trace(cfg.train.profile_dir if profile_this else None):
            if scan_run is not None:
                # Segmented scan: each dispatch runs `seg` steps on device.
                seg = max(1, cfg.train.scan_budget // per_host_batch)
                done = 0
                while done < steps_per_epoch:
                    s = min(seg, steps_per_epoch - done)
                    idxs = np.stack([next(it) for _ in range(s)]).astype(np.int32)
                    state, tms = scan_run(state, jnp.asarray(idxs))
                    step_metrics.append(tms)  # dict of (s,) device arrays
                    done += s
            else:
                for _ in logger.log_every(range(steps_per_epoch), freq,
                                          header=f"ep{ep}") if freq else range(steps_per_epoch):
                    idx = next(it)
                    if fetch is not None:
                        batch = fetch(corpus_dev, jnp.asarray(idx))
                    else:
                        batch = shard_batch(jnp.asarray(imgs[idx]), mesh)
                    state, metrics = step_fn(state, batch)
                    step_metrics.append(metrics)  # device arrays; no per-step sync
        # One host transfer per epoch (a float() per step forces a device
        # round-trip per step and dominates small-epoch runs).
        for m in jax.device_get(step_metrics):
            vals = {k: np.atleast_1d(np.asarray(v)) for k, v in m.items()}
            for i in range(next(iter(vals.values())).shape[0]):
                logger.update(**{k: float(v[i]) for k, v in vals.items()})
        dt = time.time() - t0
        epoch_metrics = {k: m.avg for k, m in logger.meters.items()}
        print(f"epoch {ep}: {logger}  ({dt:.1f}s, "
              f"{steps_per_epoch * per_host_batch / dt:.1f} img/s)")

        if val_imgs is not None:
            vb = val_imgs[: (len(val_imgs) // per_host_batch) * per_host_batch]
            if moco_validate is not None:
                vms = []
                for i in range(0, len(vb), per_host_batch):
                    m, val_queue = moco_validate(
                        state, val_queue,
                        shard_batch(jnp.asarray(vb[i : i + per_host_batch]), mesh),
                        jax.random.fold_in(jax.random.key(cfg.train.seed), ep * 10_000 + i),
                    )
                    vms.append(m)
                vms = jax.device_get(vms)
                for k in ("val_loss", "val_acc1", "val_acc5"):
                    epoch_metrics[k] = float(np.mean([m[k] for m in vms]))
                vloss = epoch_metrics["val_loss"]
            else:
                vlosses = [
                    float(val_loss_fn(
                        state,
                        shard_batch(jnp.asarray(vb[i : i + per_host_batch]), mesh),
                        jax.random.fold_in(jax.random.key(cfg.train.seed), ep),
                    ))
                    for i in range(0, len(vb), per_host_batch)
                ]
                vloss = float(np.mean(vlosses))
                epoch_metrics["val_loss"] = vloss
            if vloss < best_val:
                best_val = vloss
                bad_epochs = 0
                # Throttle best-val checkpoint saves (round-4 finding): a
                # full orbax save costs ~45 s on the single-core host, and
                # regimes whose val improves near-monotonically (MAE) were
                # spending >90% of wall time saving. The saved ckpt only
                # feeds --resume (the exported encoder is the FINAL state,
                # below), so coarsening to one save per
                # train.best_save_every epochs changes no training math —
                # a crash just replays a few more epochs.
                if ep - last_best_save_ep >= cfg.train.best_save_every:
                    mgr.save(int(state.step), state, config=to_dict(cfg),
                             metrics={"val_loss": vloss}, force=True)
                    last_best_save_ep = ep
            else:
                bad_epochs += 1
            print(f"  val_loss {vloss:.4f} (best {best_val:.4f}, "
                  f"bad {bad_epochs}/{cfg.train.patience})")
            if bad_epochs >= cfg.train.patience:
                print("early stop")
                break

        jsonl.write(epoch=ep, **epoch_metrics)
        if tb is not None:
            tb.log_dict(epoch_metrics, ep)
        if cfg.train.save_every_epoch or ep == cfg.train.epochs - 1:
            mgr.save(int(state.step), state, config=to_dict(cfg))
    export_encoder(state, os.path.join(ckpt_dir, "encoder.npz"))
    export_model(state, os.path.join(ckpt_dir, "model.npz"))
    # Reset-proof provenance stamp (round-4 VERDICT weak #3): config +
    # corpus identity + encoder content hash + final metrics, written next
    # to the encoder so experiment queues can key on a git-tracked copy and
    # rebuild the encoder after a container reset wipes runs/.
    from cmx.ckpt.checkpoint import write_stamp

    corpus_meta = None
    try:
        from cmx.data.synthetic import resolve_corpus

        corpus_dir = resolve_corpus(cfg.data)
        meta_path = os.path.join(corpus_dir, "meta.json")
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as f:
                corpus_meta = json.load(f)
    except Exception as e:  # stamp must never fail the pretrain itself
        corpus_dir = cfg.data.data_dir
        print(f"stamp: corpus meta unavailable ({e})")
    stamp_path = write_stamp(
        os.path.join(ckpt_dir, "encoder.npz"), to_dict(cfg),
        task=cfg.task.name, corpus_dir=corpus_dir, corpus_meta=corpus_meta,
        n_pretrain_images=n_pretrain_imgs,
        epochs_run=int(ep) + 1,
        final_step=int(state.step),
        best_val_loss=None if best_val == float("inf") else float(best_val),
    )
    if tb is not None:
        tb.close()
    mgr.close()
    print("done; encoder exported to", os.path.join(ckpt_dir, "encoder.npz"))
    print("stamp written to", stamp_path)


if __name__ == "__main__":
    main()
