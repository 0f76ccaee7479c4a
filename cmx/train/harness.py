"""Fine-tuning harness: epoch loop, grid search, K-fold, final test.

Counterpart of Finetuning/train.py's L3 layer:
  * Epoch/TrainEpoch/ValidEpoch meters+loop (81-190) -> run_epoch
  * train(): best-valid-dice checkpointing (193-214)
  * main_finetuning(): LR x EPOCH x BATCH grid, 3-fold KFold (311-378)
  * test(): retrain at best hypers on the full fine-tune set, evaluate on the
    held-out 20% (380-426)
  * find_best_epochs: epoch minimizing dice+CE with inf/NaN backfill
    (Finetuning/utils.py:4-61)

Device metrics (dice/CE/IoU/clDice) come out of the jitted step; host metrics
(Hausdorff, artery radius) are computed per validation epoch on gathered
logits — off the hot path, unlike the reference's per-batch device->host sync
(metrics.py:320-331).
"""

from __future__ import annotations

import itertools
import math
import pickle
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.model_selection import KFold

from cmx.eval import host_metrics
from cmx.eval.metrics import segmentation_metrics
from cmx.models.unet import UNet
from cmx.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from cmx.train.state import TrainState
from cmx.train.supervised import make_eval_fn, make_supervised_task
from cmx.train.trainer import make_train_step
from cmx.utils.logging import AverageMeter


def find_best_epochs(valid_logs: Dict[str, List[float]]) -> int:
    """Epoch minimizing dice_loss + cross_entropy_loss, back-filling inf/NaN
    hausdorff from the previous epoch (Finetuning/utils.py:4-61)."""
    dice = np.asarray(valid_logs["dice_loss"], dtype=np.float64)
    ce = np.asarray(valid_logs["cross_entropy_loss"], dtype=np.float64)
    if "hausdorff" in valid_logs:
        h = np.asarray(valid_logs["hausdorff"], dtype=np.float64)
        for i in range(1, len(h)):
            if not np.isfinite(h[i]):
                h[i] = h[i - 1]
        valid_logs = dict(valid_logs)
        valid_logs["hausdorff"] = h.tolist()
    total = dice + ce
    total = np.where(np.isfinite(total), total, np.inf)
    return int(np.argmin(total))


def _batches(n: int, batch: int, rng: Optional[np.random.Generator], pad_multiple: int = 1):
    idx = rng.permutation(n) if rng is not None else np.arange(n)
    for i in range(0, n, batch):
        chunk = idx[i : i + batch]
        need = max(batch, pad_multiple)
        if len(chunk) < need:
            # pad by wrapping (tiled — the dataset may be smaller than the
            # batch, e.g. the 18-image split) so shapes stay static for jit
            reps = (need - len(chunk) + n - 1) // n + 1
            chunk = np.concatenate([chunk, np.tile(idx, reps)])[:need]
        yield chunk


# Scan-segment budget in (steps x batch) units per dispatch: keeps one
# device program under ~8 s so the remote-TPU worker watchdog never fires.
_SEG_BUDGET = 4096


@dataclass
class FitResult:
    train_logs: Dict[str, List[float]]
    valid_logs: Dict[str, List[float]]
    best_epoch: int
    runtime: float
    state: Any


class _Runner:
    """Compile-once bundle: (model, jitted step, jitted eval, tx).

    The LR grid search / KFold loop runs many short fits; rebuilding the jit
    per fit would recompile every time (the dominant cost on CPU and on the
    TPU remote-compile path). The optimizer LR is an optax injected
    hyperparameter living in opt_state, so every (lr, fold) run reuses ONE
    compiled step."""

    def __init__(self, model: Optional[UNet], augment: bool):
        import optax

        self.model = model or UNet(out_classes=2)
        self.task, _ = make_supervised_task(self.model, augment=augment)
        # Adam, like the reference's fine-tune (Finetuning/train.py:341 and
        # 389 — torch.optim.Adam; the lr grid 1e-2..1e-5 was tuned for it).
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
        self.step = make_train_step(self.task, self.tx, donate=False)
        self.eval_fn = make_eval_fn(self.model)

    def make_state(self, variables, lr: float, seed: int) -> TrainState:
        state = TrainState.create(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=self.tx,
            rng=jax.random.key(seed),
        )
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state


_RUNNERS: Dict[Any, _Runner] = {}


def _model_key(model: Optional[UNet]):
    """Semantic cache key: the hyperparameters that change the compiled step.

    (id(model) would alias a dead model's compiled step to a new model that
    recycled its id.)"""
    if model is None:
        return None
    return (
        type(model).__name__,
        model.out_classes,
        model.up_sample_mode,
        str(model.dtype),
    )


def get_runner(model: Optional[UNet] = None, augment: bool = True) -> _Runner:
    key = (_model_key(model), augment)
    if key not in _RUNNERS:
        _RUNNERS[key] = _Runner(model, augment)
    return _RUNNERS[key]


_METRIC_FN = None


def _jitted_segmentation_metrics():
    """One process-wide jitted metric fn (a fresh jax.jit per eval call would
    recompile every time)."""
    global _METRIC_FN
    if _METRIC_FN is None:
        _METRIC_FN = jax.jit(segmentation_metrics)
    return _METRIC_FN


def evaluate(
    eval_fn, state: TrainState, imgs: np.ndarray, masks: np.ndarray,
    batch: int = 8, host: bool = True,
) -> Dict[str, float]:
    """Full-set eval: device metrics + optional host metrics."""
    meters: Dict[str, AverageMeter] = {}
    n = imgs.shape[0]
    metric_fn = _jitted_segmentation_metrics()
    pending = []  # (real, device-metric-dict) — one host sync at the end
    for i in range(0, n, batch):
        xb = np.asarray(imgs[i : i + batch])
        yb = np.asarray(masks[i : i + batch])
        real = xb.shape[0]
        if real < batch:
            # pad to the fixed batch shape — a ragged last batch would force
            # a fresh jit compile (minutes on the TPU remote-compile path);
            # metrics are computed on the real rows only.
            pad = batch - real
            xb = np.concatenate([xb, xb[:1].repeat(pad, 0)])
            yb = np.concatenate([yb, yb[:1].repeat(pad, 0)])
        logits = eval_fn(state.params, state.batch_stats, jnp.asarray(xb))
        logits = logits[:real]
        yb_real = jnp.asarray(yb[:real])
        m = dict(metric_fn(logits, yb_real))
        if host:
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))
            m["hausdorff"] = host_metrics.hausdorff_metric(
                probs[..., 1], np.asarray(yb_real[..., 1])
            )
            m["radius_arteries"] = host_metrics.radius_arteries_metric(
                np.asarray(logits), np.asarray(yb_real)
            )
        pending.append((real, m))
    # One device->host transfer for all batches: a float() per metric per
    # batch costs a tunnel round-trip each on remote TPU.
    for real, m in jax.device_get(pending):
        for k, v in m.items():
            meters.setdefault(k, AverageMeter()).add(float(v), n=int(real))
    return {k: mt.mean for k, mt in meters.items()}


def _fit_scan(runner, state, imgs_train, masks_train, imgs_valid,
              masks_valid, *, epochs: int, batch: int, seed: int):
    """The whole fit compiled as ONE device program: lax.scan over epochs,
    each iteration = train step(s) + frozen-BN eval on the val set.

    Through a remote-TPU tunnel the host-driven epoch loop pays a dispatch
    round-trip per step and a sync per epoch (seconds each); this runs a
    128-epoch fine-tune in one dispatch (inner lax.scan over the epoch's
    steps, epoch metrics = step means like the host meters). Semantics
    kept from the host loop:
    per-epoch reshuffle (permutation of the n real samples, wrap-tiled to
    the batch — exactly `_batches`), best-state by val dice_loss, logs per
    epoch (the epoch-shuffle RNG stream is jax.random rather than the host
    numpy generator — documented deviation, see PARITY.md). Host metrics
    (hausdorff/radius) are not computed here — callers needing them use
    the host loop.

    Multi-device: the per-step batch is data-parallel-sharded over the
    largest submesh whose size divides `batch` (gcd submesh) via a
    with_sharding_constraint inside the scan, so the global-view SyncBN /
    grad-psum semantics of the host loop are preserved (8-way == 1-way to a
    few fp32 ulps; fp64-exact in the subprocess harness —
    tests/test_distributed_parity.py).
    """
    n = imgs_train.shape[0]
    spe = -(-n // batch)  # steps per epoch, last chunk wrap-padded
    reps = (spe * batch + n - 1) // n
    k = math.gcd(batch, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:k])
    rep_sh, bat_sh = replicated(mesh), batch_sharding(mesh)
    xtr = jax.device_put(jnp.asarray(imgs_train), rep_sh)
    ytr = jax.device_put(jnp.asarray(masks_train), rep_sh)
    xva = jax.device_put(jnp.asarray(imgs_valid), rep_sh)
    yva = jax.device_put(jnp.asarray(masks_valid), rep_sh)
    state = jax.device_put(state, rep_sh)
    base_key = jax.random.key(np.uint32(seed) ^ np.uint32(0x5EED))
    step = runner.step
    eval_fn = runner.eval_fn
    metric_fn = segmentation_metrics

    def epoch_body(carry, ep):
        st, best_metric, best_params, best_bs = carry
        perm = jax.random.permutation(jax.random.fold_in(base_key, ep), n)
        chunks = jnp.tile(perm, reps)[:spe * batch].reshape(spe, batch)

        def step_body(st, chunk):
            xb = jax.lax.with_sharding_constraint(xtr[chunk], bat_sh)
            yb = jax.lax.with_sharding_constraint(ytr[chunk], bat_sh)
            return step(st, (xb, yb))

        st, tms = jax.lax.scan(step_body, st, chunks)
        tm = jax.tree.map(lambda v: jnp.mean(v, axis=0), tms)
        logits = eval_fn(st.params, st.batch_stats, xva)
        vm = metric_fn(logits, yva)
        better = vm["dice_loss"] < best_metric
        best_metric = jnp.where(better, vm["dice_loss"], best_metric)
        best_params = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), st.params, best_params)
        best_bs = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), st.batch_stats, best_bs)
        return (st, best_metric, best_params, best_bs), (tm, vm)

    def run(carry, e0, seg):
        (st, bm, bp, bbs), (tms, vms) = jax.lax.scan(
            epoch_body, carry, jnp.arange(seg) + e0)
        return (st, bm, bp, bbs), tms, vms

    # Segment the scan: one giant dispatch (~30+ s of device time for the
    # wide splits) trips the remote-TPU worker watchdog ("TPU worker
    # process crashed or restarted"); ~8 s segments reuse one compiled
    # program with the epoch offset as a traced argument.
    seg = int(np.clip(_SEG_BUDGET // max(spe * batch, 1), 8, epochs))
    run_seg = jax.jit(run, static_argnums=(2,))
    carry = (state, jnp.inf, state.params, state.batch_stats)
    tparts, vparts = [], []
    e0 = 0
    while e0 < epochs:
        s_len = min(seg, epochs - e0)
        carry, tms, vms = run_seg(carry, jnp.asarray(e0), s_len)
        tparts.append(tms)
        vparts.append(vms)
        e0 += s_len
    st, _, bp, bbs = carry
    state = st.replace(params=bp, batch_stats=bbs)
    tparts, vparts = jax.device_get((tparts, vparts))
    train_logs = {k: [float(x) for p in tparts for x in p[k]]
                  for k in tparts[0]}
    valid_logs = {k: [float(x) for p in vparts for x in p[k]]
                  for k in vparts[0]}
    return state, train_logs, valid_logs


def fit(
    imgs_train: np.ndarray,
    masks_train: np.ndarray,
    imgs_valid: np.ndarray,
    masks_valid: np.ndarray,
    *,
    lr: float = 1e-3,
    epochs: int = 10,
    batch: int = 8,
    seed: int = 42,
    model: Optional[UNet] = None,
    augment: bool = True,
    host_metrics_every: int = 0,
    init_variables: Optional[dict] = None,
    verbose: bool = False,
) -> FitResult:
    """One supervised fine-tune run (the reference's `train`, train.py:193-214).

    Adam(lr) like Finetuning/train.py:341/389; per-epoch valid metrics; best
    state kept by dice_loss. When the fine-tune set fits one batch and no
    host metrics are requested (the reference's 79/1 regime), the whole run
    executes as a single compiled scan (_fit_scan).
    """
    t0 = time.time()
    runner = get_runner(model, augment)
    model = runner.model
    if init_variables is None:
        init_variables = model.init(
            jax.random.key(seed), jnp.asarray(imgs_train[:1])
        )
    state = runner.make_state(init_variables, lr, seed)

    # Scan path: any dataset that fits device memory (they all do here);
    # the host loop remains for host-metric-per-epoch runs.
    if not host_metrics_every and imgs_valid.shape[0] > 0:
        state, train_logs, valid_logs = _fit_scan(
            runner, state, imgs_train, masks_train, imgs_valid, masks_valid,
            epochs=epochs, batch=batch, seed=seed)
        best_ep = find_best_epochs(valid_logs)
        if verbose:
            print(f"scan-fit {epochs} epochs: train {train_logs['loss'][-1]:.4f} "
                  f"best valid dice_loss {min(valid_logs['dice_loss']):.4f}")
        return FitResult(train_logs, valid_logs, best_ep,
                         time.time() - t0, state)

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    step = runner.step
    eval_fn = runner.eval_fn
    host_rng = np.random.default_rng(seed)

    train_logs: Dict[str, List[float]] = {}
    valid_logs: Dict[str, List[float]] = {}
    best = (np.inf, None)
    for ep in range(epochs):
        meters: Dict[str, AverageMeter] = {}
        step_metrics = []
        for chunk in _batches(imgs_train.shape[0], batch, host_rng, n_dev):
            xb = shard_batch(jnp.asarray(imgs_train[chunk]), mesh)
            yb = shard_batch(jnp.asarray(masks_train[chunk]), mesh)
            state, metrics = step(state, (xb, yb))
            step_metrics.append(metrics)  # device arrays; sync once per epoch
        for m in jax.device_get(step_metrics):
            for k, v in m.items():
                meters.setdefault(k, AverageMeter()).add(float(v))
        for k, mt in meters.items():
            train_logs.setdefault(k, []).append(mt.mean)

        do_host = host_metrics_every and ((ep + 1) % host_metrics_every == 0)
        vm = evaluate(eval_fn, state, imgs_valid, masks_valid, batch=batch,
                      host=bool(do_host))
        for k, v in vm.items():
            valid_logs.setdefault(k, []).append(v)
        if vm["dice_loss"] < best[0]:
            best = (vm["dice_loss"], jax.tree.map(np.asarray, (state.params, state.batch_stats)))
        if verbose:
            print(f"epoch {ep}: train {train_logs['loss'][-1]:.4f} "
                  f"valid dice_loss {vm['dice_loss']:.4f}")

    best_ep = find_best_epochs(valid_logs)
    if best[1] is not None:
        bp, bbs = best[1]
        state = state.replace(params=jax.tree.map(jnp.asarray, bp),
                              batch_stats=jax.tree.map(jnp.asarray, bbs))
    return FitResult(train_logs, valid_logs, best_ep, time.time() - t0, state)


def grid_search(
    imgs: np.ndarray,
    masks: np.ndarray,
    *,
    lrs: Sequence[float] = (1e-2, 1e-3, 1e-4, 1e-5),
    epochs_grid: Sequence[int] = (128,),
    batches: Sequence[int] = (32,),
    n_folds: int = 3,
    seed: int = 42,
    results_path: Optional[str] = None,
    init_variables: Optional[dict] = None,
    **fit_kw,
) -> Tuple[float, int, int, List[dict]]:
    """LR x EPOCH x BATCH grid with KFold CV (main_finetuning, train.py:311-378).

    Returns (best_lr, best_batch, best_epochs, all_results)."""
    results = []
    best = (np.inf, None)
    for lr, eps, bs in itertools.product(lrs, epochs_grid, batches):
        fold_scores = []
        fold_logs = []
        kf = KFold(n_splits=n_folds, shuffle=True, random_state=seed)
        for tr_idx, va_idx in kf.split(imgs):
            res = fit(
                imgs[tr_idx], masks[tr_idx], imgs[va_idx], masks[va_idx],
                lr=lr, epochs=eps, batch=bs, seed=seed,
                init_variables=init_variables, **fit_kw,
            )
            be = res.best_epoch
            fold_scores.append(
                res.valid_logs["dice_loss"][be] + res.valid_logs["cross_entropy_loss"][be]
            )
            fold_logs.append({"train_logs": res.train_logs,
                              "valid_logs": res.valid_logs,
                              "best_epoch": be, "runtime": res.runtime})
        score = float(np.mean(fold_scores))
        results.append({"lr": lr, "epochs": eps, "batch": bs,
                        "score": score, "folds": fold_logs})
        if score < best[0]:
            best = (score, (lr, bs, eps))
    if results_path:
        with open(results_path, "wb") as f:
            pickle.dump(results, f)
    lr, bs, eps = best[1]
    return lr, bs, eps, results
