"""Checkpoint / resume: one orbax format covering the reference's capability
matrix (SURVEY §5 "Checkpoint / resume"):
  * best-metric save (Finetuning/train.py:210-213, Genesis:160-170)
  * every-epoch save with optimizer state + epoch for auto-resume
    (Spark/utils/misc.py:143-189, mmengine resume=True)
  * encoder-only export — the "timm_style" analog (misc.py:159-162) — so any
    pretrain regime's encoder can seed fine-tuning
  * config metadata rides along (SparK's config-carrying state_dict,
    spark.py:171-189)

The five reference on-disk formats collapse into one; `load_encoder` is the
analog of Finetuning/train.py:load_model's 5-way dispatch (240-308) — every
regime exports the same `encoder` subtree, so no format sniffing is needed.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from cmx.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # Best metric persists on disk so a RESUMED run doesn't re-save (and
        # overwrite the historical best) on its first epoch.
        self._best_path = os.path.join(self.directory, "best_metric.json")
        self._best = float("inf")
        if os.path.exists(self._best_path):
            try:
                with open(self._best_path) as f:
                    self._best = float(json.load(f)["best_metric"])
            except (ValueError, KeyError, json.JSONDecodeError):
                pass

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None,
             config: Optional[dict] = None, force: bool = False) -> None:
        self.mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
            metrics=metrics,
            force=force,
        )
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def save_best(self, step: int, state: TrainState, metric: float, **kw) -> bool:
        """Save only when `metric` improves (lower-is-better, like the
        reference's best valid dice_loss gate)."""
        if metric < self._best:
            self._best = metric
            self.save(step, state, metrics={"best_metric": metric}, **kw)
            with open(self._best_path, "w") as f:
                json.dump({"best_metric": metric, "step": step}, f)
            return True
        return False

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)
            ),
        )
        return restored["state"]

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def close(self):
        self.mgr.close()


def export_encoder(state: TrainState, path: str, prefix: str = "encoder") -> None:
    """Encoder-only export (the timm_style analog, Spark/utils/misc.py:159-162).

    Saves the `encoder` params + batch_stats subtrees as an .npz flat dict —
    regime-independent: supervised UNet, SparK, MoCo (online/q branch), and
    CM-UNet online all name their encoder subtree 'encoder'.
    """
    def flatten(tree, root):
        out = {}
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path_keys, leaf in flat:
            name = root + "/" + "/".join(
                str(k.key) if hasattr(k, "key") else str(k) for k in path_keys
            )
            out[name] = np.asarray(leaf)
        return out

    params = state.params
    bs = state.batch_stats
    if prefix in params:
        params = params[prefix]
        bs = bs.get(prefix, {}) if isinstance(bs, dict) else {}
    arrays = {**flatten(params, "params"), **flatten(bs, "batch_stats")}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def export_model(state: TrainState, path: str) -> None:
    """Whole-model export: ALL params + batch_stats as one flat .npz.

    The analog of the reference's whole-model `torch.save(model)`
    (Finetuning/train.py:210-213) — enough to rebuild any model for
    inference/vis without optimizer state or an orbax template.
    """
    export_encoder(
        state.replace(params={"all": state.params},
                      batch_stats={"all": state.batch_stats}),
        path, prefix="all",
    )


def write_stamp(encoder_path: str, config: dict, **info) -> str:
    """Reset-proof provenance stamp for an exported encoder.

    The analog of the reference's dual checkpoint-per-epoch habit
    (Spark/main.py:142-143) adapted to this container's failure mode:
    `runs/` is wiped by container resets while the git-tracked `artifacts/`
    tree survives, so a pretrain that only leaves its encoder under `runs/`
    is one reset away from being unreproducible (round-4 incident:
    fh-genesis-s1/s2 became permanently unrunnable). The stamp records
    everything needed to (a) re-key experiment queues on a file that
    survives resets and (b) verify/rebuild the encoder: the full config,
    the encoder's content hash, and the final training metrics. Written to
    `<encoder_path>.stamp.json`; queue posts copy it into `artifacts/`.

    Returns the stamp path.
    """
    import hashlib
    import json
    import time as _time

    with open(encoder_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    stamp = {
        "encoder_path": os.path.abspath(encoder_path),
        "encoder_sha256": digest,
        "encoder_bytes": os.path.getsize(encoder_path),
        "config": config,
        "created": _time.strftime("%F %T"),
        **info,
    }
    path = encoder_path + ".stamp.json"
    with open(path, "w") as f:
        json.dump(stamp, f, indent=2, sort_keys=True)
    return path


def load_model_npz(path: str, params: Any, batch_stats: Any):
    """Load an `export_model` .npz into freshly-initialized trees."""
    new_params = load_encoder(path, {"all": params}, {"all": batch_stats},
                              prefix="all")
    return new_params[0]["all"], new_params[1]["all"]


def load_encoder(path: str, params: Any, batch_stats: Any, prefix: str = "encoder"):
    """Load an exported encoder into a model's (params, batch_stats) trees.

    The analog of Finetuning/train.py:load_model (240-308) minus the 5-way
    format sniffing — one format in, one subtree out.
    """
    data = np.load(path)

    def inject(tree, root):
        def visit(subtree, keys):
            if isinstance(subtree, dict):
                return {k: visit(v, keys + [k]) for k, v in subtree.items()}
            name = root + "/" + "/".join(keys)
            if name in data.files:
                return jax.numpy.asarray(data[name])
            return subtree

        return visit(tree, [])

    new_params = dict(params)
    new_bs = dict(batch_stats)
    if prefix in new_params:
        new_params[prefix] = inject(new_params[prefix], "params")
        if prefix in new_bs:
            new_bs[prefix] = inject(new_bs[prefix], "batch_stats")
    else:
        new_params = inject(new_params, "params")
        new_bs = inject(new_bs, "batch_stats")
    return new_params, new_bs
