"""The single config system (replaces the reference's five).

Reference config surfaces unified here (SURVEY §5 "Config / flag system"):
argparse grids (Finetuning/train.py:229-238), class-attr config
(Transformation_based/config.py:5-56), Tap typed args
(Spark/utils/arg_util.py:16-93), Lightning add_model_specific_args
(moco2_module.py:351-395), mmengine python Config + --cfg-options dotted
overrides (training/train.py:27-35).

Design: nested frozen-ish dataclasses + `apply_overrides(cfg, ["a.b=1"])`
dotted-path CLI overrides (the mmengine --cfg-options ergonomics) + asdict
round-trip for logging/checkpoint metadata.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass
class DataConfig:
    data_dir: str = "dataset"
    image_size: int = 256
    ratio: float = 0.1  # fine-tune fraction of full corpus (train.py --ratio)
    synthetic: bool = False  # use generated corpus when no dataset present
    synthetic_n: int = 64
    synthetic_hard: bool = False  # transfer-experiment generator (make_sample_hard)
    # Corpus-seed axis for robustness columns (round-2 VERDICT item 8):
    # seed s>0 resolves data_dir -> f"{data_dir}_s{s}" (the runs/hard400_s1
    # convention) and seeds synthetic generation with s. Replaces the
    # bespoke write_corpus preambles of the session runner scripts.
    corpus_seed: int = 0
    num_prefetch: int = 2
    # extra unlabeled pretraining data (the reference's --arcade option,
    # Genesis_Chest_CT.py:31-41 / Spark arg_util.py): a directory of .npy
    # images appended to the pretrain pool.
    extra_data_dir: str = ""
    native_loader: bool = True  # use the C++ corpus loader when available
    # Keep the pretrain corpus resident in HBM (replicated over the mesh) and
    # gather batches on device — removes the per-step host->device image
    # upload, which dominates real training through the remote-TPU tunnel.
    # Single-process only; host feed is used when the corpus exceeds the cap
    # or jax.process_count() > 1.
    device_feed: bool = True
    device_feed_max_bytes: int = 4 << 30


@dataclass
class ModelConfig:
    out_classes: int = 2
    up_sample_mode: str = "conv_transpose"
    dtype: str = "bfloat16"  # compute dtype; params always fp32
    fused_conv: bool = False  # Pallas fused DoubleConv at the >=128^2 stages
    # (cmx/ops/fused_conv.py); training-mode only, param-tree identical
    # Selective rematerialization: comma-separated block names (e1..e4,
    # bneck, d1..d4) whose activations are recomputed in backward instead
    # of stored — trades cheap high-res FLOPs for the HBM temps that gate
    # batch >128 (RESULTS.md round 2). "" = store everything.
    remat: str = ""


@dataclass
class OptimConfig:
    name: str = "adamw"  # sgd | adamw | lamb | lars
    lr: float = 1.5e-4
    base_lr_scaled: bool = False  # lr = lr * global_batch / 256
    weight_decay: float = 0.05
    wd_end: Optional[float] = None  # cosine wd annealing target (SparK .04->.2)
    momentum: float = 0.9
    clip_norm: Optional[float] = 5.0
    warmup_epochs: int = 0


@dataclass
class TrainConfig:
    epochs: int = 128
    batch_size: int = 32  # GLOBAL batch
    seed: int = 42
    log_every: int = 50
    ckpt_dir: str = "checkpoints"
    save_every_epoch: bool = False
    resume: bool = True
    # Genesis-style early stopping (Genesis_Chest_CT.py:160-176):
    # patience 0 disables; val_fraction carves a validation slice from the
    # pretrain pool for the best-val checkpoint gate.
    patience: int = 0
    val_fraction: float = 0.1
    # Min epochs between best-val checkpoint saves (resume granularity
    # only — the exported encoder is always the final state). A full orbax
    # save is ~45 s on the single-core host; 1 restores the save-every-
    # improvement behavior (Genesis_Chest_CT.py:160-176 keeps best-only).
    best_save_every: int = 10
    tensorboard: bool = False
    profile_dir: str = ""  # capture a jax.profiler trace of one epoch
    tee: bool = False  # mirror stdout/stderr into the run dir (misc.py:72-86)
    # Compile epoch segments as one lax.scan device program (needs the
    # device-resident feed). Through the remote-TPU tunnel the per-step
    # host loop pays a dispatch round-trip per step (RESULTS.md round 3:
    # 308 vs ~390 img/s); the scan path batches ~scan_budget samples of
    # device time per dispatch (~8 s — larger single dispatches trip the
    # remote worker watchdog).
    scan: bool = True
    scan_budget: int = 3072  # samples per scan dispatch


@dataclass
class TaskConfig:
    name: str = "supervised"  # supervised|genesis|mae|moco|spark|cmunet
    mask_ratio: float = 0.6
    patch_size: int = 16
    temperature: float = 0.07
    ema_momentum: float = 0.996
    num_negatives: int = 65536
    view_size: int = 224
    # MoCo rotation formulation: "nearest" (reference-faithful pointwise
    # gather, torchvision RandomRotation NEAREST) or "shear3" (rot90 +
    # three-shear, gather-free — see cmx/ops/augment.py and the round-5
    # MoCo profile in RESULTS.md). Same angle distribution either way.
    rotation_method: str = "nearest"
    # MoCo crop resample: "linear" = torchvision RandomResizedCrop's default
    # BILINEAR (the reference passes no interpolation,
    # moco_data_module.py:123); "cubic" = the pre-2026-08-18 cmx behavior
    # (see cmx/ops/augment.py CROP_METHOD note and RESULTS.md).
    crop_method: str = "linear"
    # MoCo crop execution: "scale_translate" = jax.image.scale_and_translate;
    # "einsum" = the same separable weight matrices as two explicit batched
    # dots (identical linear map, fp round-off only); "einsum_bf16" = bf16
    # dots with fp32 accumulation (documented numeric deviation); "pallas" =
    # fused VMEM kernel (exact, opt-in); "bank" = integer crop windows
    # (torchvision's own get_params quantization) with weights fetched from
    # a precomputed per-extent bank by one-hot matmuls — removes the
    # per-sample weight-construction floor (RESULTS crop2/round 3);
    # "bank_fused" = bank crop + blur + flips composed into two batched
    # matmuls per axis (exact linear map of the per-stage chain up to fp32
    # round-off; the bank's window quantization is the only deviation).
    # See cmx/ops/augment.py CROP_IMPL.
    crop_impl: str = "scale_translate"
    full_unet: bool = True
    augment: bool = True
    # SparK: fused Pallas loss tail (cmx.ops.pallas_ops); A/B'd on TPU in
    # RESULTS.md round 2. Interpret-mode on CPU, compiled on TPU.
    pallas_loss: bool = False
    # Genesis distortion rates (Transformation_based/config.py:35-40
    # defaults). Exposed for the round-3 objective-composition ablation:
    # on the hard-synthetic corpus ~77% of the chain's MSE mass is the
    # global Bezier intensity remap (tools/probe_genesis_difficulty.py),
    # which is invertible per-image with zero shape knowledge.
    genesis_flip_rate: float = 0.4
    genesis_local_rate: float = 0.5
    genesis_nonlinear_rate: float = 0.9
    genesis_paint_rate: float = 0.9
    genesis_inpaint_rate: float = 0.2
    # MAE ablations (VERDICT round-1 item 3): loss on masked patches only
    # (standard MAE objective) vs the reference's full-image MSE
    # (Genesis_Chest_CT.py:122-125); shared_mask restores the reference's
    # mask[0]-reused-across-batch quirk (utils.py:206).
    masked_loss_only: bool = False
    shared_mask: bool = False


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    task: TaskConfig = field(default_factory=TaskConfig)


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        lowered = s.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("none", "null"):
            return None
        return s


def apply_overrides(cfg: Any, overrides: Sequence[str]) -> Any:
    """Apply 'a.b.c=value' overrides in place; returns cfg.

    Unknown keys raise — same strictness as mmengine's merge.
    """
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        path, _, raw = ov.partition("=")
        keys = path.strip().split(".")
        obj = cfg
        for k in keys[:-1]:
            if not hasattr(obj, k):
                raise KeyError(f"unknown config path {path!r} (at {k!r})")
            obj = getattr(obj, k)
        leaf = keys[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown config path {path!r} (at {leaf!r})")
        setattr(obj, leaf, _parse_value(raw.strip()))
    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def display(cfg: Any) -> str:
    """Pretty multi-line dump (the reference config.display(),
    Transformation_based/config.py:50-56)."""
    lines = []
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            lines.append(f"[{f.name}]")
            for g in dataclasses.fields(v):
                lines.append(f"  {g.name} = {getattr(v, g.name)!r}")
        else:
            lines.append(f"{f.name} = {v!r}")
    return "\n".join(lines)
