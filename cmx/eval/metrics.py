"""Device-side losses & metrics (Dice, IoU, CE, soft-clDice, ...).

Functional jnp re-design of /root/reference/Finetuning/metrics.py. Everything
here is jit-able and runs on TPU inside the training step — unlike the
reference, which pays a GPU->CPU sync per batch for some metrics
(metrics.py:320-331). Host-only metrics (Hausdorff, artery radius) live in
cmx.eval.host_metrics.

Conventions: predictions are NHWC logits (class axis LAST — the reference is
NCHW with class axis 1); targets are one-hot float NHWC.

Parity notes:
  * The reference trains with `DiceLoss(activation="softmax", threshold=0.5,
    ignore_channels=[0]) + CrossEntropyLoss()` (Finetuning/train.py:455). The
    hard threshold zeroes the Dice gradient, so optimization is CE-driven and
    Dice acts as a selection metric. `dice_loss(..., threshold=0.5)` matches
    this exactly (hard threshold, zero grad); pass `threshold=None` for a
    differentiable soft Dice.
  * f-score / IoU reduce over the WHOLE batch (single tp/fp/fn accumulation),
    as in metrics.py:150-155 — not per-image-then-mean.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- helpers


def softmax_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the class (last) axis — reference `Activation('softmax')`."""
    return jax.nn.softmax(x, axis=-1)


def _apply_activation(x: jnp.ndarray, activation: Optional[str]) -> jnp.ndarray:
    if activation is None or activation == "identity":
        return x
    if activation in ("softmax", "softmax2d"):
        return softmax_channels(x)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation == "logsoftmax":
        return jax.nn.log_softmax(x, axis=-1)
    if activation == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown activation {activation!r}")


def _threshold(x: jnp.ndarray, threshold: Optional[float]) -> jnp.ndarray:
    """Hard binarization; non-differentiable by construction (metrics.py:128-133)."""
    if threshold is None:
        return x
    return (x > threshold).astype(x.dtype)


def _take_channels(
    *xs: jnp.ndarray, ignore_channels: Optional[Sequence[int]]
) -> Sequence[jnp.ndarray]:
    """Drop listed class channels (metrics.py:111-125); channel axis is last."""
    if ignore_channels is None:
        return xs
    n = xs[0].shape[-1]
    keep = [c for c in range(n) if c not in ignore_channels]
    return tuple(x[..., keep] for x in xs)


# ---------------------------------------------------------------- f-score / dice


def f_score(
    pr: jnp.ndarray,
    gt: jnp.ndarray,
    beta: float = 1.0,
    eps: float = 1e-5,
    threshold: Optional[float] = None,
    ignore_channels: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Soft F-beta over the whole batch (metrics.py:135-155)."""
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    fn = jnp.sum(gt) - tp
    b2 = beta * beta
    return ((1 + b2) * tp + eps) / ((1 + b2) * tp + b2 * fn + fp + eps)


def dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    activation: Optional[str] = "softmax",
    threshold: Optional[float] = 0.5,
    ignore_channels: Optional[Sequence[int]] = (0,),
    eps: float = 1e-5,
    beta: float = 1.0,
) -> jnp.ndarray:
    """1 - f_score. Defaults mirror Finetuning/train.py:455/459."""
    pr = _apply_activation(logits, activation)
    return 1.0 - f_score(
        pr, target, beta=beta, eps=eps, threshold=threshold,
        ignore_channels=ignore_channels,
    )


def iou_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    activation: Optional[str] = "softmax",
    threshold: Optional[float] = 0.5,
    ignore_channels: Optional[Sequence[int]] = (0,),
    eps: float = 1e-7,
) -> jnp.ndarray:
    """1 - IoU (metrics.py:182-220)."""
    pr = _apply_activation(logits, activation)
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, target, ignore_channels=ignore_channels)
    inter = jnp.sum(gt * pr)
    union = jnp.sum(gt) + jnp.sum(pr) - inter + eps
    return 1.0 - (inter + eps) / union


# ---------------------------------------------------------------- cross entropy


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Pixelwise CE with probabilistic (one-hot float) targets, mean-reduced.

    torch `CrossEntropyLoss()(pred_NCHW, onehot_NCHW)` semantics
    (Finetuning/train.py:455): -sum_c target_c * log_softmax(pred)_c averaged
    over batch and pixels.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """NLL given log-probabilities and one-hot targets (metrics.py:523-543)."""
    return -jnp.mean(jnp.sum(target * log_probs, axis=-1))


def bce_with_logits_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    z = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z))))


def label_smooth_loss(
    logits: jnp.ndarray, target: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Label-smoothed CE with one-hot targets (the registered-but-unused
    LabelSmoothLoss of cmae/models/losses/label_smooth_loss.py:11-144)."""
    n = logits.shape[-1]
    smoothed = target * (1.0 - smoothing) + smoothing / n
    return cross_entropy_loss(logits, smoothed)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


# ---------------------------------------------------------------- soft skeleton


def _soft_erode(img: jnp.ndarray) -> jnp.ndarray:
    """min over 3x1 and 1x3 windows — -maxpool(-x) (metrics.py:454-459), NHWC."""
    from flax.linen import max_pool

    p1 = -max_pool(-img, (3, 1), strides=(1, 1), padding=((1, 1), (0, 0)))
    p2 = -max_pool(-img, (1, 3), strides=(1, 1), padding=((0, 0), (1, 1)))
    return jnp.minimum(p1, p2)


def _soft_dilate(img: jnp.ndarray) -> jnp.ndarray:
    from flax.linen import max_pool

    return max_pool(img, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _soft_open(img: jnp.ndarray) -> jnp.ndarray:
    return _soft_dilate(_soft_erode(img))


def soft_skeletonize(img: jnp.ndarray, num_iter: int = 10) -> jnp.ndarray:
    """Iterative morphological soft skeleton (metrics.py:447-492), NHWC.

    Pure max-pool morphology — maps directly onto the VPU; the loop is a
    `lax.fori_loop` so XLA compiles one program regardless of num_iter.
    """
    skel = jax.nn.relu(img - _soft_open(img))

    def body(_, carry):
        img, skel = carry
        img = _soft_erode(img)
        delta = jax.nn.relu(img - _soft_open(img))
        skel = skel + jax.nn.relu(delta - skel * delta)
        return img, skel

    _, skel = jax.lax.fori_loop(0, num_iter, body, (img, skel))
    return skel


def soft_cldice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    activation: Optional[str] = "softmax",
    threshold: Optional[float] = 0.5,
    ignore_channels: Optional[Sequence[int]] = (0,),
    num_iter: int = 10,
    smooth: float = 1.0,
) -> jnp.ndarray:
    """Soft clDice (metrics.py:401-429; defaults from train.py:464)."""
    pr = _apply_activation(logits, activation)
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, target, ignore_channels=ignore_channels)
    skel_pr = soft_skeletonize(pr, num_iter=num_iter)
    skel_gt = soft_skeletonize(gt, num_iter=num_iter)
    tprec = (jnp.sum(skel_pr * gt) + smooth) / (jnp.sum(skel_pr) + smooth)
    tsens = (jnp.sum(skel_gt * pr) + smooth) / (jnp.sum(skel_gt) + smooth)
    return 1.0 - 2.0 * (tprec * tsens) / (tprec + tsens)


def soft_dice(y_true: jnp.ndarray, y_pred: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Plain soft dice loss (metrics.py:432-445)."""
    inter = jnp.sum(y_true * y_pred)
    coeff = (2.0 * inter + smooth) / (jnp.sum(y_true) + jnp.sum(y_pred) + smooth)
    return 1.0 - coeff


# ---------------------------------------------------------------- named metric set


def segmentation_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The reference fine-tune training loss: thresholded Dice + CE
    (Finetuning/train.py:455)."""
    return dice_loss(logits, target) + cross_entropy_loss(logits, target)


def segmentation_metrics(
    logits: jnp.ndarray, target: jnp.ndarray, cheap: bool = False
) -> dict:
    """The device-computable part of the reference metric list
    (Finetuning/train.py:458-465). Keys match the reference logging names so
    the grid-search/best-epoch machinery is drop-in comparable.

    `cheap=True` drops soft_clDice — its 10-iteration soft-skeletonize is
    ~40 full-resolution maxpool passes and triples the train-step time;
    the harness computes the full set at validation/eval instead."""
    out = {
        "dice_loss": dice_loss(logits, target),
        "cross_entropy_loss": cross_entropy_loss(logits, target),
        "iou_loss": iou_loss(logits, target),
    }
    if not cheap:
        out["soft_clDice"] = soft_cldice_loss(logits, target)
    return out
