"""Supervised segmentation task (the fine-tuning regime).

Reproduces Finetuning/train.py's training semantics: UNet logits, loss =
thresholded Dice + CE (train.py:455), device metrics per batch (458-465),
SGD+momentum optimizer (train.py:347-352 uses torch.optim.SGD lr grid,
momentum 0.9).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from cmx.eval.metrics import segmentation_loss, segmentation_metrics
from cmx.models.unet import UNet
from cmx.ops.augment import finetune_train_aug
from cmx.train.trainer import Task, TaskAux


def make_supervised_task(
    model: Optional[UNet] = None, augment: bool = True, cheap_metrics: bool = True
) -> Tuple[Task, UNet]:
    """Task whose batch is (images (B,H,W), one-hot masks (B,H,W,C)).

    Augmentation runs inside the jitted step (device-side), unlike the
    reference's DataLoader-worker albumentations. Per-step metrics default to
    the cheap set (dice/CE/IoU); soft_clDice runs at validation only — inside
    the train step it costs ~3x the whole fwd+bwd (40 maxpool passes).
    """
    model = model or UNet(out_classes=2)

    def loss_fn(params, state, batch, rng):
        imgs, masks = batch
        if augment:
            keys = jax.random.split(rng, imgs.shape[0])
            imgs, masks = jax.vmap(finetune_train_aug)(keys, imgs, masks)
        logits, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs,
            mutable=["batch_stats"],
        )
        loss = segmentation_loss(logits, masks)
        metrics = segmentation_metrics(logits, masks, cheap=cheap_metrics)
        return loss, TaskAux(batch_stats=mut["batch_stats"], metrics=metrics)

    return Task(name="supervised", loss_fn=loss_fn), model


def make_eval_fn(model: UNet):
    """Jitted eval forward returning logits with frozen BN stats."""
    eval_model = model.clone(use_running_average=True)

    @jax.jit
    def eval_fn(params, batch_stats, imgs):
        return eval_model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs
        )

    return eval_fn
