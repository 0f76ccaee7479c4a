"""Genesis + MAE pretraining: reconstruction tasks on the shared UNet.

Reference: Pretraining/Transformation_based/Genesis_Chest_CT.py — one script,
two regimes selected by config.model:
  * "Model Genesis": input = distortion chain(original), target = original
    (generate_pair, utils.py:209-253)
  * "MAE": input = original * active_patch_mask (ratio 0.5, patch 16),
    target = original (generate_pair_mae, utils.py:196-207)
Both train UNet(out_classes=1) with FULL-image MSE (Genesis_Chest_CT.py:122-125)
under SGD(1e-2, momentum .9) + StepLR.

TPU redesign: the distortion/mask generation runs on device inside the jitted
step (cmx.ops.genesis / cmx.ops.masking) — the reference's per-image Python
loops were its data bottleneck (SURVEY §3.5). Per-sample masks by default
(the reference reuses mask[0] across the batch, utils.py:206 — `shared_mask`
restores that quirk).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cmx.eval.metrics import mse_loss
from cmx.models.unet import UNet
from cmx.ops.genesis import genesis_batch
from cmx.ops.masking import random_patch_mask
from cmx.train.trainer import Task, TaskAux


def make_genesis_task(
    model: Optional[UNet] = None,
    *,
    flip_rate: float = 0.4,
    local_rate: float = 0.5,
    nonlinear_rate: float = 0.9,
    paint_rate: float = 0.9,
    inpaint_rate: float = 0.2,
) -> Tuple[Task, UNet]:
    """Rates default to Transformation_based/config.py:24-31."""
    model = model or UNet(out_classes=1)

    def loss_fn(params, state, batch, rng):
        imgs = batch  # (B, H, W) originals
        x, y = genesis_batch(
            rng,
            imgs,
            flip_rate=flip_rate,
            local_rate=local_rate,
            nonlinear_rate=nonlinear_rate,
            paint_rate=paint_rate,
            inpaint_rate=inpaint_rate,
        )
        pred, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x,
            mutable=["batch_stats"],
        )
        loss = mse_loss(pred[..., 0], y)
        return loss, TaskAux(batch_stats=mut["batch_stats"], metrics={"mse": loss})

    return Task(name="genesis", loss_fn=loss_fn), model


def make_mae_task(
    model: Optional[UNet] = None,
    *,
    mask_ratio: float = 0.5,
    patch_size: int = 16,
    shared_mask: bool = False,
    masked_loss_only: bool = False,
) -> Tuple[Task, UNet]:
    """MAE regime. `masked_loss_only=False` matches the reference (full-image
    MSE, Genesis_Chest_CT.py:122-125); True gives the standard MAE objective."""
    model = model or UNet(out_classes=1)

    def loss_fn(params, state, batch, rng):
        imgs = batch
        b, h, _ = imgs.shape
        active = random_patch_mask(
            rng, b, img_size=h, patch_size=patch_size,
            mask_ratio=mask_ratio, shared=shared_mask,
        )
        x = imgs * active
        pred, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x,
            mutable=["batch_stats"],
        )
        err = jnp.square(pred[..., 0].astype(jnp.float32) - imgs)
        if masked_loss_only:
            masked = 1.0 - active
            loss = jnp.sum(err * masked) / jnp.maximum(jnp.sum(masked), 1.0)
        else:
            loss = jnp.mean(err)
        return loss, TaskAux(batch_stats=mut["batch_stats"], metrics={"mse": loss})

    return Task(name="mae", loss_fn=loss_fn), model
