"""MoCo v2 momentum-contrast pretraining on the UNet GAP encoder.

Reference: Pretraining/MoCo/pl_bolts/models/self_supervised/moco/
moco2_module.py:51-399. Semantics reproduced:
  * encoder_q / encoder_k are copies of the 1024-d GAP UNet encoder (114-151)
  * EMA key update m = 0.999 (153-158)
  * 65 536-key ring-buffer queue + pointer (132-142, 160-175); K % batch == 0
  * logits: l_pos = <q, k>, l_neg = q @ queue (detached), / T=0.07, label 0
    (224-270); loss = CE; precision@1/5 metrics (311-336)
  * SGD(0.03, momentum .9, wd 1e-4) + cosine anneal (338-349)

TPU redesign:
  * queue + ptr are explicit arrays in TrainState.extra, updated functionally
    after each step — no register_buffer mutation.
  * the jitted step sees the GLOBAL batch, so the reference's
    `concat_all_gather` before enqueue (403-413) is implicit, and
    shuffle-BN (177-222) is unnecessary: its purpose is to stop per-GPU BN
    leakage between q and k batches; here the key encoder's BN statistics are
    computed over the full global batch (SyncBN semantics), which removes the
    per-shard information channel the shuffle existed to break. Deviation
    documented in SURVEY terms; GroupNorm is the alternative if ever needed.
  * EMA ordering: the reference momentum-updates the key encoder BEFORE
    computing keys each step (moco2_module.py:287-309); here the EMA runs in
    post_update AFTER the optimizer step, so step t's keys use the EMA of
    step t-1 — the same sequence shifted by one step (the CM-UNet hook has
    the same property).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cmx.models.unet import UNetEncoderGAP
from cmx.ops.augment import moco_view_aug_batch
from cmx.train.state import TrainState, ema_update
from cmx.train.trainer import Task, TaskAux


EMB_DIM = 1024


def init_moco_extra(
    rng: jax.Array, params, batch_stats, num_negatives: int = 65536
):
    """extra = key-encoder copy + queue state (+ val queue, moco2:132-142)."""
    queue = jax.random.normal(rng, (num_negatives, EMB_DIM), jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=1, keepdims=True)
    return {
        "key_params": jax.tree.map(jnp.copy, params),
        "key_batch_stats": jax.tree.map(jnp.copy, batch_stats),
        "queue": queue,
        "queue_ptr": jnp.zeros((), jnp.int32),
    }


def make_moco_task(
    model: Optional[UNetEncoderGAP] = None,
    *,
    temperature: float = 0.07,
    ema_momentum: float = 0.999,
    num_negatives: int = 65536,
    view_size: int = 224,
    augment: bool = True,
    rotation_method: str | None = None,
    crop_method: str | None = None,
    crop_impl: str | None = None,
) -> Tuple[Task, UNetEncoderGAP]:
    model = model or UNetEncoderGAP()

    def loss_fn(params, state: TrainState, batch, rng):
        imgs = batch  # (B, H, W) raw 256-cached images
        if augment:
            kq, kk = jax.random.split(rng)
            img_q = moco_view_aug_batch(kq, imgs, view_size,
                                        rotation_method, crop_method,
                                        crop_impl)
            img_k = moco_view_aug_batch(kk, imgs, view_size,
                                        rotation_method, crop_method,
                                        crop_impl)
        else:
            img_q, img_k = imgs, imgs

        q, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            img_q,
            mutable=["batch_stats"],
        )
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

        # Key encoder: EMA params, no gradient (stop_gradient on outputs; the
        # params enter via state.extra so autodiff never sees them).
        k, key_mut = model.apply(
            {
                "params": state.extra["key_params"],
                "batch_stats": state.extra["key_batch_stats"],
            },
            img_k,
            mutable=["batch_stats"],
        )
        k = jax.lax.stop_gradient(k / jnp.linalg.norm(k, axis=1, keepdims=True))

        queue = jax.lax.stop_gradient(state.extra["queue"])
        l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
        l_neg = jnp.einsum("nc,kc->nk", q, queue)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
        labels = jnp.zeros((q.shape[0],), jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        # precision@1/5 (pl_bolts precision_at_k; moco2_module.py:307-336)
        top5 = jax.lax.top_k(logits, 5)[1]
        acc1 = jnp.mean((top5[:, 0] == 0).astype(jnp.float32))
        acc5 = jnp.mean(jnp.any(top5 == 0, axis=1).astype(jnp.float32))

        return loss, TaskAux(
            batch_stats=mut["batch_stats"],
            metrics={"acc1": acc1, "acc5": acc5},
            updates={"keys": k, "key_batch_stats": key_mut["batch_stats"]},
        )

    def post_update(state: TrainState, aux: TaskAux):
        extra = state.extra
        new_key_params = ema_update(extra["key_params"], state.params, ema_momentum)
        new_key_bs = aux.updates["key_batch_stats"]
        keys = aux.updates["keys"]
        bs = keys.shape[0]
        ptr = extra["queue_ptr"]
        # Ring-buffer enqueue. dynamic_update_slice CLAMPS the start index
        # when ptr + bs > K while the pointer wraps with mod, so the queue and
        # pointer would silently drift apart — require divisibility, like the
        # reference's assert (moco2_module.py:169). Raised at trace time
        # (shapes are static), so misconfiguration fails fast, not silently.
        if num_negatives % bs != 0:
            raise ValueError(
                f"MoCo queue size ({num_negatives}) must be divisible by the "
                f"global batch ({bs}); the ring-buffer enqueue would clamp at "
                "the wraparound and corrupt the queue (moco2_module.py:169)."
            )
        queue = jax.lax.dynamic_update_slice(extra["queue"], keys, (ptr, 0))
        new_ptr = jnp.mod(ptr + bs, num_negatives).astype(jnp.int32)
        return {
            "key_params": new_key_params,
            "key_batch_stats": new_key_bs,
            "queue": queue,
            "queue_ptr": new_ptr,
        }

    return Task(name="moco", loss_fn=loss_fn, post_update=post_update), model


def init_val_queue(rng: jax.Array, num_negatives: int = 65536):
    """Separate validation queue (moco2_module.py:137-142)."""
    q = jax.random.normal(rng, (num_negatives, EMB_DIM), jnp.float32)
    return {
        "queue": q / jnp.linalg.norm(q, axis=1, keepdims=True),
        "queue_ptr": jnp.zeros((), jnp.int32),
    }


def make_moco_validate(
    model: UNetEncoderGAP,
    *,
    temperature: float = 0.07,
    view_size: int = 224,
    augment: bool = True,
    rotation_method: str | None = None,
    crop_method: str | None = None,
    crop_impl: str | None = None,
):
    """Validation step vs the val queue with precision@1/5
    (moco2_module.py:311-336). Returns a jitted fn
    (state, val_queue, imgs, key) -> (metrics, new_val_queue)."""

    @jax.jit
    def validate(state, val_queue, imgs, key):
        if augment:
            kq, kk = jax.random.split(key)
            img_q = moco_view_aug_batch(kq, imgs, view_size,
                                        rotation_method, crop_method,
                                        crop_impl)
            img_k = moco_view_aug_batch(kk, imgs, view_size,
                                        rotation_method, crop_method,
                                        crop_impl)
        else:
            img_q = img_k = imgs
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        eval_model = model.clone(use_running_average=True)
        q = eval_model.apply(variables, img_q)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        k = eval_model.apply(
            {
                "params": state.extra["key_params"],
                "batch_stats": state.extra["key_batch_stats"],
            },
            img_k,
        )
        k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
        l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
        l_neg = jnp.einsum("nc,kc->nk", q, val_queue["queue"])
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
        labels = jnp.zeros((q.shape[0],), jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        top5 = jax.lax.top_k(logits, 5)[1]
        acc1 = jnp.mean((top5[:, 0] == 0).astype(jnp.float32))
        acc5 = jnp.mean(jnp.any(top5 == 0, axis=1).astype(jnp.float32))
        K = val_queue["queue"].shape[0]
        if K % k.shape[0] != 0:
            raise ValueError(
                f"val queue size ({K}) must be divisible by the batch "
                f"({k.shape[0]}) — see make_moco_task's wraparound note."
            )
        new_q = jax.lax.dynamic_update_slice(
            val_queue["queue"], k, (val_queue["queue_ptr"], 0)
        )
        new_ptr = jnp.mod(val_queue["queue_ptr"] + k.shape[0], K).astype(jnp.int32)
        return (
            {"val_loss": loss, "val_acc1": acc1, "val_acc5": acc5},
            {"queue": new_q, "queue_ptr": new_ptr},
        )

    return validate
