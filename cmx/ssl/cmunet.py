"""CM-UNet — the paper's combined masked-reconstruction + contrastive method.

Reference: Pretraining/CM-UNet/cmae/models/algorithms/cmunet.py:7-135 +
heads/cmunet_head.py:26-91 + configs/cmunet_config.py:5-42. Structure:

  online:  masked UNet encoder (patch 16, ratio .65 on 224x224 view1)
           -> pixel decoder (2ch)   -> masked-MSE reconstruction
           -> feature decoder (2ch) -> channel-mean -> projector (50176->1536
              ->256) -> predictor -> InfoNCE vs target projections
  target:  EMA UNet encoder on view2 -> 1x1 reduce 1024->256 -> flatten ->
           target projector (EMA of online projector)
  losses:  loss_rc = masked MSE on per-row-normalized view1
           (cmunet_head.py:62-70); loss_ct = 2*T*CE(pred_s @ proj_t / T,
           arange labels) (77-88), T=.07, weights 1.0/1.0
  EMA:     encoder + projector, momentum .996 (cmunet.py:78-92 +
           MomentumUpdateHook, constant since base == end in the config)

Documented deviations from reference quirks (SURVEY §7 "Parity vs quirks"):
  * per-sample masks instead of mask[0] broadcast (UNet_encoder.py:156)
  * the 1024->256 target reduction conv is sampled ONCE at init and kept
    fixed, instead of a fresh nn.Conv2d every forward (cmunet.py:128) which
    injects new random noise into the target each step
  * the head's reconstruction broadcast bug (pred (B,H,W) vs target
    (B,1,H,W) producing (B,B,H,W)) is fixed to elementwise (B,H,W)
  * InfoNCE is computed on the global batch under pjit — identical to
    concat_all_gather + bs*rank label offsets (cmunet_head.py:77-85)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from cmx.models.necks import NonLinearNeck
from cmx.models.unet import UNetDecoder, UNetEncoder
from cmx.ops.augment import cmunet_two_views_batch
from cmx.ops.masking import random_patch_mask
from cmx.train.state import TrainState, ema_update
from cmx.train.trainer import Task, TaskAux

Dtype = Any


class CMUNetOnline(nn.Module):
    """Online branch: encoder + dual decoders + projector + predictor."""

    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False

    def setup(self):
        self.encoder = UNetEncoder(
            dtype=self.dtype, use_running_average=self.use_running_average
        )
        self.pixel_decoder = UNetDecoder(
            out_classes=2, dtype=self.dtype,
            use_running_average=self.use_running_average,
        )
        self.feature_decoder = UNetDecoder(
            out_classes=2, dtype=self.dtype,
            use_running_average=self.use_running_average,
        )
        self.projector = NonLinearNeck(
            use_running_average=self.use_running_average
        )
        self.predictor = NonLinearNeck(
            use_running_average=self.use_running_average
        )

    def __call__(self, img: jnp.ndarray, active: jnp.ndarray):
        latent, skips = self.encoder(img, active)
        pred_pixel = self.pixel_decoder(latent, skips)
        pred_feature = self.feature_decoder(latent, skips)
        # channel-mean then flatten (cmunet.py:126 + nonlinear_neck.py:88-93)
        feat = jnp.mean(pred_feature, axis=-1).reshape(img.shape[0], -1)
        proj = self.projector(feat)
        pred = self.predictor(proj)
        return pred_pixel, pred, proj

    def encode_project(self, img: jnp.ndarray, reduce_kernel: jnp.ndarray):
        """Target-branch computation (run with EMA params): encode unmasked,
        reduce 1024->256, flatten, project."""
        latent, _ = self.encoder(img)
        red = jax.lax.conv_general_dilated(
            latent.astype(jnp.float32),
            reduce_kernel,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        flat = red.reshape(img.shape[0], -1)  # (B, 14*14*256 = 50176)
        return self.projector(flat)


def make_cmunet_task(
    model: Optional[CMUNetOnline] = None,
    *,
    mask_ratio: float = 0.65,
    patch_size: int = 16,
    temperature: float = 0.07,
    ct_weight: float = 1.0,
    rc_weight: float = 1.0,
    base_momentum: float = 0.996,
    view_size: int = 224,
    augment: bool = True,
    crop_impl: Optional[str] = None,
) -> Tuple[Task, CMUNetOnline]:
    model = model or CMUNetOnline()

    def loss_fn(params, state: TrainState, batch, rng):
        imgs = batch  # (B, 256, 256) cached
        kv, km = jax.random.split(rng)
        if augment:
            v1, v2 = cmunet_two_views_batch(kv, imgs, view_size, 31,
                                            crop_impl=crop_impl)
        else:
            v1 = v2 = imgs[:, :view_size, :view_size]
        b, h, _ = v1.shape
        active = random_patch_mask(
            km, b, img_size=h, patch_size=patch_size, mask_ratio=mask_ratio
        )

        (pred_pixel, pred_s, _proj_s), mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            v1,
            active,
            mutable=["batch_stats"],
        )

        # Target branch with EMA params, no gradients.
        proj_t, _tmut = model.apply(
            {
                "params": state.extra["target_params"],
                "batch_stats": state.extra["target_batch_stats"],
            },
            v2,
            state.extra["reduce_kernel"],
            method=CMUNetOnline.encode_project,
            mutable=["batch_stats"],
        )
        proj_t = jax.lax.stop_gradient(proj_t)

        # Reconstruction: per-row-normalized target, masked-MSE over MASKED
        # pixels (mask semantics: reference mask 1 = masked; our `active` is
        # 1 = visible).
        target = v1.astype(jnp.float32)
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = jax.lax.stop_gradient((target - mean) / jnp.sqrt(var + 1e-6))
        masked = 1.0 - active
        err = jnp.square(pred_pixel[..., 1] - target)
        loss_rc = jnp.sum(err * masked) / jnp.maximum(jnp.sum(masked), 1.0)

        # Contrastive: global-batch InfoNCE.
        q = pred_s / jnp.linalg.norm(pred_s, axis=1, keepdims=True)
        t = proj_t / jnp.linalg.norm(proj_t, axis=1, keepdims=True)
        score = (q @ t.T) / temperature
        labels = jnp.arange(b, dtype=jnp.int32)
        loss_ct = optax.softmax_cross_entropy_with_integer_labels(score, labels).mean()
        loss_ct = 2.0 * temperature * loss_ct

        loss = ct_weight * loss_ct + rc_weight * loss_rc
        return loss, TaskAux(
            batch_stats=mut["batch_stats"],
            metrics={"loss_ct": loss_ct, "loss_rc": loss_rc},
            updates={"target_batch_stats": _tmut["batch_stats"]},
        )

    def post_update(state: TrainState, aux: TaskAux):
        extra = state.extra
        m = base_momentum
        # EMA encoder + projector only (cmunet.py:84-92); decoders/predictor
        # in the target tree are never used, but EMA-ing the whole online tree
        # keeps the pytree structures aligned at zero extra semantic cost:
        # only encoder/projector leaves are read by encode_project.
        new_target = ema_update(extra["target_params"], state.params, m)
        return {
            "target_params": new_target,
            "target_batch_stats": aux.updates["target_batch_stats"],
            "reduce_kernel": extra["reduce_kernel"],
        }

    return Task(name="cmunet", loss_fn=loss_fn, post_update=post_update), model


def init_cmunet_extra(rng: jax.Array, params, batch_stats):
    """Target state: EMA copy of online params (init_weights copies online ->
    target, cmunet.py:61-76) + the fixed 1x1 reduce kernel."""
    reduce_kernel = (
        jax.random.normal(rng, (1, 1, 1024, 256), jnp.float32)
        * jnp.sqrt(2.0 / 1024.0)
    )
    return {
        "target_params": jax.tree.map(jnp.copy, params),
        "target_batch_stats": jax.tree.map(jnp.copy, batch_stats),
        "reduce_kernel": reduce_kernel,
    }
