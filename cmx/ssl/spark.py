"""SparK sparse masked-convolution pretraining — the performance centerpiece.

Reference: Pretraining/Spark/spark.py:19-189 + encoder.py. Pipeline:
  1. mask: per-sample random keep of (1-ratio) cells on the f x f bottleneck
     grid (spark.py:82-86), dilated to pixels (93), input zeroed (94)
  2. sparse hierarchical encode: every conv/pool output re-masked at its
     scale; BN over active positions only (encoder.py:14-56)
  3. densify per scale: masked BN -> fill masked positions with a learned
     mask token -> (LightDecoder mode only) 1x1/3x3 proj to decoder width
     (spark.py:100-111)
  4. decode (full-UNet decoder with skips, or LightDecoder sum-in pyramid)
  5. loss: per-patch-normalized L2 on MASKED patches only (spark.py:115-123)

TPU formulation: "sparsity" is expressed as dense ops + active-mask multiply
(exactly the reference's own GPU trick, encoder.py:20-23) and masked-moment
BN — XLA fuses the mask multiplies into the conv epilogues, and the MXU runs
dense convs at full throughput regardless of masking. The module-global
`_cur_active` side channel (encoder.py:11) becomes an explicit mask argument
threaded through UNetEncoder.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmx.models.blocks import MaskedBatchNorm
from cmx.models.decoders import LightDecoder
from cmx.models.unet import (
    BOTTLENECK_WIDTH,
    DOWNSAMPLE_RATIO,
    ENCODER_WIDTHS,
    UNetDecoder,
    UNetEncoder,
)
from cmx.ops.masking import spark_active_mask, upsample_mask
from cmx.train.trainer import Task, TaskAux

Dtype = Any


class SparKModel(nn.Module):
    """Masked encoder + densify + decoder as one flax module.

    `full_unet=True` uses the UNet decoder with densified skips (the
    configuration the paper fine-tunes from, Spark/main.py --full_unet);
    False uses LightDecoder with per-scale projections.
    """

    mask_ratio: float = 0.6
    full_unet: bool = True
    decoder_width: int = 768
    # Width overrides exist for cheap structural tests (e.g. the fp64
    # halo-exchange parity harness, where reference-width fp64 CPU convs
    # take tens of minutes); production always uses the reference widths.
    widths: Sequence[int] = ENCODER_WIDTHS
    bottleneck_width: int = BOTTLENECK_WIDTH
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False
    fused_decoder: bool = False  # decoder fusion pays NHWC<->flat layout
    # copies at every concat boundary (RESULTS.md round 3); encoder-only is
    # the profitable scope.
    remat_levels: Sequence[str] = ()  # e1..e4, bneck, d1..d4 (unet.py)

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, active_grid: jnp.ndarray):
        """imgs (B,H,W); active_grid (B,f,f) with 1 = keep. Returns
        (reconstruction (B,H,W), None)."""
        b, h, w = imgs.shape
        r = DOWNSAMPLE_RATIO
        active_pix = upsample_mask(active_grid, r)  # (B,H,W)

        bottleneck, skips = UNetEncoder(
            widths=self.widths,
            bottleneck=self.bottleneck_width,
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            fused=self.fused,
            remat_levels=self.remat_levels,
            name="encoder",
        )(imgs, active_pix)

        # Densify smallest -> largest (spark.py:100-111). Feature list order:
        # [bottleneck(f), skip4(2f), skip3(4f), skip2(8f), skip1(16f)].
        feats = [bottleneck] + list(reversed(skips))
        widths = [self.bottleneck_width] + list(reversed(self.widths))
        to_dec = []
        cur = active_grid
        d_width = self.decoder_width
        for i, (f, cw) in enumerate(zip(feats, widths)):
            m = cur[..., None]  # (B, s, s, 1)
            f = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                dtype=self.dtype,
                name=f"densify_norm{i}",
            )(f, m)
            token = self.param(
                f"mask_token{i}",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, 1, 1, cw),
                jnp.float32,
            )
            f = jnp.where(m > 0, f, token.astype(f.dtype))
            if not self.full_unet:
                ksz = 1 if i == 0 else 3
                f = nn.Conv(
                    d_width, (ksz, ksz), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"densify_proj{i}",
                )(f)
                d_width //= 2
            to_dec.append(f)
            cur = upsample_mask(cur, 2)

        if self.full_unet:
            rec = UNetDecoder(
                out_classes=1,
                widths=self.widths,
                dtype=self.dtype,
                use_running_average=self.use_running_average,
                fused=self.fused and self.fused_decoder,
                remat_levels=self.remat_levels,
                name="decoder",
            )(to_dec[0], list(reversed(to_dec[1:])))
        else:
            rec = LightDecoder(
                up_sample_ratio=DOWNSAMPLE_RATIO,
                width=self.decoder_width,
                dtype=self.dtype,
                use_running_average=self.use_running_average,
                name="decoder",
            )(to_dec)
        return rec[..., 0]


def spark_loss(
    rec: jnp.ndarray, imgs: jnp.ndarray, active_grid: jnp.ndarray
) -> jnp.ndarray:
    """Per-patch-normalized L2 on masked patches (spark.py:115-123)."""
    b, h, w = imgs.shape
    p = DOWNSAMPLE_RATIO
    f = h // p

    def patch(x):
        x = x.reshape(b, f, p, f, p)
        return x.transpose(0, 1, 3, 2, 4).reshape(b, f * f, p * p)

    inp = patch(imgs.astype(jnp.float32))
    out = patch(rec.astype(jnp.float32))
    mean = inp.mean(axis=-1, keepdims=True)
    std = jnp.sqrt(inp.var(axis=-1, keepdims=True) + 1e-6)
    inp = jax.lax.stop_gradient((inp - mean) / std)
    l2 = jnp.mean(jnp.square(out - inp), axis=-1)  # (B, L)
    non_active = 1.0 - active_grid.reshape(b, -1)
    return jnp.sum(l2 * non_active) / (jnp.sum(non_active) + 1e-8)


def make_spark_task(
    model: Optional[SparKModel] = None,
    *,
    mask_ratio: float = 0.6,
    augment: bool = True,
    input_size: int = 256,
    pallas_loss: bool = False,
) -> Tuple[Task, SparKModel]:
    """pallas_loss=True swaps the jnp loss tail for the fused Pallas kernel
    (cmx.ops.pallas_ops.spark_loss_pallas_trainable) — numerics verified
    compiled-on-TPU against the jnp path (tests/test_pallas_ops.py +
    RESULTS.md round-2 A/B)."""
    model = model or SparKModel(mask_ratio=mask_ratio)

    def loss_fn(params, state, batch, rng):
        imgs = batch
        km, ka = jax.random.split(rng)
        if augment:
            from cmx.ops.augment import spark_pretrain_aug, vmap_aug

            imgs = vmap_aug(spark_pretrain_aug, ka, imgs, input_size)
        f = imgs.shape[1] // DOWNSAMPLE_RATIO
        active = spark_active_mask(km, imgs.shape[0], f, model.mask_ratio)
        rec, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs,
            active,
            mutable=["batch_stats"],
        )
        if pallas_loss:
            from cmx.ops.pallas_ops import spark_loss_pallas_trainable

            loss = spark_loss_pallas_trainable(
                rec, jax.lax.stop_gradient(imgs), active, DOWNSAMPLE_RATIO
            )
        else:
            loss = spark_loss(rec, imgs, active)
        return loss, TaskAux(batch_stats=mut["batch_stats"], metrics={"recon": loss})

    return Task(name="spark", loss_fn=loss_fn), model


def spark_reconstruct(
    model: SparKModel, params, batch_stats, imgs: jnp.ndarray,
    active_grid: jnp.ndarray,
):
    """Vis mode (spark.py:125-129): returns (input, masked_input,
    reconstruction-or-input) with the per-patch normalization undone."""
    b, h, w = imgs.shape
    p = DOWNSAMPLE_RATIO
    f = h // p
    eval_model = model.clone(use_running_average=True)
    rec = eval_model.apply(
        {"params": params, "batch_stats": batch_stats}, imgs, active_grid
    )

    def patch(x):
        x = x.reshape(b, f, p, f, p)
        return x.transpose(0, 1, 3, 2, 4).reshape(b, f * f, p * p)

    def unpatch(x):
        x = x.reshape(b, f, f, p, p).transpose(0, 1, 3, 2, 4)
        return x.reshape(b, h, w)

    inp_p = patch(imgs.astype(jnp.float32))
    mean = inp_p.mean(axis=-1, keepdims=True)
    std = jnp.sqrt(inp_p.var(axis=-1, keepdims=True) + 1e-6)
    rec_img = unpatch(patch(rec) * std + mean)
    active_pix = upsample_mask(active_grid, p)
    masked = imgs * active_pix
    rec_or_inp = jnp.where(active_pix > 0, imgs, rec_img)
    return imgs, masked, rec_or_inp
