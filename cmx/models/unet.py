"""The shared 5-level UNet model family.

One encoder definition serves every regime (the reference re-defines it five
times: Finetuning/model.py:84, Spark/models/custom.py:42+113,
MoCo/.../moco_data_module.py:47, CM-UNet/cmae/models/backbones/UNet_encoder.py:52).

Channel plan (reference Finetuning/model.py:96-108):
  1 -> 64 -> 128 -> 256 -> 512 (four DownBlocks, each emitting a skip)
  bottleneck DoubleConv 512 -> 1024
  decoder 1024 -> 512 -> 256 -> 128 -> 64 with skip concat
  final 1x1 conv 64 -> out_classes (default 2)

All modules are NHWC / bf16-compute (see cmx.models.blocks). Inputs are
(B, H, W) grayscale or (B, H, W, 1).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cmx.models.blocks import DoubleConv, DownBlock, UpBlock, max_pool_2x2

Dtype = Any

ENCODER_WIDTHS: Tuple[int, ...] = (64, 128, 256, 512)
BOTTLENECK_WIDTH: int = 1024
FEATURE_MAP_CHANNELS: Tuple[int, ...] = (64, 128, 256, 512, 1024)
DOWNSAMPLE_RATIO: int = 16  # matches Spark/models/custom.py get_downsample_ratio


def _ensure_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Accept (B,H,W) or (B,H,W,1); return (B,H,W,1).

    The reference auto-unsqueezes channel dim (Finetuning/model.py:120).
    """
    if x.ndim == 3:
        return x[..., None]
    if x.ndim == 4:
        return x
    raise ValueError(f"expected (B,H,W) or (B,H,W,C) input, got shape {x.shape}")


class UNetEncoder(nn.Module):
    """Hierarchical encoder: 4 DownBlocks + bottleneck DoubleConv.

    Returns (bottleneck, skips) where skips are the four pre-pool feature maps
    at full/2/4/8 resolution — the contract every decoder and SSL regime needs
    (reference: Finetuning/model.py:121-125, Spark/models/custom.py:165-179,
    cmae/models/backbones/UNet_encoder.py:141-158).

    `mask`, when given, is an active-position map at input resolution
    (B, H, W) or (B, H, W, 1) with 1 = keep. It is pooled to each scale and
    applied SparK-style inside every conv/BN stage.
    """

    widths: Sequence[int] = ENCODER_WIDTHS
    bottleneck: int = BOTTLENECK_WIDTH
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False
    # Selective rematerialization: block names whose activations are
    # recomputed in the backward pass instead of stored ("e1".."e4",
    # "bneck"). The L1/L2 stages carry the dominant HBM temps (five 2-GB
    # bf16 L1 activations at b256, RESULTS.md round 2) — remat there trades
    # their cheap FLOPs for the memory that gates larger batches.
    remat_levels: Sequence[str] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        x = _ensure_nhwc(x).astype(self.dtype)
        if mask is not None:
            # Keep the active map in the compute dtype: 0/1 are exact in
            # bf16 and the (B,H,W,1) mask is re-read at every conv/BN stage —
            # fp32 storage would double that traffic.
            mask = _ensure_nhwc(mask).astype(self.dtype)
            x = x * mask
        skips = []
        for i, w in enumerate(self.widths):
            down_cls = (nn.remat(DownBlock)
                        if f"e{i + 1}" in self.remat_levels else DownBlock)
            x, skip = down_cls(
                w,
                dtype=self.dtype,
                use_running_average=self.use_running_average,
                fused=self.fused,
                name=f"down{i + 1}",
            )(x, mask)
            skips.append(skip)
            if mask is not None:
                # Active map follows the maxpool downsampling exactly: a 2x2
                # output position is active iff any contributing input was.
                mask = max_pool_2x2(mask)
        bneck_cls = (nn.remat(DoubleConv)
                     if "bneck" in self.remat_levels else DoubleConv)
        x = bneck_cls(
            self.bottleneck,
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            name="bottleneck",
        )(x, mask)
        return x, skips


class UNetDecoder(nn.Module):
    """Mirror decoder: 4 UpBlocks with skip concat + 1x1 head conv.

    Reference: Finetuning/model.py:103-108 and the SSL pretrain decoder
    (cmae/models/necks/munet_neck.py:52-110, out_classes there is 2;
    Spark/decoder.py UnetDecoder uses out 1).
    """

    out_classes: int = 2
    widths: Sequence[int] = ENCODER_WIDTHS
    up_sample_mode: str = "conv_transpose"
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False
    remat_levels: Sequence[str] = ()  # "d1" (full-res up block) .. "d4"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips: Sequence[jnp.ndarray]):
        for i, w in enumerate(reversed(self.widths)):
            lvl = len(self.widths) - i
            up_cls = (nn.remat(UpBlock)
                      if f"d{lvl}" in self.remat_levels else UpBlock)
            x = up_cls(
                w,
                up_sample_mode=self.up_sample_mode,
                dtype=self.dtype,
                use_running_average=self.use_running_average,
                fused=self.fused,
                name=f"up{lvl}",
            )(x, skips[len(skips) - 1 - i])
        x = nn.Conv(
            self.out_classes,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="head",
        )(x)
        # Logits in fp32 — losses (softmax/CE/Dice) are precision-sensitive.
        return x.astype(jnp.float32)


class UNet(nn.Module):
    """Full segmentation UNet = encoder + decoder.

    Output is NHWC logits (B, H, W, out_classes); the reference emits NCHW
    (Finetuning/model.py:110-131) — class axis is last here by TPU convention.
    """

    out_classes: int = 2
    up_sample_mode: str = "conv_transpose"
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False
    remat_levels: Sequence[str] = ()  # e1..e4, bneck, d1..d4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        h, skips = UNetEncoder(
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            fused=self.fused,
            remat_levels=self.remat_levels,
            name="encoder",
        )(x, mask)
        return UNetDecoder(
            out_classes=self.out_classes,
            up_sample_mode=self.up_sample_mode,
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            fused=self.fused,
            remat_levels=self.remat_levels,
            name="decoder",
        )(h, skips)


class UNetEncoderGAP(nn.Module):
    """Encoder + global average pool -> 1024-d embedding (MoCo encoder).

    Reference: MoCo/.../moco_data_module.py:47-66 (UNet_encoder ending in
    AvgPool over the 16x16 bottleneck map).
    """

    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h, _ = UNetEncoder(
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            name="encoder",
        )(x)
        emb = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        return emb  # (B, 1024)
