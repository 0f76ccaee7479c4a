"""SparK pretrain decoders: LightDecoder and the full-UNet decoder.

Reference: /root/reference/Pretraining/Spark/decoder.py. The UnetDecoder
variant (decoder.py:39-58) is exactly cmx.models.unet.UNetDecoder with
out_classes=1, so only LightDecoder (decoder.py:81-100) is defined here:
a sum-in pyramid of upsample blocks — each block ConvT4x4s2 -> Conv3x3-BN-
ReLU6 -> Conv3x3-BN — followed by a 1x1 projection to 1 channel.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cmx.models.blocks import MaskedBatchNorm

Dtype = Any


class LightDecoderBlock(nn.Module):
    """One 2x upsample block (decoder.py:17-31)."""

    cin: int
    cout: int
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.cin, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="up",
        )(x)
        x = nn.Conv(self.cin, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv0")(x)
        x = MaskedBatchNorm(use_running_average=self.use_running_average,
                            dtype=self.dtype, name="bn0")(x)
        x = jnp.minimum(nn.relu(x), 6.0)  # ReLU6
        x = nn.Conv(self.cout, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = MaskedBatchNorm(use_running_average=self.use_running_average,
                            dtype=self.dtype, name="bn1")(x)
        return x


class LightDecoder(nn.Module):
    """Sum-in hierarchical decoder (decoder.py:81-100).

    Input: list of dense feature maps from smallest (bottleneck, width
    `width`) to largest; each stage adds the matching map (already projected
    to the stage width by the SparK densify projs) then upsamples 2x.
    """

    up_sample_ratio: int = 16
    width: int = 768
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False

    @nn.compact
    def __call__(self, to_dec: Sequence[Optional[jnp.ndarray]]) -> jnp.ndarray:
        n = round(math.log2(self.up_sample_ratio))
        channels = [self.width // 2**i for i in range(n + 1)]
        x = 0.0
        for i, (cin, cout) in enumerate(zip(channels[:-1], channels[1:])):
            if i < len(to_dec) and to_dec[i] is not None:
                x = x + to_dec[i].astype(self.dtype)
            x = LightDecoderBlock(
                cin, cout, dtype=self.dtype,
                use_running_average=self.use_running_average, name=f"block{i}",
            )(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj")(x)
        return x.astype(jnp.float32)
