"""MLP necks: projector / predictor (NonLinearNeck).

Reference: CM-UNet/cmae/models/necks/nonlinear_neck.py:8-103 — fc-BN-[ReLU-
fc-(BN)] with SyncBN. Config instantiations (configs/cmunet_config.py:21-41):
projector 50176 -> 1536 -> 256 and predictor 256 -> 1536 -> 256, both
num_layers=2, with_bias=True, with_last_bn=False, with_avg_pool=False.

BN here is plain feature-axis BatchNorm over the (global, batch-sharded)
batch — SyncBN for free under pjit.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class NonLinearNeck(nn.Module):
    hid_channels: int = 1536
    out_channels: int = 256
    with_bias: bool = True
    with_last_bn: bool = False
    dtype: Dtype = jnp.float32
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, D_in) -> (B, out_channels)."""
        x = x.astype(self.dtype)
        x = nn.Dense(self.hid_channels, use_bias=self.with_bias,
                     param_dtype=jnp.float32, dtype=self.dtype, name="fc0")(x)
        x = nn.BatchNorm(use_running_average=self.use_running_average,
                         momentum=0.9, epsilon=1e-6, dtype=self.dtype,
                         name="bn0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=self.with_bias,
                     param_dtype=jnp.float32, dtype=self.dtype, name="fc1")(x)
        if self.with_last_bn:
            x = nn.BatchNorm(use_running_average=self.use_running_average,
                             momentum=0.9, epsilon=1e-6, dtype=self.dtype,
                             name="bn1")(x)
        return x.astype(jnp.float32)
