"""Pallas TPU kernels.

First kernel: fused SparK loss tail — patchify + per-patch normalization +
squared error + masked-mean in ONE VMEM pass (the XLA version materializes
the (B, L, p^2) patch tensor in HBM twice: normalized input and squared
error; this kernel streams tiles and emits only per-patch partial sums).

All kernels run in interpret mode on CPU (tests) and compiled on TPU. Each
has a reference jnp implementation used as fallback and in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spark_loss_kernel(img_ref, rec_ref, act_ref, num_ref, den_ref, *, patch: int):
    """One batch row per program: compute sum over masked patches of
    per-patch-normalized L2, and the masked-patch count."""
    img = img_ref[0].astype(jnp.float32)  # (H, W)
    rec = rec_ref[0].astype(jnp.float32)
    act = act_ref[0].astype(jnp.float32)  # (f, f), 1 = visible
    h, w = img.shape
    f = h // patch
    # (f, p, f, p) -> per-patch stats via two-axis reductions
    img4 = img.reshape(f, patch, f, patch)
    rec4 = rec.reshape(f, patch, f, patch)
    mean = jnp.mean(img4, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(img4), axis=(1, 3), keepdims=True) - jnp.square(mean)
    norm = (img4 - mean) * jax.lax.rsqrt(var + 1e-6)
    l2 = jnp.mean(jnp.square(rec4 - norm), axis=(1, 3))  # (f, f)
    masked = 1.0 - act
    num_ref[0, 0] = jnp.sum(l2 * masked)
    den_ref[0, 0] = jnp.sum(masked)


def spark_loss_pallas(
    rec: jnp.ndarray, imgs: jnp.ndarray, active_grid: jnp.ndarray,
    patch: int = 16, interpret: bool = False,
) -> jnp.ndarray:
    """Fused SparK reconstruction loss (reference semantics:
    /root/reference/Pretraining/Spark/spark.py:115-123).

    NOTE on variance: the reference uses torch.var (unbiased, N-1); this
    kernel and cmx.ssl.spark.spark_loss both use population variance (N),
    matching jnp.var — the 1/256 vs 1/255 difference is far below training
    noise and is documented here deliberately.
    """
    b, h, w = imgs.shape
    f = h // patch
    kernel = functools.partial(_spark_loss_kernel, patch=patch)
    num, den = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        interpret=interpret,
    )(imgs[:, None].reshape(b, h, w), rec.reshape(b, h, w), active_grid)
    return jnp.sum(num) / (jnp.sum(den) + 1e-8)


def _bn_act_mask_kernel(x_ref, scale_ref, bias_ref, mask_ref, o_ref):
    """Fused normalize-affine-ReLU-remask epilogue (inference/fixed-stats
    path): o = max(x * scale + bias, 0) * mask. scale/bias are the folded
    BN parameters (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps))."""
    x = x_ref[...].astype(jnp.float32)
    y = x * scale_ref[...] + bias_ref[...]
    y = jnp.maximum(y, 0.0)
    o_ref[...] = (y * mask_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def bn_relu_mask_pallas(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, mask: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B,H,W,C) * folded-BN -> ReLU -> mask, one VMEM pass per row-block."""
    b, h, w, c = x.shape
    return pl.pallas_call(
        _bn_act_mask_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, scale, bias, mask)
