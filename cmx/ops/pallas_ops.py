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


def _spark_loss_kernel(img_ref, rec_ref, act_ref, l2_ref, *, patch: int):
    """One batch row per program: per-patch-normalized masked L2 as an
    (f, f) map. The (tiny) cross-batch reduction happens in jnp outside.

    Mosaic cannot lower lane-splitting reshapes ((H,W)->(f,p,f,p) fails with
    'unsupported shape cast'), so patch reductions are expressed as matmuls
    with a block-indicator matrix A (f, H): patch_sum(X) = A @ X @ A^T —
    MXU-native and layout-friendly. Broadcast back to pixels is the
    transpose: A^T @ M @ A."""
    img = img_ref[0].astype(jnp.float32)  # (H, W)
    rec = rec_ref[0].astype(jnp.float32)
    act = act_ref[0].astype(jnp.float32)  # (f, f), 1 = visible
    h, w = img.shape
    f = h // patch
    rows = jax.lax.broadcasted_iota(jnp.int32, (f, h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (f, h), 1)
    A = (cols // patch == rows).astype(jnp.float32)  # (f, H) block indicator
    inv_n = 1.0 / float(patch * patch)

    def patch_sum(x):  # (H, W) -> (f, f)
        return jnp.dot(
            jnp.dot(A, x, preferred_element_type=jnp.float32),
            A.T, preferred_element_type=jnp.float32,
        )

    def to_pixels(m):  # (f, f) -> (H, W)
        return jnp.dot(
            jnp.dot(A.T, m, preferred_element_type=jnp.float32),
            A, preferred_element_type=jnp.float32,
        )

    mean = patch_sum(img) * inv_n
    var = patch_sum(img * img) * inv_n - mean * mean
    inv_std = jax.lax.rsqrt(var + 1e-6)
    norm = (img - to_pixels(mean)) * to_pixels(inv_std)
    l2 = patch_sum(jnp.square(rec - norm)) * inv_n  # (f, f)
    l2_ref[0] = l2 * (1.0 - act)


def _auto_interpret(interpret):
    """interpret=None -> interpret on CPU (tests / CPU mesh), compiled on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def spark_loss_pallas(
    rec: jnp.ndarray, imgs: jnp.ndarray, active_grid: jnp.ndarray,
    patch: int = 16, interpret: bool = None,
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
    interpret = _auto_interpret(interpret)
    kernel = functools.partial(_spark_loss_kernel, patch=patch)
    masked_l2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        # (b, f, f) maps: the (1, f, f) block's last two dims are array-equal,
        # which satisfies the TPU (8, 128) tiling rule for any batch (scalar
        # per-row outputs do not).
        out_specs=pl.BlockSpec((1, f, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, f), jnp.float32),
        interpret=interpret,
    )(imgs.reshape(b, h, w), rec.reshape(b, h, w), active_grid)
    non_active = 1.0 - active_grid.astype(jnp.float32)
    return jnp.sum(masked_l2) / (jnp.sum(non_active) + 1e-8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spark_loss_pallas_trainable(
    rec: jnp.ndarray, imgs: jnp.ndarray, active_grid: jnp.ndarray,
    patch: int = 16,
) -> jnp.ndarray:
    """Differentiable wrapper: Pallas fused forward + closed-form backward.

    pallas_call has no automatic VJP; the gradient of the SparK loss w.r.t.
    the reconstruction is closed-form:
        dL/drec = 2 (rec - norm(img)) * masked / (p^2 * sum(masked))
    computed as one fused elementwise XLA op (no patch-tensor
    materialization — the normalization statistics are recomputed, which is
    cheaper than saving the (B,L,p^2) normalized tensor).
    imgs/active_grid are data (zero cotangent).
    """
    return spark_loss_pallas(rec, imgs, active_grid, patch=patch)


def _patch_stats(imgs: jnp.ndarray, patch: int):
    b, h, w = imgs.shape
    f = h // patch
    img4 = imgs.astype(jnp.float32).reshape(b, f, patch, f, patch)
    mean = jnp.mean(img4, axis=(2, 4), keepdims=True)
    var = jnp.mean(jnp.square(img4), axis=(2, 4), keepdims=True) - jnp.square(mean)
    return img4, mean, var, f


def _spark_loss_fwd(rec, imgs, active_grid, patch):
    return spark_loss_pallas(rec, imgs, active_grid, patch=patch), (
        rec, imgs, active_grid,
    )


def _spark_loss_bwd(patch, res, g):
    rec, imgs, active_grid = res
    b, h, w = imgs.shape
    img4, mean, var, f = _patch_stats(imgs, patch)
    norm = (img4 - mean) * jax.lax.rsqrt(var + 1e-6)
    rec4 = rec.astype(jnp.float32).reshape(b, f, patch, f, patch)
    masked = (1.0 - active_grid.astype(jnp.float32)).reshape(b, f, 1, f, 1)
    denom = jnp.sum(1.0 - active_grid.astype(jnp.float32)) + 1e-8
    drec = 2.0 * (rec4 - norm) * masked / (patch * patch * denom)
    drec = (g * drec).reshape(b, h, w).astype(rec.dtype)
    return (drec, jnp.zeros_like(imgs), jnp.zeros_like(active_grid))


spark_loss_pallas_trainable.defvjp(_spark_loss_fwd, _spark_loss_bwd)


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
    interpret: bool = None,
) -> jnp.ndarray:
    """x (B,H,W,C) * folded-BN -> ReLU -> mask, one VMEM pass per row-block."""
    b, h, w, c = x.shape
    interpret = _auto_interpret(interpret)
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
