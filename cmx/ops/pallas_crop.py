"""Fused RandomResizedCrop resample kernel (Pallas TPU).

Reproduces the exact linear map of `cmx.ops.augment.random_resized_crop`
(torchvision RandomResizedCrop semantics — reference usages: MoCo
pl_bolts/.../moco_data_module.py:123, CM-UNet configs/cmunet_config.py:49,
SparK utils/dataset.py:38) with both separable resize weight matrices built
IN VMEM and applied as two fp32 MXU dots in the same program.

Motivation (RESULTS "crop2", artifacts/r2/moco_aug2_crop2.log): in the XLA
formulation the per-sample weight-matrix CONSTRUCTION — vmapped
iota/compare/normalize ops — is the measured cost floor of the crop (~77 of
~100 ms per 128x256^2 batch on v5e), not the resample dots. Here the
(B, out, in) weight tensors never exist in HBM: per program, only one
(H, W) image crosses HBM in and one (out, out) crop crosses out, and the
weights are rebuilt from four SMEM scalars. VMEM footprint per program at
256^2 -> 224^2 is ~1.1 MB; the arithmetic floor is sub-millisecond for the
whole batch.

Weight math is a line-for-line transcription of
`cmx.ops.augment._resize_weight_mat` (itself verified against
jax.image.scale_and_translate to fp32 round-off in tests/test_ops.py) in
transposed (out, in) layout; parity is pinned by tests/test_pallas_crop.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmx.ops.pallas_ops import _auto_interpret


def _keys_cubic(x: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic kernel, a=-0.5 — keep in sync with
    augment._keys_cubic_kernel (duplicated to avoid a circular import)."""
    out = ((1.5 * x - 2.5) * x) * x + 1.0
    out = jnp.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, out)
    return jnp.where(x >= 2.0, 0.0, out)


def _weights_out_in(
    s: jnp.ndarray, t: jnp.ndarray, out_size: int, in_size: int, method: str
) -> jnp.ndarray:
    """(out_size, in_size) resample weights — the transpose of
    `augment._resize_weight_mat(in_size, out_size, s, t, method)`, same
    formula op for op (half-pixel centers, antialias kernel widening,
    per-output renormalization, out-of-range rows zeroed)."""
    inv = 1.0 / s
    kernel_scale = jnp.maximum(inv, 1.0)  # antialias=True
    # Mosaic's tpu.iota is integer-only — make int32 iotas and cast.
    o = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, in_size), 0).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, in_size), 1).astype(jnp.float32)
    sample_f = (o + 0.5) * inv - t * inv - 0.5
    x = jnp.abs(sample_f - i) / kernel_scale
    if method in ("linear", "triangle", "bilinear"):
        w = jnp.maximum(0.0, 1.0 - x)
    elif method in ("cubic", "bicubic"):
        w = _keys_cubic(x)
    else:
        raise ValueError(f"unsupported resize method {method!r}")
    total = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(jnp.abs(total) > 1000.0 * jnp.finfo(jnp.float32).eps,
                  w / jnp.where(total != 0, total, 1), 0)
    valid = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return jnp.where(valid, w, 0)


def _crop_kernel(p_ref, img_ref, out_ref, *, method: str, out_size: int):
    """One image per program: build wy/wx from the four window scalars and
    resample as (out,H)@(H,W) then contract W with (out,W).

    p_ref holds the WHOLE (B, 4) params array in SMEM (Mosaic rejects
    sub-(8,128) SMEM blocks; the full-array spec is exempt and the array is
    ~2 KB), indexed by program id."""
    img = img_ref[0].astype(jnp.float32)  # (H, W)
    in_h, in_w = img.shape
    i = pl.program_id(0)
    sy = p_ref[i, 0]
    ty = p_ref[i, 1]
    sx = p_ref[i, 2]
    tx = p_ref[i, 3]
    wy = _weights_out_in(sy, ty, out_size, in_h, method)  # (out, H)
    wx = _weights_out_in(sx, tx, out_size, in_w, method)  # (out, W)
    # Precision.HIGHEST: the MXU rounds fp32 operands to bf16 at default
    # precision (measured: max|diff| 0.0144 vs the XLA path — the same
    # magnitude as the einsum_bf16 row in RESULTS "crop2").
    tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (out, W)
    out = jax.lax.dot_general(  # contract W of tmp with W of wx -> (out, out)
        tmp, wx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = out


def crop_resize_pallas(
    imgs: jnp.ndarray,
    params: jnp.ndarray,
    out_size: int,
    method: str = "linear",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched fused crop+resize.

    imgs: (B, H, W) float32. params: (B, 4) float32 rows of
    (sy, ty, sx, tx) as produced by `augment._crop_window_params` —
    scale then translation per axis, the exact arguments
    jax.image.scale_and_translate receives on the default impl path.
    Returns (B, out_size, out_size) float32.
    """
    b, h, w = imgs.shape
    assert params.shape == (b, 4), params.shape
    flops_per_img = 2 * out_size * h * w + 2 * out_size * out_size * w
    return pl.pallas_call(
        functools.partial(_crop_kernel, method=method, out_size=out_size),
        out_shape=jax.ShapeDtypeStruct((b, out_size, out_size), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_img,
            bytes_accessed=4 * b * (h * w + out_size * out_size + 4),
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(params.astype(jnp.float32), imgs.astype(jnp.float32))
