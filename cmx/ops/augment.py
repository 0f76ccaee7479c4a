"""Device-side augmentation graph (jit-compiled, per-sample RNG).

The reference does all augmentation on host CPU inside DataLoader workers
(albumentations: Finetuning/dataset.py:134-163; torchvision: SparK
utils/dataset.py:34-45, MoCo moco_data_module.py:119-132; mmcv pipelines:
CM-UNet cmae/datasets/pipelines/). Here every op is a pure jax function of
(key, image) with static output shapes, vmapped over the batch — the whole
augmentation pipeline compiles into the training step, so the input pipeline
feeds raw cached arrays and never bottlenecks the conv stack.

All ops operate on single images (H, W) float32 unless stated; use
`jax.vmap` + `jax.random.split` for batches (see `vmap_aug`).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def vmap_aug(fn: Callable, key: jax.Array, batch: jnp.ndarray, *args):
    """Apply a per-sample aug with independent per-sample keys."""
    keys = jax.random.split(key, batch.shape[0])
    return jax.vmap(lambda k, x: fn(k, x, *args))(keys, batch)


# ---------------------------------------------------------------- geometry


def _keys_cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic convolution kernel, a=-0.5 (Keys 1981) on |x| — the same
    piecewise polynomial jax.image uses for method="cubic"."""
    out = ((1.5 * x - 2.5) * x) * x + 1.0
    out = jnp.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, out)
    return jnp.where(x >= 2.0, 0.0, out)


def _resize_weight_mat(
    in_size: int,
    out_size: int,
    scale: jnp.ndarray,
    translation: jnp.ndarray,
    method: str = "linear",
    antialias: bool = True,
) -> jnp.ndarray:
    """(in_size, out_size) resampling weights for a 1-D scale+translate.

    Re-derivation of the standard resize weight matrix (identical math to
    jax.image.scale_and_translate's internal weights: half-pixel-centered
    sample positions, kernel widened by 1/scale when downscaling iff
    antialias, per-output-column renormalization, out-of-range columns
    zeroed). Verified against jax.image.scale_and_translate to fp32
    round-off in tests/test_ops.py. Exposing the matrix lets the crop be a
    plain batched matmul (see random_resized_crop impl="einsum") instead of
    a per-sample einsum at Precision.HIGHEST."""
    inv = 1.0 / scale
    kernel_scale = jnp.maximum(inv, 1.0) if antialias else jnp.float32(1.0)
    sample_f = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * inv \
        - translation * inv - 0.5
    x = jnp.abs(sample_f[None, :]
                - jnp.arange(in_size, dtype=jnp.float32)[:, None]) / kernel_scale
    if method in ("linear", "triangle", "bilinear"):
        w = jnp.maximum(0.0, 1.0 - x)
    elif method in ("cubic", "bicubic"):
        w = _keys_cubic_kernel(x)
    else:
        raise ValueError(f"unsupported resize method {method!r}")
    total = jnp.sum(w, axis=0, keepdims=True)
    w = jnp.where(jnp.abs(total) > 1000.0 * jnp.finfo(jnp.float32).eps,
                  w / jnp.where(total != 0, total, 1), 0)
    valid = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return jnp.where(valid[None, :], w, 0)


# Crop implementation knob (task.crop_impl). "scale_translate" calls
# jax.image.scale_and_translate (per-sample einsum at Precision.HIGHEST);
# "einsum" applies the SAME weight matrices (_resize_weight_mat) as two
# explicit fp32 dots — mathematically the identical linear map, fp
# round-off differences only; "einsum_bf16" casts image and weights to
# bf16 with fp32 accumulation (documented numeric deviation, opt-in);
# "pallas" fuses weight construction + both dots into one VMEM-resident
# kernel per image (cmx/ops/pallas_crop.py) — same linear map, fp32
# round-off differences only, built because the weight-matrix CONSTRUCTION
# is the measured cost floor of the XLA formulations (RESULTS "crop2");
# "bank" rounds the crop window to INTEGER extents/offsets (torchvision's
# own get_params quantization) and fetches per-sample weights from a
# precomputed per-extent bank via one-hot matmuls — no per-sample weight
# construction at all (see bank_crop_batch; RESULTS round 3).
CROP_IMPL = "scale_translate"


def _crop_window_box(
    key: jax.Array,
    h: int,
    w: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
):
    """torchvision RandomResizedCrop window draw (continuous).

    Returns (ch, y0, cw, x0): the sampled crop window
    [y0, y0+ch) x [x0, x0+cw). Factored so every `random_resized_crop`
    impl (including the batch-hoisted pallas/bank paths in
    `moco_view_aug_batch`) consumes the identical RNG stream and window
    math."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    cw = jnp.sqrt(area * aspect)
    ch = jnp.sqrt(area / aspect)
    cw = jnp.clip(cw, 1.0, w)
    ch = jnp.clip(ch, 1.0, h)
    y0 = jax.random.uniform(k3, minval=0.0, maxval=1.0) * (h - ch)
    x0 = jax.random.uniform(k4, minval=0.0, maxval=1.0) * (w - cw)
    return ch, y0, cw, x0


def _crop_window_params(
    key: jax.Array,
    h: int,
    w: int,
    out_size: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
):
    """_crop_window_box -> scale_and_translate args (sy, ty, sx, tx)."""
    ch, y0, cw, x0 = _crop_window_box(key, h, w, scale, ratio)
    sy = out_size / ch
    sx = out_size / cw
    return sy, -y0 * sy, sx, -x0 * sx


# ------------------------------------------------------- bank crop (impl)

_BANK_PAD = 4  # bank row margin: kernel support never exceeds 2 taps/side
_BANK_CACHE: dict = {}


def crop_ch_range(
    in_size: int, scale: Tuple[float, float], ratio: Tuple[float, float],
    other_size: int | None = None, axis: str = "h",
) -> Tuple[int, int]:
    """Integer range [ch_min, ch_max] one crop axis can take under the
    torchvision area/aspect draw (used to size the weight bank).

    The two axes have DIFFERENT ranges under an asymmetric aspect draw
    (aspect = w/h in [ratio[0], ratio[1]], area = scale * H * W):
      height ch = sqrt(area / aspect) in [sqrt(s0*A/r1), sqrt(s1*A/r0)]
      width  cw = sqrt(area * aspect) in [sqrt(s0*A*r0), sqrt(s1*A*r1)]
    They coincide only when r0*r1 == 1 (the symmetric 3/4..4/3 default) —
    round-3 advisor finding: the height formula applied to the width axis
    silently clips asymmetric-ratio crops into the wrong bank range."""
    other = other_size or in_size
    area = in_size * other
    if axis == "h":
        lo = math.sqrt(scale[0] * area / ratio[1])
        hi = math.sqrt(scale[1] * area / ratio[0])
    elif axis == "w":
        lo = math.sqrt(scale[0] * area * ratio[0])
        hi = math.sqrt(scale[1] * area * ratio[1])
    else:
        raise ValueError(f"axis must be 'h' or 'w', got {axis!r}")
    return max(1, int(math.floor(lo))), min(in_size, int(math.ceil(hi)))


def _crop_weight_bank(
    in_size: int, out_size: int, method: str, ch_min: int, ch_max: int
) -> jnp.ndarray:
    """(L, P, out) resample-weight bank for integer crop extents
    ch in [ch_min, ch_max], window at offset 0, on a padded row axis
    (P = in_size + 2*_BANK_PAD, row p = input position p - _BANK_PAD).

    Each level's weights are WINDOW-CONFINED: taps are masked to
    [0, ch) and renormalized per output column — i.e. the semantics of
    torchvision's crop-then-resize (the resize never reads outside the
    crop), not scale_and_translate's whole-array taps. Built once per
    (sizes, method, range) as a single vmapped computation; reused across
    steps as a jit constant."""
    key = (in_size, out_size, method, ch_min, ch_max)
    if key not in _BANK_CACHE:
        # Built EAGERLY in numpy on host: _crop_weight_bank is reached from
        # inside jit traces (moco_view_aug_batch), and a device computation
        # here would cache a TRACER from the enclosing trace (measured:
        # UnexpectedTracerError on the second jit using the cache). The
        # concrete array becomes a jit constant for every caller.
        pad = _BANK_PAD
        pos = (np.arange(in_size + 2 * pad, dtype=np.float32) - pad)[None, :, None]
        chs = np.arange(ch_min, ch_max + 1, dtype=np.float32)[:, None, None]
        inv = chs / out_size
        kernel_scale = np.maximum(inv, 1.0)  # antialias on downscale
        sample_f = ((np.arange(out_size, dtype=np.float32)[None, None, :] + 0.5)
                    * inv - 0.5)
        x = np.abs(sample_f - pos) / kernel_scale  # (L, P, out)
        if method in ("linear", "triangle", "bilinear"):
            w = np.maximum(0.0, 1.0 - x)
        elif method in ("cubic", "bicubic"):
            xx = x
            w = ((1.5 * xx - 2.5) * xx) * xx + 1.0
            w = np.where(xx >= 1.0, ((-0.5 * xx + 2.5) * xx - 4.0) * xx + 2.0, w)
            w = np.where(xx >= 2.0, 0.0, w)
        else:
            raise ValueError(f"unsupported resize method {method!r}")
        inside = (pos >= 0.0) & (pos <= chs - 1.0)
        w = np.where(inside, w, 0.0).astype(np.float32)
        total = np.sum(w, axis=1, keepdims=True)
        w = w / np.where(total > 0, total, 1.0)
        # cache the NUMPY array: any jnp conversion executed inside a jit
        # trace yields a tracer, and caching that leaks it into later traces
        _BANK_CACHE[key] = w
    return _BANK_CACHE[key]


def _bank_axis_weights(
    in_size: int, out_size: int, method: str,
    ch: jnp.ndarray, off: jnp.ndarray, ch_min: int, ch_max: int,
) -> jnp.ndarray:
    """(B, in, out) per-sample resample weights, fetched from the bank by
    two one-hot matmuls (level select + integer row shift) — no gathers,
    no per-sample weight CONSTRUCTION (the measured ~77 ms/batch floor of
    the iota/normalize formulation, RESULTS crop2). One-hot dots at
    Precision.HIGHEST select values exactly (single nonzero product per
    output), so the fetched weights are bit-identical to the bank rows."""
    bank = _crop_weight_bank(in_size, out_size, method, ch_min, ch_max)
    levels = jnp.arange(ch_min, ch_max + 1, dtype=jnp.int32)
    onehot_l = (ch[:, None] == levels[None, :]).astype(jnp.float32)  # (B, L)
    slab = jnp.einsum("bl,lpo->bpo", onehot_l, bank,
                      precision=jax.lax.Precision.HIGHEST)
    ii = jnp.arange(in_size, dtype=jnp.int32)[None, :, None]
    pp = jnp.arange(bank.shape[1], dtype=jnp.int32)[None, None, :]
    sel = (pp == ii - off[:, None, None] + _BANK_PAD).astype(jnp.float32)
    return jnp.einsum("bip,bpo->bio", sel, slab,
                      precision=jax.lax.Precision.HIGHEST)


_BLUR_BASIS_CACHE: dict = {}


def _blur_basis(n: int, radius: int) -> jnp.ndarray:
    """(2r+1, n, n) static 0/1 banded basis: basis[t][i, clamp(i+t-r)] = 1.

    A per-sample edge-padded separable blur is then the batched matmul
    B_b = einsum('bt,tij->bij', taps_b, basis) — the EXACT linear map of
    gaussian_blur's replicate-pad depthwise conv (fp32 summation-order
    round-off only), with the p-gate folded into the taps (identity tap =
    delta at t=r)."""
    key = (n, radius)
    if key not in _BLUR_BASIS_CACHE:
        t = np.arange(2 * radius + 1)[:, None]
        i = np.arange(n)[None, :]
        j = np.clip(i + t - radius, 0, n - 1)  # (T, n)
        basis = np.zeros((2 * radius + 1, n, n), np.float32)
        ti = np.broadcast_to(t, j.shape)
        ii = np.broadcast_to(i, j.shape)
        np.add.at(basis, (ti.ravel(), ii.ravel(), j.ravel()), 1.0)
        # cache NUMPY: a jnp conversion inside an enclosing jit trace would
        # cache a tracer and break the next jit (same bug as _BANK_CACHE)
        _BLUR_BASIS_CACHE[key] = basis
    return _BLUR_BASIS_CACHE[key]


def moco_view_tail_matmul(
    ks: jnp.ndarray, rot: jnp.ndarray, out_size: int,
    method: str = "linear",
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    blur_sigma: Tuple[float, float] = (0.1, 2.0),
    blur_radius: int = 3,
) -> jnp.ndarray:
    """The MoCo post-rotation view chain (crop -> blur -> hflip -> vflip)
    composed into TWO batched matmuls per image axis, then the noise stage.

    crop_impl="bank_fused": crop weights come from the integer-window bank
    (same quantization contract as "bank"); the per-sample blur is its
    Toeplitz matrix (exact linear map of the replicate-pad conv); the p=0.5
    flips reverse the composed matrix's output rows/cols (exact
    permutation). The per-axis composition A = flip(B_blur @ W_crop^T) is
    one (out, in) matrix per sample, applied as img -> A_y img A_x^T —
    so the whole tail is MXU work with no vmapped small kernels. RNG
    stream: identical key tree and draw order as the per-stage chain
    (ks[:, 1] crop window, ks[:, 2] blur (p, sigma), ks[:, 3] hflip,
    ks[:, 4] vflip, ks[:, 5] noise)."""
    b, h, w = rot.shape
    hi = jax.lax.Precision.HIGHEST

    # crop windows: same draws as every other impl
    box = jax.vmap(lambda k: jnp.stack(_crop_window_box(
        k, h, w, scale, ratio)))(ks[:, 1])
    ch, y0, cw, x0 = box[:, 0], box[:, 1], box[:, 2], box[:, 3]
    cmn_y, cmx_y = crop_ch_range(h, scale, ratio, w, axis="h")
    cmn_x, cmx_x = crop_ch_range(w, scale, ratio, h, axis="w")
    chi = jnp.clip(jnp.round(ch).astype(jnp.int32), cmn_y, cmx_y)
    cwi = jnp.clip(jnp.round(cw).astype(jnp.int32), cmn_x, cmx_x)
    y0i = jnp.clip(jnp.round(y0).astype(jnp.int32), 0, h - chi)
    x0i = jnp.clip(jnp.round(x0).astype(jnp.int32), 0, w - cwi)
    wy = _bank_axis_weights(h, out_size, method, chi, y0i, cmn_y, cmx_y)
    wx = _bank_axis_weights(w, out_size, method, cwi, x0i, cmn_x, cmx_x)

    # blur taps: gaussian_blur's exact draw order (kp, ksigma = split(key))
    kp_ks = jax.vmap(lambda k: jnp.stack(jax.random.split(k)))(ks[:, 2])
    apply_blur = jax.vmap(jax.random.uniform)(kp_ks[:, 0]) < 0.5
    sigma = jax.vmap(lambda k: jax.random.uniform(
        k, minval=blur_sigma[0], maxval=blur_sigma[1]))(kp_ks[:, 1])
    taps = jax.vmap(lambda s: _gaussian_kernel_1d(s, blur_radius))(sigma)
    delta = jnp.zeros((2 * blur_radius + 1,),
                      jnp.float32).at[blur_radius].set(1.0)
    taps = jnp.where(apply_blur[:, None], taps, delta[None, :])  # p-gate
    basis = _blur_basis(out_size, blur_radius)
    blur_m = jnp.einsum("bt,tij->bij", taps, basis, precision=hi)

    # compose per-axis: A = blur @ crop^T, then flips reverse output axes
    a_y = jnp.einsum("bij,bpj->bip", blur_m, wy, precision=hi)  # (B,out,h)
    a_x = jnp.einsum("bij,bpj->bip", blur_m, wx, precision=hi)  # (B,out,w)
    flip_h = jax.vmap(jax.random.uniform)(ks[:, 3]) < 0.5  # x axis
    flip_v = jax.vmap(jax.random.uniform)(ks[:, 4]) < 0.5  # y axis
    a_y = jnp.where(flip_v[:, None, None], a_y[:, ::-1, :], a_y)
    a_x = jnp.where(flip_h[:, None, None], a_x[:, ::-1, :], a_x)

    # apply: two batched image-side matmuls
    t = jnp.einsum("bih,bhw->biw", a_y, rot.astype(jnp.float32), precision=hi)
    img = jnp.einsum("biw,bjw->bij", t, a_x, precision=hi)

    return jax.vmap(lambda k, im: gaussian_noise_max10(k, im, p=0.5))(
        ks[:, 5], img)


def bank_crop_batch(
    imgs: jnp.ndarray,
    box: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    out_size: int,
    method: str = "linear",
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """RandomResizedCrop over a batch via precomputed weight banks.

    `box` = continuous (ch, y0, cw, x0) arrays of shape (B,) from
    `_crop_window_box` (same RNG stream as every other impl); they are
    rounded to INTEGER windows here. Deviation vs the continuous impls:
    window quantization only — and torchvision itself quantizes
    (RandomResizedCrop.get_params returns int(round(..)) extents and
    randint offsets), and its tensor resize never reads outside the crop,
    both of which this path reproduces; the continuous scale_and_translate
    formulation is the one that deviates from the reference there
    (PARITY §2.5)."""
    b, h, w = imgs.shape
    ch, y0, cw, x0 = box
    cmn_y, cmx_y = crop_ch_range(h, scale, ratio, w, axis="h")
    cmn_x, cmx_x = crop_ch_range(w, scale, ratio, h, axis="w")
    chi = jnp.clip(jnp.round(ch).astype(jnp.int32), cmn_y, cmx_y)
    cwi = jnp.clip(jnp.round(cw).astype(jnp.int32), cmn_x, cmx_x)
    y0i = jnp.clip(jnp.round(y0).astype(jnp.int32), 0, h - chi)
    x0i = jnp.clip(jnp.round(x0).astype(jnp.int32), 0, w - cwi)
    wy = _bank_axis_weights(h, out_size, method, chi, y0i, cmn_y, cmx_y)
    wx = _bank_axis_weights(w, out_size, method, cwi, x0i, cmn_x, cmx_x)
    t = jnp.einsum("bho,bhw->bow", wy, imgs.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bwp,bow->bop", wx, t,
                      precision=jax.lax.Precision.HIGHEST)


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    out_size: int,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    method: str = "linear",
    impl: str | None = None,
) -> jnp.ndarray:
    """torchvision-style RandomResizedCrop as one fused resample.

    Chooses target area/aspect like torchvision (uniform area in `scale`,
    log-uniform aspect in `ratio`), then resamples the crop window straight to
    (out_size, out_size) — crop + resize is one linear map, no dynamic shapes.
    `impl` picks how that map executes (see CROP_IMPL; None -> CROP_IMPL):
    jax.image.scale_and_translate, or the same separable weight matrices
    applied as two explicit batched dots.

    Reference usages: SparK RandomResizedCrop(256, scale=(0.67, 1))
    (Spark/utils/dataset.py:38), MoCo RandomResizedCrop(224, scale=(0.2, 1))
    (moco_data_module.py:123), CM-UNet RandomResizedCrop(256, scale=(0.2, 1))
    (configs/cmunet_config.py:49).
    """
    h, w = img.shape[0], img.shape[1]
    impl = impl or CROP_IMPL
    if impl == "bank_fused":
        impl = "bank"  # the fusion exists only at the batch level
        # (moco_view_aug_batch); the crop itself is the bank crop
    if impl == "bank":
        box = _crop_window_box(key, h, w, scale, ratio)
        img3 = img[None] if img.ndim == 2 else jnp.moveaxis(img, -1, 0)
        out = bank_crop_batch(img3.astype(jnp.float32),
                              tuple(jnp.broadcast_to(v, (img3.shape[0],))
                                    for v in box),
                              out_size, method=method, scale=scale,
                              ratio=ratio)
        return out[0] if img.ndim == 2 else jnp.moveaxis(out, 0, -1)
    sy, ty, sx, tx = _crop_window_params(key, h, w, out_size, scale, ratio)
    if impl == "pallas":
        from cmx.ops.pallas_crop import crop_resize_pallas

        assert img.ndim == 2, "pallas crop impl supports (H, W) images"
        params = jnp.stack([sy, ty, sx, tx]).astype(jnp.float32)[None]
        return crop_resize_pallas(
            img[None].astype(jnp.float32), params, out_size, method=method
        )[0]
    if impl in ("einsum", "einsum_bf16"):
        wy = _resize_weight_mat(h, out_size, sy, ty, method)  # (h, out)
        wx = _resize_weight_mat(w, out_size, sx, tx, method)  # (w, out)
        img3 = (img[..., None] if img.ndim == 2 else img).astype(jnp.float32)
        if impl == "einsum_bf16":
            # bf16 operands at default (fastest) precision; the MXU
            # accumulates partials in fp32 internally.
            img3, wy, wx = (a.astype(jnp.bfloat16) for a in (img3, wy, wx))
            prec = None
        else:
            # fp32-exact dots so "einsum" == scale_and_translate up to fp32
            # round-off on TPU too (DEFAULT would run 1-pass bf16 there).
            prec = jax.lax.Precision.HIGHEST
        # (h, w, c) -> (out, w, c) -> (out, out, c)
        t = jnp.einsum("ho,hwc->owc", wy, img3, precision=prec)
        out = jnp.einsum("wp,owc->opc", wx, t, precision=prec).astype(jnp.float32)
    else:
        img3 = img[..., None] if img.ndim == 2 else img
        out = jax.image.scale_and_translate(
            img3.astype(jnp.float32),
            (out_size, out_size, img3.shape[-1]),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([ty, tx]),
            method=method,
            antialias=True,
        )
    return out[..., 0] if img.ndim == 2 else out


def random_hflip(key: jax.Array, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    return jnp.where(jax.random.uniform(key) < p, jnp.flip(img, axis=1), img)


def random_vflip(key: jax.Array, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    return jnp.where(jax.random.uniform(key) < p, jnp.flip(img, axis=0), img)


def random_rot90(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """Uniform k in {0,1,2,3} quarter turns (albumentations RandomRotate90)."""
    k = jax.random.randint(key, (), 0, 4)
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
        ],
        img,
    )


# Rotation formulation used by moco_view_aug. "nearest" is the
# reference-faithful gather (now a single flat 1-D take, see
# random_rotation); "shear3" is the rot90+three-shear reformulation
# (contiguous vmapped dynamic slices instead of a full-image gather).
# On-TPU A/B (tools/ab_moco_aug.py rot, runs/r4/moco_aug.log): shear3 390 ms
# vs flat-nearest 328 ms per 128x256² batch AND 29% per-pixel rounding
# deviation — the shears measured slower than the flat take, so "nearest"
# stays the default and shear3 remains an opt-in knob.
ROTATION_METHOD = "nearest"


def _shear_rows(img: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Shift row y left by shifts[y] (integer, zero-fill): one vmapped
    dynamic_slice of a zero-padded row — contiguous slices, no pointwise
    gather."""
    h, w = img.shape
    pad = jnp.concatenate(
        [jnp.zeros((h, w), img.dtype), img, jnp.zeros((h, w), img.dtype)], 1)

    def row(r, s):
        return jax.lax.dynamic_slice(r, (w + s,), (w,))

    return jax.vmap(row)(pad, shifts)


def _shear_rows_unroll(
    img: jnp.ndarray, shifts: jnp.ndarray, max_shift: int
) -> jnp.ndarray:
    """_shear_rows with a static shift bound, as 2m+1 STATIC slices +
    one-hot masked adds (no conv, no gather, no dynamic slice).

    out[i, j] = img[i, j + shifts[i]] (zero fill, |shifts| <= max_shift)
    = sum_d onehot[i, d] * pad[i, j + d]. Every term is a VPU elementwise
    multiply by an exact 0/1 mask and at most ONE product per output is
    non-zero, so the sum is bit-exact fp32 on TPU — unlike the depthwise
    conv formulation (_shear_rows_conv), whose MXU lowering rounds the
    pixel VALUES to bf16 even under Precision.HIGHEST (rot2 re-measure,
    artifacts/r2/moco_aug3_rot2.log: conv mismatch 0.8774 unchanged
    post-fix; unroll_vs_dus_bitmatch=true at 81.3 vs 288.9 ms per
    128x256² shear stack). Production shear3 path."""
    h, w = img.shape
    m = int(max_shift)
    pad = jnp.pad(img, ((0, 0), (m, m)))  # pad[i, k] = img[i, k - m]
    onehot = (shifts[:, None] + m
              == jnp.arange(2 * m + 1, dtype=shifts.dtype)[None, :]
              ).astype(img.dtype)
    out = jnp.zeros_like(img)
    for d in range(2 * m + 1):
        out = out + onehot[:, d:d + 1] * jax.lax.slice_in_dim(
            pad, d, d + w, axis=1)
    return out


def _shear_rows_unroll_radix(
    img: jnp.ndarray, shifts: jnp.ndarray, max_shift: int, radix: int = 8
) -> jnp.ndarray:
    """_shear_rows_unroll in two radix stages: shifts = radix*q + f.

    Stage 1 applies the fine shift f in [0, radix) on a zero-extended
    intermediate wide enough for every coarse step; stage 2 applies the
    coarse shift radix*q. Integer zero-fill shifts compose exactly
    (img_z[j + rq + f] == img_z[j + s]), so the result is BIT-IDENTICAL
    to _shear_rows_unroll while doing ~(radix + 2m/radix) masked adds
    instead of 2m+1 — e.g. 8 + 14 vs 107 passes at m=53 (the x-shear of a
    256² rotation). Same exact-0/1-mask argument as _shear_rows_unroll:
    at most one non-zero product per output, fp32-exact on TPU."""
    h, w = img.shape
    m = int(max_shift)
    r = int(radix)
    if 2 * m + 1 <= r + 3:  # small bound: single-stage is already cheaper
        return _shear_rows_unroll(img, shifts, m)
    nq = (m + r - 1) // r
    K = nq * r
    f = jnp.mod(shifts, r).astype(shifts.dtype)
    q = ((shifts - f) // r).astype(shifts.dtype)  # in [-nq, m // r]
    pad = jnp.pad(img, ((0, 0), (K, K + r)))  # pad[i, a] = img_z[i, a - K]
    oh_f = (f[:, None] == jnp.arange(r, dtype=shifts.dtype)[None, :]
            ).astype(img.dtype)
    t = jnp.zeros((h, w + 2 * K), img.dtype)
    for d in range(r):
        t = t + oh_f[:, d:d + 1] * jax.lax.slice_in_dim(
            pad, d, d + w + 2 * K, axis=1)
    # t[i, k] = img_z[i, k - K + f_i] for k in [0, w + 2K)
    oh_q = (q[:, None]
            == (jnp.arange(2 * nq + 1, dtype=shifts.dtype) - nq)[None, :]
            ).astype(img.dtype)
    out = jnp.zeros_like(img)
    for iq, qv in enumerate(range(-nq, nq + 1)):
        start = K + r * qv
        out = out + oh_q[:, iq:iq + 1] * jax.lax.slice_in_dim(
            t, start, start + w, axis=1)
    return out


def _shear_rows_conv(
    img: jnp.ndarray, shifts: jnp.ndarray, max_shift: int
) -> jnp.ndarray:
    """_shear_rows with a static shift bound, as ONE depthwise 1-D conv.

    out[i, j] = img[i, j + shifts[i]] (zero fill, |shifts| <= max_shift),
    written as a correlation of each row with a one-hot kernel selecting its
    shift: rows become channels, the per-row one-hot kernels become a
    grouped-conv rhs. Bit-identical to _shear_rows (integer shifts of the
    same zero-padded rows) but structured compute instead of h dynamic
    slices — XLA lowers vmapped dynamic slices to serialized DUS loops
    (~130 ms per 128x256² shear, RESULTS round 4) while a depthwise conv
    vectorizes on the VPU."""
    h, w = img.shape
    m = int(max_shift)
    pad = jnp.pad(img, ((0, 0), (m, m)))  # pad[i, k] = img[i, k - m]
    # out[i, j] = pad[i, j + shifts[i] + m] = sum_d pad[i, j + d] * K[d, i]
    onehot = (shifts[None, :] + m
              == jnp.arange(2 * m + 1, dtype=shifts.dtype)[:, None])
    lhs = pad.T[None]                                    # (1, w+2m, h) NWC
    rhs = onehot.astype(img.dtype)[:, None, :]           # (2m+1, 1, h) WIO
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=h,
        # TPU convs round operands to bf16, so the one-hot selection
        # returns bf16-rounded pixel VALUES (rot2 A/B: 88% of pixels off
        # vs the exact take; CPU is bit-exact). Precision.HIGHEST does
        # NOT rescue it on this backend — the re-measure with this flag
        # (artifacts/r2/moco_aug3_rot2.log) shows mismatch 0.8774
        # UNCHANGED. Kept for the A/B record; production shear3 uses
        # _shear_rows_unroll (bit-exact, 81 vs 66 ms).
        precision=jax.lax.Precision.HIGHEST)
    return out[0].T


def _rotate_shear3(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation as rot90(k) + three integer shears (x, y, x).

    angle = k*90° + phi, phi in [-45°, 45°]; rot90 is free (layout), each
    shear is a per-row integer shift (|tan(phi/2)| <= 0.4142). The shears
    apply the inverse warp, so phi and the quarter count negate vs the
    forward rotation. Deviation vs the direct nearest gather: per-pixel
    rounding order only — measured corr >= 0.9996 / mean|diff| <= 0.02 on
    smooth 256² fields over random angles (tools/ab_moco_aug.py); corners
    zero-fill the same way. Square images only."""
    h, w = img.shape
    assert h == w, "shear3 rotation requires square images"
    quarter = jnp.round(angle / (jnp.pi / 2)).astype(jnp.int32)
    phi = -(angle - quarter * (jnp.pi / 2))
    img = jax.lax.switch(
        (-quarter) % 4,
        [lambda x: x,
         lambda x: jnp.rot90(x, 1),
         lambda x: jnp.rot90(x, 2),
         lambda x: jnp.rot90(x, 3)],
        img,
    )
    a = -jnp.tan(phi / 2.0)
    b = jnp.sin(phi)
    yy = jnp.arange(h) - (h - 1) / 2.0
    xx = jnp.arange(w) - (w - 1) / 2.0
    sx = jnp.round(a * yy).astype(jnp.int32)
    sy = jnp.round(b * xx).astype(jnp.int32)
    # Static shift bounds: |a| <= tan(pi/8), |b| <= sin(pi/4) since
    # phi in [-pi/4, pi/4]; +1 covers the 0.5 rounding headroom.
    mx = int(math.tan(math.pi / 8) * (h - 1) / 2 + 0.5) + 1
    my = int(math.sin(math.pi / 4) * (w - 1) / 2 + 0.5) + 1
    # radix two-stage unroll: bit-identical to the single-stage unroll
    # (tests/test_ops.py) with ~4-5x fewer masked adds per shear
    img = _shear_rows_unroll_radix(img, sx, mx)
    img = _shear_rows_unroll_radix(img.T, sy, my).T
    img = _shear_rows_unroll_radix(img, sx, mx)
    return img.astype(jnp.float32)


def random_rotation(
    key: jax.Array, img: jnp.ndarray, max_degrees: float = 180.0, p: float = 1.0,
    method: str = "nearest",
) -> jnp.ndarray:
    """Arbitrary-angle rotation about the center, zero-padded corners.

    MoCo's RandomApply([RandomRotation(180)], p=0.5)
    (moco_data_module.py:121). torchvision's RandomRotation default
    interpolation is NEAREST — method="nearest" matches it with a SINGLE
    gather (bilinear needs 4 corner gathers; gathers are the dominant cost of
    this op on TPU — measured 4x slower for "bilinear"). method="shear3"
    replaces the gather with the rot90+three-shear formulation
    (_rotate_shear3) — same distribution, per-pixel rounding deviation only.
    """
    assert img.ndim == 2, (
        f"random_rotation expects a single (H, W) image (vmap over batch/"
        f"channels via vmap_aug); got shape {img.shape}")
    kp, ka = jax.random.split(key)
    angle = jnp.deg2rad(jax.random.uniform(ka, minval=-max_degrees, maxval=max_degrees))
    h, w = img.shape[0], img.shape[1]
    if method == "shear3":
        rot = _rotate_shear3(img.astype(jnp.float32), angle)
        return jnp.where(jax.random.uniform(kp) < p, rot, img)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy - cy
    xx = xx - cx
    c, s = jnp.cos(angle), jnp.sin(angle)
    src_y = c * yy - s * xx + cy
    src_x = s * yy + c * xx + cx
    if method == "bilinear":
        rot = jax.scipy.ndimage.map_coordinates(
            img.astype(jnp.float32), [src_y, src_x], order=1,
            mode="constant", cval=0.0,
        )
    else:
        iy = jnp.round(src_y).astype(jnp.int32)
        ix = jnp.round(src_x).astype(jnp.int32)
        inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        # One flat 1-D take instead of the 2-D img[iy, ix] gather: bit
        # identical (clipped linear index == gather of clipped coords) and
        # 21% faster on this TPU — 328 vs 415 ms per 128x256² batch
        # (tools/ab_moco_aug.py rot, runs/r4/moco_aug.log: flat
        # pixel_mismatch_vs_direct = 0.0).
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        rot = jnp.take(img.reshape(-1), idx.reshape(-1)).reshape(h, w)
        rot = jnp.where(inside, rot, 0.0).astype(jnp.float32)
    return jnp.where(jax.random.uniform(kp) < p, rot, img)


def batch_rotate_nearest(
    keys: jax.Array, imgs: jnp.ndarray, max_degrees: float = 180.0,
    p: float = 1.0,
) -> jnp.ndarray:
    """Whole-batch `random_rotation(method="nearest")`: ONE flat take.

    Bit-identical to `vmap(random_rotation)` — same per-image key splits,
    same index math, the (B,H,W) batch gathered through a single
    `jnp.take` on the flattened array instead of B vmapped takes. Measured
    149.5 vs 178.8 ms per 128x256² batch on v5e with pixel mismatch 0.0
    (tools/ab_moco_aug.py rot2, "flat_global" row, artifacts/r2)."""
    b, h, w = imgs.shape
    kp = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    ka = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
    angles = jnp.deg2rad(jax.vmap(
        lambda k: jax.random.uniform(k, minval=-max_degrees,
                                     maxval=max_degrees))(ka))
    apply = jax.vmap(jax.random.uniform)(kp) < p
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy - cy
    xx = xx - cx
    c = jnp.cos(angles)[:, None, None]
    s = jnp.sin(angles)[:, None, None]
    src_y = c * yy[None] - s * xx[None] + cy
    src_x = s * yy[None] + c * xx[None] + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = base + jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    rot = jnp.take(imgs.reshape(-1), idx.reshape(-1)).reshape(b, h, w)
    rot = jnp.where(inside, rot, 0.0).astype(jnp.float32)
    return jnp.where(apply[:, None, None], rot, imgs)


def shift_pixel_crop(
    key: jax.Array, img: jnp.ndarray, out_size: int = 224, max_pixel: int = 0
) -> jnp.ndarray:
    """Center crop to out_size with a random offset <= max_pixel.

    CM-UNet's ShiftPixel (cmae/datasets/pipelines/processing.py:98-127):
    view1 uses max_pixel=0 (pure center crop), view2 max_pixel=31.
    """
    h, w = img.shape[0], img.shape[1]
    base_y = (h - out_size) // 2
    base_x = (w - out_size) // 2
    ky, kx = jax.random.split(key)
    if max_pixel > 0:
        dy = jax.random.randint(ky, (), 0, max_pixel + 1)
        dx = jax.random.randint(kx, (), 0, max_pixel + 1)
    else:
        dy = dx = 0
    y0 = jnp.clip(base_y + dy, 0, h - out_size)
    x0 = jnp.clip(base_x + dx, 0, w - out_size)
    return jax.lax.dynamic_slice(img, (y0, x0), (out_size, out_size))


# ---------------------------------------------------------------- intensity


def gaussian_noise(
    key: jax.Array, img: jnp.ndarray, sigma: float = 0.1, p: float = 1.0
) -> jnp.ndarray:
    """Additive N(0, sigma). MoCo uses sigma = max(img)/10
    (moco_data_module.py:199-213) — pass sigma='max10' via gaussian_noise_max10."""
    kp, kn = jax.random.split(key)
    noisy = img + sigma * jax.random.normal(kn, img.shape, jnp.float32)
    return jnp.where(jax.random.uniform(kp) < p, noisy, img)


def gaussian_noise_max10(key: jax.Array, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    sigma = jnp.max(img) / 10.0
    kp, kn = jax.random.split(key)
    noisy = img + sigma * jax.random.normal(kn, img.shape, jnp.float32)
    return jnp.where(jax.random.uniform(kp) < p, noisy, img)


def _gaussian_kernel_1d(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(x / jnp.maximum(sigma, 1e-3)))
    return k / jnp.sum(k)


def gaussian_blur(
    key: jax.Array,
    img: jnp.ndarray,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    radius: int = 3,
    p: float = 1.0,
) -> jnp.ndarray:
    """Separable Gaussian blur with random sigma; static kernel radius.

    Stands in for albumentations GaussianBlur (Finetuning/dataset.py) and the
    SimCLR-style GaussianBlur in MoCo (sigma 0.1-2). Implemented as two
    depthwise lax convolutions ((2r+1,1) then (1,2r+1)) — one fused XLA conv
    per axis; a per-row jnp.convolve formulation was ~10x slower on TPU.
    """
    kp, ks = jax.random.split(key)
    sigma = jax.random.uniform(ks, minval=sigma_range[0], maxval=sigma_range[1])
    k1 = _gaussian_kernel_1d(sigma, radius)
    x = img.astype(jnp.float32)[None, :, :, None]  # NHWC singleton
    pad = radius
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kv = k1.reshape(2 * radius + 1, 1, 1, 1)
    kh = k1.reshape(1, 2 * radius + 1, 1, 1)
    y = jax.lax.conv_general_dilated(
        xp, kv, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        y, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    xc = y[0, :, :, 0]
    return jnp.where(jax.random.uniform(kp) < p, xc, img)


def random_brightness_contrast(
    key: jax.Array,
    img: jnp.ndarray,
    brightness_limit: float = 0.2,
    contrast_limit: float = 0.2,
    p: float = 1.0,
) -> jnp.ndarray:
    """albumentations RandomBrightnessContrast on float images:
    out = img * (1 + contrast) + brightness, with brightness added directly
    (albumentations' brightness_by_max scales beta by MAX_VALUES_BY_DTYPE,
    which is 1.0 for float32)."""
    kp, kb, kc = jax.random.split(key, 3)
    alpha = 1.0 + jax.random.uniform(kc, minval=-contrast_limit, maxval=contrast_limit)
    beta = jax.random.uniform(kb, minval=-brightness_limit, maxval=brightness_limit)
    out = img * alpha + beta
    return jnp.where(jax.random.uniform(kp) < p, out, img)


def _down_up(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    lh, lw = max(int(h * scale), 1), max(int(w * scale), 1)
    small = jax.image.resize(img, (lh, lw), method="nearest")
    return jax.image.resize(small, (h, w), method="nearest")


def downscale(key: jax.Array, img: jnp.ndarray, scale: float = 0.25, p: float = 1.0) -> jnp.ndarray:
    """Quality-loss aug: resize down by `scale` then back up (nearest), like
    albumentations Downscale in Finetuning/dataset.py."""
    return jnp.where(jax.random.uniform(key) < p, _down_up(img, scale), img)


def downscale_random(
    key: jax.Array, img: jnp.ndarray,
    scale_range: Tuple[float, float] = (0.5, 1.0), p: float = 1.0,
    n_levels: int = 6,
) -> jnp.ndarray:
    """albumentations Downscale(scale_min, scale_max): random quality loss.

    A continuous random scale would need dynamic shapes (unjittable) or a
    full-image gather (~110 ms/batch on this TPU); instead the scale range is
    quantized to `n_levels` static levels chosen by lax.switch — each branch
    is two static nearest resizes. Deviation (discretized scale distribution)
    noted in PARITY.md.
    """
    kp, kl = jax.random.split(key)
    lvl = jax.random.randint(kl, (), 0, n_levels)
    scales = [
        scale_range[0] + (scale_range[1] - scale_range[0]) * i / (n_levels - 1)
        for i in range(n_levels)
    ]

    def branch(s):
        if s >= 1.0:
            return lambda x: x
        return lambda x: _down_up(x, s)

    out = jax.lax.switch(lvl, [branch(s) for s in scales], img)
    return jnp.where(jax.random.uniform(kp) < p, out, img)


# ---------------------------------------------------------------- pipelines


def _albumentations_gauss_noise(
    key: jax.Array, img: jnp.ndarray,
    var_limit: Tuple[float, float] = (10.0, 50.0), p: float = 1.0,
) -> jnp.ndarray:
    """albumentations GaussNoise(var_limit): sigma = sqrt(U(var_limit)),
    added to the pixel values AS-IS regardless of dtype — on the reference's
    z-scored float images that means sigma ~ U(3.16, 7.07), i.e. noise several
    times the signal std. Faithful to the reference's actual behavior
    (Finetuning/dataset.py:147 applies it to Intensity_normalizer output);
    the magnitude looks extreme but p is low."""
    kp, kv, kn = jax.random.split(key, 3)
    var = jax.random.uniform(kv, minval=var_limit[0], maxval=var_limit[1])
    noisy = img + jnp.sqrt(var) * jax.random.normal(kn, img.shape, jnp.float32)
    return jnp.where(jax.random.uniform(kp) < p, noisy, img)


def finetune_train_aug(key: jax.Array, img: jnp.ndarray, mask: jnp.ndarray):
    """The supervised fine-tune augmentation chain
    (Finetuning/dataset.py:134-163), applied on the 256-cached pair.

    Reference order and EXACT albumentations parameters:
      RandomCrop(475)                      [identity on 475x475 originals]
      GaussNoise(var_limit=(10, 50), p=.1) -> sigma = sqrt(U(10, 50)),
                                             applied to float values as-is
      GaussianBlur(blur_limit=(5, 11), sigma_limit=(.5, 1), p=.2)
                                           -> sigma U(.5, 1); static radius 5
                                             (an 11-tap kernel; smaller odd
                                             kernel sizes differ only in the
                                             <1e-3 tail at sigma <= 1)
      RandomBrightnessContrast(brightness_limit=.25, contrast_limit=.2
                                [albumentations default], p=.15)
                                           -> img*(1+c) + b, b in +-.25
                                             (albumentations adds beta
                                             directly for float images)
      Downscale(scale_min=.5, scale_max=1, p=.25) -> discretized scale levels
      OneOf{HFlip, VFlip, Rotate90, GaussNoise(var (10, 50))} p=.75

    Geometric ops apply to image and mask jointly; intensity ops to the image
    only. Deviation: the reference augments at 475 then resizes to 256; we
    augment the 256 cache — same distribution up to resampling order
    (flagged in PARITY.md).
    """
    ks = jax.random.split(key, 6)
    img = _albumentations_gauss_noise(ks[0], img, (10.0, 50.0), p=0.1)
    img = gaussian_blur(ks[1], img, sigma_range=(0.5, 1.0), radius=5, p=0.2)
    img = random_brightness_contrast(
        ks[2], img, brightness_limit=0.25, contrast_limit=0.2, p=0.15
    )
    img = downscale_random(ks[3], img, scale_range=(0.5, 1.0), p=0.25)

    # OneOf with p=0.75: pick one of 4 branches uniformly.
    do = jax.random.uniform(ks[4]) < 0.75
    branch = jax.random.randint(ks[5], (), 0, 4)
    kb = jax.random.fold_in(key, 7)

    def apply_pair(i, im, mk):
        return jax.lax.switch(
            i,
            [
                lambda a, b: (jnp.flip(a, axis=1), jnp.flip(b, axis=1)),
                lambda a, b: (jnp.flip(a, axis=0), jnp.flip(b, axis=0)),
                lambda a, b: (jnp.rot90(a), jnp.rot90(b)),
                lambda a, b: (
                    _albumentations_gauss_noise(kb, a, (10.0, 50.0), p=1.0),
                    b,
                ),
            ],
            im,
            mk,
        )

    img2, mask2 = apply_pair(branch, img, mask)
    img = jnp.where(do, img2, img)
    mask = jnp.where(do, mask2, mask)
    return img, mask


def spark_pretrain_aug(key: jax.Array, img: jnp.ndarray, out_size: int = 256) -> jnp.ndarray:
    """SparK pretrain pipeline: RandomResizedCrop(out, scale (0.67, 1)) + HFlip
    (Spark/utils/dataset.py:34-45)."""
    k1, k2 = jax.random.split(key)
    img = random_resized_crop(k1, img, out_size, scale=(0.67, 1.0), method="cubic")
    return random_hflip(k2, img)


# MoCo crop resample. The reference's RandomResizedCrop(224, scale=(0.2, 1))
# passes no interpolation (pl_bolts/.../moco_data_module.py:123), so it uses
# torchvision's DEFAULT = BILINEAR -> "linear" here. (SparK and CM-UNet
# request bicubic explicitly and keep method="cubic" at their call sites.)
# Until 2026-08-18 this chain used "cubic" — an undocumented deviation; the
# committed round-2 moco matrix column was captured with it (recapture and
# delta in RESULTS.md). "cubic" remains available via task.crop_method.
CROP_METHOD = "linear"


def moco_view_aug(
    key: jax.Array, img: jnp.ndarray, out_size: int = 224,
    rotation_method: str | None = None, crop_method: str | None = None,
    crop_impl: str | None = None,
) -> jnp.ndarray:
    """One MoCo 'global' view (moco_data_module.py:119-132): RandomRotation(180)
    p.5 -> RandomResizedCrop(224, (0.2, 1)) -> GaussianBlur p.5 -> HFlip ->
    VFlip -> GaussNoise(max/10) p.5.

    rotation_method / crop_method / crop_impl override the module defaults
    (task.rotation_method / task.crop_method / task.crop_impl in config;
    None -> ROTATION_METHOD / CROP_METHOD / CROP_IMPL)."""
    ks = jax.random.split(key, 6)
    img = random_rotation(
        ks[0], img, 180.0, p=0.5, method=rotation_method or ROTATION_METHOD)
    return _moco_view_tail(ks, img, out_size, crop_method, crop_impl)


def _moco_view_tail(ks, img, out_size, crop_method, crop_impl):
    """moco_view_aug after rotation: crop -> blur -> flips -> noise."""
    img = random_resized_crop(ks[1], img, out_size, scale=(0.2, 1.0),
                              method=crop_method or CROP_METHOD,
                              impl=crop_impl or CROP_IMPL)
    return _moco_view_post_crop(ks, img)


def _moco_view_post_crop(ks, img):
    """moco_view_aug after the crop: blur -> flips -> noise."""
    img = gaussian_blur(ks[2], img, sigma_range=(0.1, 2.0), radius=3, p=0.5)
    img = random_hflip(ks[3], img)
    img = random_vflip(ks[4], img)
    img = gaussian_noise_max10(ks[5], img, p=0.5)
    return img


def moco_view_aug_batch(
    key: jax.Array, batch: jnp.ndarray, out_size: int = 224,
    rotation_method: str | None = None, crop_method: str | None = None,
    crop_impl: str | None = None,
) -> jnp.ndarray:
    """`vmap_aug(moco_view_aug, ...)` with the rotation hoisted out of the
    vmap into ONE whole-batch flat take (`batch_rotate_nearest`).

    Bit-identical to the vmapped path (same per-image key tree:
    `split(key, B)` then `split(k_i, 6)`; regression-tested) and ~16%
    faster on the rotation stage on v5e. rotation_method="shear3" runs the
    gather-free vmapped shear rotation (same key tree; the unrolled shears
    are already whole-batch-efficient under vmap); other non-"nearest"
    methods fall back to the plain vmapped pipeline."""
    method = rotation_method or ROTATION_METHOD
    if method not in ("nearest", "shear3"):
        return vmap_aug(moco_view_aug, key, batch, out_size,
                        rotation_method, crop_method, crop_impl)
    keys = jax.random.split(key, batch.shape[0])
    ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)     # (B, 6) keys
    if method == "shear3":
        rot = jax.vmap(lambda k, im: random_rotation(
            k, im, 180.0, p=0.5, method="shear3"))(ks[:, 0], batch)
    else:
        rot = batch_rotate_nearest(ks[:, 0], batch, 180.0, p=0.5)
    if (crop_impl or CROP_IMPL) == "bank_fused":
        # Full matmul tail: crop+blur+flips composed into two batched
        # matmuls per axis (moco_view_tail_matmul), noise after. Same key
        # tree and window/blur/flip draws as the per-stage chain; blur is
        # the exact Toeplitz of the replicate-pad conv (fp round-off),
        # crop carries the bank quantization contract.
        return moco_view_tail_matmul(ks, rot, out_size,
                                     method=crop_method or CROP_METHOD)
    if (crop_impl or CROP_IMPL) == "bank":
        # Batch-hoisted bank crop: window draws from the SAME key tree
        # (ks[:, 1]) and window math (_crop_window_box), weights fetched
        # from the per-extent bank with one-hot matmuls — the crop stage
        # has NO per-sample weight construction (RESULTS round 3).
        b, h, w = rot.shape
        box = jax.vmap(lambda k: jnp.stack(_crop_window_box(
            k, h, w, (0.2, 1.0), (3 / 4, 4 / 3))))(ks[:, 1])
        cropped = bank_crop_batch(
            rot, (box[:, 0], box[:, 1], box[:, 2], box[:, 3]), out_size,
            method=crop_method or CROP_METHOD)
        return jax.vmap(_moco_view_post_crop)(ks, cropped)
    if (crop_impl or CROP_IMPL) == "pallas":
        # Hoist the crop out of the vmap too: ONE fused kernel over the
        # batch (grid=B) instead of B vmapped crops. Same per-image key
        # tree (ks[:, 1]) and window math (_crop_window_params), so the
        # sampled windows are bit-identical to the per-sample path.
        from cmx.ops.pallas_crop import crop_resize_pallas

        b, h, w = rot.shape
        params = jax.vmap(lambda k: jnp.stack(_crop_window_params(
            k, h, w, out_size, (0.2, 1.0), (3 / 4, 4 / 3))))(ks[:, 1])
        cropped = crop_resize_pallas(
            rot, params, out_size, method=crop_method or CROP_METHOD)
        return jax.vmap(_moco_view_post_crop)(ks, cropped)
    return jax.vmap(lambda k6, im: _moco_view_tail(
        k6, im, out_size, crop_method, crop_impl))(ks, rot)


def cmunet_two_views(
    key: jax.Array, img: jnp.ndarray, out_size: int = 224, shift: int = 31
):
    """CM-UNet dual-view pipeline (cmae/datasets/cmunet_dataset.py:39-55):
    shared RandomResizedCrop(256, (0.2,1)) + RandomFlip(0.5), then
    view1 = ShiftPixel(0) 224-crop, view2 = ShiftPixel(<=31) + GaussNoise p.5."""
    ks = jax.random.split(key, 5)
    base = random_resized_crop(ks[0], img, 256, scale=(0.2, 1.0), method="cubic")
    base = random_hflip(ks[1], base)
    v1 = shift_pixel_crop(ks[2], base, out_size, max_pixel=0)
    v2 = shift_pixel_crop(ks[3], base, out_size, max_pixel=shift)
    v2 = gaussian_noise_max10(ks[4], v2, p=0.5)
    return v1, v2


def cmunet_two_views_batch(
    key: jax.Array, batch: jnp.ndarray, out_size: int = 224,
    shift: int = 31, crop_impl: str | None = None,
):
    """Batch-hoisted `vmap_aug(cmunet_two_views, ...)` with a crop_impl
    knob — the moco_fast machinery pointed at the CM-UNet view pipeline
    (round-3 VERDICT item 6; reference pipeline
    cmae/datasets/cmunet_dataset.py:39-55).

    crop_impl None/"scale_translate" is the exact vmapped chain.
    "bank"/"bank_fused" replace the shared RandomResizedCrop's per-sample
    weight construction with the precomputed integer-window weight bank
    applied as two batched matmuls (bank_crop_batch; window-quantization
    deviation only — the contract bank carries everywhere else); the
    hflip is folded in as a column reversal and the remaining stages
    (ShiftPixel crops, GaussNoise) are the same per-sample ops. Key tree
    is identical to the vmapped path (`split(key, B)` then
    `split(k_i, 5)`), so the bank path differs from per-sample
    impl="bank" only in execution order (regression-tested exact)."""
    if crop_impl in (None, "scale_translate", "einsum", "einsum_bf16",
                     "pallas"):
        return vmap_aug(cmunet_two_views, key, batch, out_size, shift)
    b, h, w = batch.shape
    keys = jax.random.split(key, b)
    ks = jax.vmap(lambda k: jax.random.split(k, 5))(keys)  # (B, 5) keys
    box = jax.vmap(lambda k: jnp.stack(_crop_window_box(
        k, h, w, (0.2, 1.0), (3 / 4, 4 / 3))))(ks[:, 0])
    base = bank_crop_batch(
        batch, (box[:, 0], box[:, 1], box[:, 2], box[:, 3]), 256,
        method="cubic", scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3))
    do_flip = jax.vmap(jax.random.uniform)(ks[:, 1]) < 0.5
    base = jnp.where(do_flip[:, None, None], base[:, :, ::-1], base)
    v1 = jax.vmap(lambda k, im: shift_pixel_crop(
        k, im, out_size, 0))(ks[:, 2], base)
    v2 = jax.vmap(lambda k, im: shift_pixel_crop(
        k, im, out_size, shift))(ks[:, 3], base)
    v2 = jax.vmap(lambda k, im: gaussian_noise_max10(
        k, im, p=0.5))(ks[:, 4], v2)
    return v1, v2
