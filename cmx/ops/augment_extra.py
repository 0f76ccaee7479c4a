"""Extended augmentation ops (the rest of the reference transform library).

Device counterparts of CM-UNet's pipelines
(cmae/datasets/pipelines/processing.py + auto_augment.py — RandomErasing
616-776, ResizeEdge 778-876, ColorJitter 878-1033, Solarize/Posterize/
Shear/Translate in auto_augment.py 375-1135) and the MultiView wrapper
(wrappers.py:14-97). Grayscale single-channel formulations; all pure
(key, img) -> img jax functions like cmx.ops.augment.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.0,  # no-op on grayscale, kept for API parity
    p: float = 1.0,
) -> jnp.ndarray:
    """Brightness/contrast jitter (grayscale reduction of ColorJitter)."""
    kp, kb, kc, ko = jax.random.split(key, 4)
    b = jax.random.uniform(kb, minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, minval=1 - contrast, maxval=1 + contrast)
    out = img * b
    mean = jnp.mean(out)
    out = (out - mean) * c + mean
    return jnp.where(jax.random.uniform(kp) < p, out, img)


def random_erasing(
    key: jax.Array,
    img: jnp.ndarray,
    area_range: Tuple[float, float] = (0.02, 0.33),
    aspect_range: Tuple[float, float] = (0.3, 3.33),
    p: float = 0.5,
    fill: float = 0.0,
) -> jnp.ndarray:
    """RandomErasing (processing.py:616-776): erase a random rectangle."""
    h, w = img.shape
    kp, ka, kr, ky, kx, kf = jax.random.split(key, 6)
    area = h * w * jax.random.uniform(ka, minval=area_range[0], maxval=area_range[1])
    log_r = jax.random.uniform(
        kr, minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1])
    )
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1, h)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1, w)
    y0 = jax.random.uniform(ky) * (h - eh)
    x0 = jax.random.uniform(kx) * (w - ew)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
    erased = jnp.where(inside, fill, img)
    return jnp.where(jax.random.uniform(kp) < p, erased, img)


def solarize(key: jax.Array, img: jnp.ndarray, thr: float = 0.5, p: float = 0.5) -> jnp.ndarray:
    """Invert values above a threshold (auto_augment Solarize), on the
    image's own range."""
    lo, hi = jnp.min(img), jnp.max(img)
    t = lo + thr * (hi - lo)
    out = jnp.where(img >= t, hi + lo - img, img)
    return jnp.where(jax.random.uniform(key) < p, out, img)


def posterize(key: jax.Array, img: jnp.ndarray, bits: int = 4, p: float = 0.5) -> jnp.ndarray:
    """Quantize to 2^bits levels over the image's range (auto_augment
    Posterize)."""
    lo, hi = jnp.min(img), jnp.max(img)
    span = jnp.maximum(hi - lo, 1e-8)
    levels = float(2**bits - 1)
    q = jnp.round((img - lo) / span * levels) / levels * span + lo
    return jnp.where(jax.random.uniform(key) < p, q, img)


def invert(key: jax.Array, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    lo, hi = jnp.min(img), jnp.max(img)
    return jnp.where(jax.random.uniform(key) < p, hi + lo - img, img)


def resize_edge(img: jnp.ndarray, edge: int, mode: str = "short") -> jnp.ndarray:
    """ResizeEdge (processing.py:778-876): scale so the short (or long) edge
    equals `edge`. NOTE: output shape depends on input shape (static under
    jit per input shape)."""
    h, w = img.shape
    if mode == "short":
        scale = edge / min(h, w)
    else:
        scale = edge / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return jax.image.resize(img, (nh, nw), method="bilinear")


def translate(
    key: jax.Array, img: jnp.ndarray, max_frac: float = 0.2, p: float = 0.5
) -> jnp.ndarray:
    """Random integer translation with zero fill (auto_augment Translate) —
    implemented as pad+dynamic-slice, no gather."""
    h, w = img.shape
    kp, ky, kx = jax.random.split(key, 3)
    my, mx = int(h * max_frac), int(w * max_frac)
    dy = jax.random.randint(ky, (), -my, my + 1)
    dx = jax.random.randint(kx, (), -mx, mx + 1)
    padded = jnp.pad(img, ((my, my), (mx, mx)))
    out = jax.lax.dynamic_slice(padded, (my - dy, mx - dx), (h, w))
    return jnp.where(jax.random.uniform(kp) < p, out, img)


def dual_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    size: int,
    second_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BEiT-style RandomResizedCropAndInterpolationWithTwoPic
    (/root/reference/.../pipelines/processing.py:130-254): sample ONE crop
    window, resize it to two different sizes (the BEiT student/tokenizer dual
    view). Interpolation: linear for both (the reference defaults to
    bilinear + lanczos; lanczos is unavailable in jax.image — deviation
    noted in PARITY.md)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    y0 = jax.random.uniform(k3) * (h - ch)
    x0 = jax.random.uniform(k4) * (w - cw)
    img3 = img[..., None] if img.ndim == 2 else img

    def crop_to(out_size):
        sy, sx = out_size / ch, out_size / cw
        out = jax.image.scale_and_translate(
            img3.astype(jnp.float32),
            (out_size, out_size, img3.shape[-1]),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-y0 * sy, -x0 * sx]),
            method="linear",
            antialias=True,
        )
        return out[..., 0] if img.ndim == 2 else out

    return crop_to(size), crop_to(second_size)


def random_crop_padded(
    key: jax.Array,
    img: jnp.ndarray,
    crop_size: int,
    padding: int = 0,
    pad_if_needed: bool = True,
    pad_val: float = 0.0,
) -> jnp.ndarray:
    """mmcls-style RandomCrop (/root/reference/.../pipelines/
    processing.py:257-397): optional fixed padding, pad-to-fit if the image
    is smaller than the crop, then a uniformly random crop window
    (constant-fill padding mode only — the entry configs never use the
    reflect/edge modes; deviation noted in PARITY.md)."""
    if padding:
        img = jnp.pad(img, padding, mode="constant", constant_values=pad_val)
    h, w = img.shape[0], img.shape[1]
    if pad_if_needed and (h < crop_size or w < crop_size):
        ph = max(crop_size - h, 0)
        pw = max(crop_size - w, 0)
        img = jnp.pad(img, ((ph, ph), (pw, pw)), mode="constant",
                      constant_values=pad_val)
        h, w = img.shape[0], img.shape[1]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, max(h - crop_size, 0) + 1)
    x0 = jax.random.randint(kx, (), 0, max(w - crop_size, 0) + 1)
    return jax.lax.dynamic_slice(img, (y0, x0), (crop_size, crop_size))


def multi_view(
    key: jax.Array,
    img: jnp.ndarray,
    pipelines: Sequence[Callable],
    num_views: Sequence[int],
):
    """MultiView wrapper (wrappers.py:14-97): apply pipeline[i] num_views[i]
    times with independent keys; returns the list of views."""
    views = []
    i = 0
    for fn, n in zip(pipelines, num_views):
        for _ in range(n):
            views.append(fn(jax.random.fold_in(key, i), img))
            i += 1
    return views
