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
