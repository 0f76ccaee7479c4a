"""AutoAugment / RandAugment op set + composed policies as device ops.

Counterpart of the reference's mmcls-style autoaugment library
(/root/reference/Pretraining/CM-UNet/cmae/datasets/pipelines/auto_augment.py:375-1211
— Shear/Translate/Rotate/AutoContrast/Invert/Equalize/Solarize/SolarizeAdd/
Posterize/Contrast/ColorTransform/Brightness/Sharpness/Cutout, plus the
AutoAugment "imagenet" policy collection at 41-88 and RandAugment at 91-260).
None of these are reachable from the reference's entry configs (the CM-UNet
pipeline uses only RandomResizedCrop/RandomFlip/ShiftPixel/GaussNoise) — they
are part of the transforms-library surface, rebuilt here as jittable
per-sample jax ops.

Conventions (deviations from the uint8 PIL originals, flagged in PARITY.md):
  * images are single-channel float (H, W) in [0, 1]; the uint8 0..255
    magnitudes map to /255 fractions. For z-scored inputs, rescale first.
  * pad value for geometric ops is 0.0 (the mmcls default 128 is uint8
    mid-gray; for z-scored/[0,1] grayscale, 0 is the natural fill).
  * geometric ops use nearest resampling via a SINGLE gather (bicubic would
    need 16; on this TPU every extra whole-image gather costs ~0.9 ms/img).
  * ColorTransform (saturation blend) is the identity on single-channel
    images (PIL Color blends with the grayscale version of the image, which
    IS the image here) — kept for policy compatibility.

These ops are library surface, not the pretrain hot path; the entry-path
pipelines live in cmx.ops.augment.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# --------------------------------------------------------------- helpers


def _affine_nearest(img: jnp.ndarray, mat: jnp.ndarray, pad: float = 0.0) -> jnp.ndarray:
    """Inverse-warp by a 2x3 affine matrix (output->input coords), nearest.

    One gather per image — the cheapest exact formulation for arbitrary
    affines on this backend (see CLAUDE.md gather note).
    """
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    src_y = mat[0, 0] * yy + mat[0, 1] * xx + mat[0, 2]
    src_x = mat[1, 0] * yy + mat[1, 1] * xx + mat[1, 2]
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    out = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
    return jnp.where(inside, out, pad)


def _maybe(key: jax.Array, prob: float, fn: Callable, img: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jax.random.uniform(key) < prob, fn(img), img)


def _rand_sign(key: jax.Array, mag: float) -> jnp.ndarray:
    """random_negative_prob=0.5 semantics (auto_augment.py:339-344)."""
    return jnp.where(jax.random.uniform(key) < 0.5, -mag, mag)


# --------------------------------------------------------------- geometric


def shear(key: jax.Array, img: jnp.ndarray, magnitude: float,
          direction: str = "horizontal", prob: float = 0.5,
          pad: float = 0.0) -> jnp.ndarray:
    """mmcv.imshear analog (auto_augment.py:375-440): magnitude = shear
    fraction; random sign."""
    kp, ks = jax.random.split(key)
    m = _rand_sign(ks, magnitude)
    if direction == "horizontal":
        mat = jnp.array([[1.0, 0.0, 0.0], [m, 1.0, 0.0]])
    else:
        mat = jnp.array([[1.0, m, 0.0], [0.0, 1.0, 0.0]])
    return _maybe(kp, prob, lambda x: _affine_nearest(x, mat, pad), img)


def translate(key: jax.Array, img: jnp.ndarray, magnitude: float,
              direction: str = "horizontal", prob: float = 0.5,
              pad: float = 0.0) -> jnp.ndarray:
    """auto_augment.py:453-536: offset = magnitude * size, random sign."""
    kp, ks = jax.random.split(key)
    h, w = img.shape
    m = _rand_sign(ks, magnitude)
    if direction == "horizontal":
        mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, -m * w]])
    else:
        mat = jnp.array([[1.0, 0.0, -m * h], [0.0, 1.0, 0.0]])
    return _maybe(kp, prob, lambda x: _affine_nearest(x, mat, pad), img)


def rotate(key: jax.Array, img: jnp.ndarray, angle: float, prob: float = 0.5,
           pad: float = 0.0) -> jnp.ndarray:
    """auto_augment.py:539-619: rotate about center by +-angle degrees."""
    kp, ks = jax.random.split(key)
    a = jnp.deg2rad(_rand_sign(ks, angle))
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    c, s = jnp.cos(a), jnp.sin(a)
    # output (y,x) -> input coords, rotating about the center
    mat = jnp.array([
        [c, -s, cy - c * cy + s * cx],
        [s, c, cx - s * cy - c * cx],
    ])
    return _maybe(kp, prob, lambda x: _affine_nearest(x, mat, pad), img)


def cutout(key: jax.Array, img: jnp.ndarray, size: float,
           prob: float = 0.5, pad: float = 0.0) -> jnp.ndarray:
    """auto_augment.py:1081-1133: square hole of `size` (fraction of H) at a
    random center. Gather-free: iota-mask select."""
    kp, ky, kx = jax.random.split(key, 3)
    h, w = img.shape
    half = size * h / 2.0
    cy = jax.random.uniform(ky) * h
    cx = jax.random.uniform(kx) * w
    yy, xx = jnp.mgrid[0:h, 0:w]
    hole = (jnp.abs(yy - cy) < half) & (jnp.abs(xx - cx) < half)
    return _maybe(kp, prob, lambda x: jnp.where(hole, pad, x), img)


# --------------------------------------------------------------- intensity


def auto_contrast(key: jax.Array, img: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """mmcv.auto_contrast analog (auto_augment.py:622-650): stretch min..max
    to the full [0, 1] range."""
    def f(x):
        lo, hi = jnp.min(x), jnp.max(x)
        return (x - lo) / jnp.maximum(hi - lo, 1e-8)
    return _maybe(key, prob, f, img)


def invert(key: jax.Array, img: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """mmcv.iminvert analog (auto_augment.py:653-679): 1 - x on [0,1]."""
    return _maybe(key, prob, lambda x: 1.0 - x, img)


def equalize(key: jax.Array, img: jnp.ndarray, prob: float = 0.5,
             n_bins: int = 256) -> jnp.ndarray:
    """mmcv.imequalize analog (auto_augment.py:682-710): histogram
    equalization over `n_bins` levels of [0, 1].

    Scatter-add histogram + a 256-entry LUT gather — tiny compared to
    whole-image gathers; library op, not hot path.
    """
    def f(x):
        bins = jnp.clip((x * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1)
        hist = jnp.zeros((n_bins,), jnp.float32).at[bins.ravel()].add(1.0)
        # PIL-style: step = (total - last_nonzero_count) / (n_bins - 1)
        cdf = jnp.cumsum(hist)
        nonzero = hist > 0
        last_idx = jnp.max(jnp.where(nonzero, jnp.arange(n_bins), 0))
        step = (cdf[-1] - hist[last_idx]) / (n_bins - 1)
        lut = jnp.where(
            step > 0,
            jnp.clip(((jnp.concatenate([jnp.zeros((1,)), cdf[:-1]]) +
                       step / 2) / jnp.maximum(step, 1e-8)), 0, n_bins - 1),
            jnp.arange(n_bins, dtype=jnp.float32),
        )
        return lut[bins] / (n_bins - 1)
    return _maybe(key, prob, f, img)


def solarize(key: jax.Array, img: jnp.ndarray, thr: float,
             prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:712-756: invert pixels above thr."""
    return _maybe(key, prob, lambda x: jnp.where(x >= thr, 1.0 - x, x), img)


def solarize_add(key: jax.Array, img: jnp.ndarray, add: float,
                 thr: float = 128.0 / 255.0, prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:758-811: add `add` to pixels below thr, clip."""
    return _maybe(
        key, prob,
        lambda x: jnp.where(x < thr, jnp.clip(x + add, 0.0, 1.0), x), img,
    )


def posterize(key: jax.Array, img: jnp.ndarray, bits: float,
              prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:813-864: keep `bits` of 8 intensity bits."""
    def f(x):
        levels = jnp.maximum(2.0 ** jnp.floor(bits), 2.0)
        q = 256.0 / levels
        return jnp.floor(x * 255.0 / q) * q / 255.0
    return _maybe(key, prob, f, img)


def _enhance(img: jnp.ndarray, degenerate: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance blend: degenerate + factor * (img - degenerate)."""
    return degenerate + factor * (img - degenerate)


def contrast(key: jax.Array, img: jnp.ndarray, magnitude: float,
             prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:866-917: blend with the mean-gray image; factor
    1 +- magnitude (random sign)."""
    kp, ks = jax.random.split(key)
    factor = 1.0 + _rand_sign(ks, magnitude)
    return _maybe(kp, prob,
                  lambda x: _enhance(x, jnp.mean(x) * jnp.ones_like(x), factor),
                  img)


def brightness(key: jax.Array, img: jnp.ndarray, magnitude: float,
               prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:973-1025: blend with black; factor 1 +- magnitude."""
    kp, ks = jax.random.split(key)
    factor = 1.0 + _rand_sign(ks, magnitude)
    return _maybe(kp, prob, lambda x: _enhance(x, jnp.zeros_like(x), factor), img)


def color_transform(key: jax.Array, img: jnp.ndarray, magnitude: float,
                    prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:919-971: saturation blend — identity for grayscale
    (PIL Color blends with the image's own grayscale conversion)."""
    del magnitude
    return _maybe(key, prob, lambda x: x, img)


_SMOOTH3 = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0


def sharpness(key: jax.Array, img: jnp.ndarray, magnitude: float,
              prob: float = 0.5) -> jnp.ndarray:
    """auto_augment.py:1027-1079: blend with PIL-SMOOTH-filtered image;
    factor 1 +- magnitude."""
    kp, ks = jax.random.split(key)
    factor = 1.0 + _rand_sign(ks, magnitude)

    def f(x):
        xp = jnp.pad(x, 1, mode="edge")[None, :, :, None]
        sm = jax.lax.conv_general_dilated(
            xp, _SMOOTH3.reshape(3, 3, 1, 1), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]
        # PIL keeps the 1-pixel border unfiltered
        yy, xx = jnp.mgrid[0 : x.shape[0], 0 : x.shape[1]]
        border = (yy == 0) | (yy == x.shape[0] - 1) | (xx == 0) | (xx == x.shape[1] - 1)
        sm = jnp.where(border, x, sm)
        return _enhance(x, sm, factor)

    return _maybe(kp, prob, f, img)


# --------------------------------------------------------------- policies

# DeepVoltaire/AutoAugment ImageNetPolicy — the reference's
# AUTOAUG_POLICIES['imagenet'] (auto_augment.py:1211+). Each sub-policy is
# two (op, prob, level) steps; level 0-9 maps to op magnitude below.
IMAGENET_POLICY: List[List[Tuple[str, float, int]]] = [
    [("posterize", 0.4, 8), ("rotate", 0.6, 9)],
    [("solarize", 0.6, 5), ("auto_contrast", 0.6, 5)],
    [("equalize", 0.8, 8), ("equalize", 0.6, 3)],
    [("posterize", 0.6, 7), ("posterize", 0.6, 6)],
    [("equalize", 0.4, 7), ("solarize", 0.2, 4)],
    [("equalize", 0.4, 4), ("rotate", 0.8, 8)],
    [("solarize", 0.6, 3), ("equalize", 0.6, 7)],
    [("posterize", 0.8, 5), ("equalize", 1.0, 2)],
    [("rotate", 0.2, 3), ("solarize", 0.6, 8)],
    [("equalize", 0.6, 8), ("posterize", 0.4, 6)],
    [("rotate", 0.8, 8), ("color", 0.4, 0)],
    [("rotate", 0.4, 9), ("equalize", 0.6, 2)],
    [("equalize", 0.0, 7), ("equalize", 0.8, 8)],
    [("invert", 0.6, 4), ("equalize", 1.0, 8)],
    [("color", 0.6, 4), ("contrast", 1.0, 8)],
    [("rotate", 0.8, 8), ("color", 1.0, 2)],
    [("color", 0.8, 8), ("solarize", 0.8, 7)],
    [("sharpness", 0.4, 7), ("invert", 0.6, 8)],
    [("shear_x", 0.6, 5), ("equalize", 1.0, 9)],
    [("color", 0.4, 0), ("equalize", 0.6, 3)],
    [("equalize", 0.4, 7), ("solarize", 0.2, 4)],
    [("solarize", 0.6, 5), ("auto_contrast", 0.6, 5)],
    [("invert", 0.6, 4), ("equalize", 1.0, 8)],
    [("color", 0.6, 4), ("contrast", 1.0, 8)],
    [("equalize", 0.8, 8), ("equalize", 0.6, 3)],
]


def _apply_op(name: str, prob: float, level: int,
              key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """Standard AutoAugment level->magnitude mapping (level 0..9)."""
    m = level / 9.0
    if name == "shear_x":
        return shear(key, img, 0.3 * m, "horizontal", prob)
    if name == "shear_y":
        return shear(key, img, 0.3 * m, "vertical", prob)
    if name == "translate_x":
        return translate(key, img, 0.45 * m, "horizontal", prob)
    if name == "translate_y":
        return translate(key, img, 0.45 * m, "vertical", prob)
    if name == "rotate":
        return rotate(key, img, 30.0 * m, prob)
    if name == "auto_contrast":
        return auto_contrast(key, img, prob)
    if name == "invert":
        return invert(key, img, prob)
    if name == "equalize":
        return equalize(key, img, prob)
    if name == "solarize":
        return solarize(key, img, 1.0 - m, prob)
    if name == "solarize_add":
        return solarize_add(key, img, (110.0 / 255.0) * m, prob=prob)
    if name == "posterize":
        return posterize(key, img, 8.0 - 4.0 * m, prob)
    if name == "contrast":
        return contrast(key, img, 0.9 * m, prob)
    if name == "color":
        return color_transform(key, img, 0.9 * m, prob)
    if name == "brightness":
        return brightness(key, img, 0.9 * m, prob)
    if name == "sharpness":
        return sharpness(key, img, 0.9 * m, prob)
    if name == "cutout":
        return cutout(key, img, 0.4 * m, prob)
    raise ValueError(f"unknown autoaugment op {name!r}")


def auto_augment(key: jax.Array, img: jnp.ndarray,
                 policies: Sequence[Sequence[Tuple[str, float, int]]] = None
                 ) -> jnp.ndarray:
    """AutoAugment (auto_augment.py:41-88): pick one random sub-policy and
    apply its ops in order. jittable: the choice is a lax.switch."""
    policies = IMAGENET_POLICY if policies is None else policies
    kc, ka = jax.random.split(key)

    def make_branch(sub):
        def branch(x):
            k = ka
            for i, (name, prob, level) in enumerate(sub):
                k = jax.random.fold_in(ka, i)
                x = _apply_op(name, prob, level, k, x)
            return x
        return branch

    choice = jax.random.randint(kc, (), 0, len(policies))
    return jax.lax.switch(choice, [make_branch(s) for s in policies], img)


# timm _RAND_INCREASING_TRANSFORMS op names usable on grayscale
RAND_AUGMENT_OPS = (
    "auto_contrast", "equalize", "invert", "rotate", "posterize",
    "solarize", "solarize_add", "color", "contrast", "brightness",
    "sharpness", "shear_x", "shear_y", "translate_x", "translate_y",
)


def rand_augment(key: jax.Array, img: jnp.ndarray, num_policies: int = 2,
                 magnitude_level: int = 9, total_level: int = 10) -> jnp.ndarray:
    """RandAugment (auto_augment.py:91-260): apply `num_policies` random ops
    at a fixed magnitude level."""
    level = int(round(magnitude_level / total_level * 9))
    for i in range(num_policies):
        kc, ka = jax.random.split(jax.random.fold_in(key, i))
        branches = [
            (lambda name: lambda x: _apply_op(name, 1.0, level, ka, x))(n)
            for n in RAND_AUGMENT_OPS
        ]
        choice = jax.random.randint(kc, (), 0, len(RAND_AUGMENT_OPS))
        img = jax.lax.switch(choice, branches, img)
    return img
