"""Model Genesis distortion gallery, vectorized for TPU.

The reference implements these as per-image Python loops on the host — the
data-side bottleneck of the Genesis silo (10 000-block pixel shuffle +
100 000-point Bezier interpolation per image,
/root/reference/Pretraining/Transformation_based/utils.py:62-167; hot-loop
hazard noted in SURVEY §3.5). Here each distortion is a static-shape jax
program; the whole Genesis batch transform jit-compiles and runs on device.

Distortion chain (Genesis_Chest_CT.py via generate_pair, utils.py:209-253):
flip -> local pixel shuffling -> nonlinear (Bezier) intensity remap ->
in-painting | out-painting.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- flips


def paired_random_flip(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray, prob: float = 0.4):
    """Up to 3 random axis flips applied jointly (utils.py:51-60).

    The reference loops `while random() < prob` up to 3 times choosing a
    random axis each time; we unroll the 3 rounds with independent draws.
    """
    for i in range(3):
        kd, ka, key = jax.random.split(jax.random.fold_in(key, i), 3)
        do = jax.random.uniform(kd) < prob
        axis_is_0 = jax.random.uniform(ka) < 0.5
        fx = jnp.where(axis_is_0, jnp.flip(x, 0), jnp.flip(x, 1))
        fy = jnp.where(axis_is_0, jnp.flip(y, 0), jnp.flip(y, 1))
        x = jnp.where(do, fx, x)
        y = jnp.where(do, fy, y)
    return x, y


# ---------------------------------------------------------------- bezier remap


def _bezier_lut(key: jax.Array, vmin, vmax, n: int = 1024):
    """Sample a cubic Bezier through ([vmin,vmin], P1, P2, [vmax,vmax])
    (utils.py:62-77). Returns sorted xvals and matching yvals."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    span = vmax - vmin
    p1 = jnp.stack([jax.random.uniform(k1) * span + vmin, jax.random.uniform(k2) * span + vmin])
    p2 = jnp.stack([jax.random.uniform(k3) * span + vmin, jax.random.uniform(k4) * span + vmin])
    t = jnp.linspace(0.0, 1.0, n)
    # Cubic Bernstein basis; reference indexes bernstein_poly(i, 3, t) with
    # weights reversed (comb(3,i) * t^(3-i) * (1-t)^i) — order only flips the
    # curve direction, the point set is identical.
    b0 = (1 - t) ** 3
    b1 = 3 * t * (1 - t) ** 2
    b2 = 3 * t**2 * (1 - t)
    b3 = t**3
    xs = b0 * vmin + b1 * p1[0] + b2 * p2[0] + b3 * vmax
    ys = b0 * vmin + b1 * p1[1] + b2 * p2[1] + b3 * vmax
    sort_both = jax.random.uniform(k5) < 0.5
    order = jnp.argsort(xs)
    xs_sorted = xs[order]
    ys_matched = ys[order]
    # With prob 0.5 the reference sorts x AND y independently (monotone remap);
    # otherwise only x is sorted (utils.py:71-75).
    ys_final = jnp.where(sort_both, jnp.sort(ys), ys_matched)
    return xs_sorted, ys_final


_POLY_DEG = 9


def nonlinear_transformation(
    key: jax.Array, x: jnp.ndarray, prob: float = 0.9, exact: bool = False
) -> jnp.ndarray:
    """Bezier-curve intensity remap (utils.py:62-77).

    Fast path (default): the 1024-point curve is least-squares-fit ONCE per
    image with a degree-9 polynomial (10x10 normal-equation solve), then the
    image is remapped by Horner evaluation — pure VPU math, zero gathers.
    Bezier remaps are smooth, so the fit error is <<1% of the intensity span;
    pass exact=True for the per-pixel interp (a 65k-point gather per image,
    ~110 ms/batch on v5e — the fit path is ~30x cheaper).
    """
    kp, kb = jax.random.split(key)
    vmin, vmax = jnp.min(x), jnp.max(x)
    xs, ys = _bezier_lut(kb, vmin, vmax)
    if exact:
        remapped = jnp.interp(x, xs, ys)
        return jnp.where(jax.random.uniform(kp) < prob, remapped, x)

    span = jnp.maximum(vmax - vmin, 1e-8)
    # Least-squares fit in a CHEBYSHEV basis on t = 2u-1 in [-1, 1] — a plain
    # power basis at degree 9 has condition ~1e12 and NaNs out in fp32.
    def cheb_basis(t):
        cols = [jnp.ones_like(t), t]
        for _ in range(_POLY_DEG - 1):
            cols.append(2.0 * t * cols[-1] - cols[-2])
        return cols

    t_fit = 2.0 * (xs - vmin) / span - 1.0
    basis = jnp.stack(cheb_basis(t_fit), axis=1)  # (n, D+1)
    g = basis.T @ basis + 1e-4 * jnp.eye(_POLY_DEG + 1)
    coef = jnp.linalg.solve(g, basis.T @ ys)  # (D+1,)

    tx_img = jnp.clip(2.0 * (x - vmin) / span - 1.0, -1.0, 1.0)
    # Chebyshev recurrence evaluation (pure VPU, no gathers)
    prev2 = jnp.ones_like(tx_img)
    prev1 = tx_img
    acc = coef[0] * prev2 + coef[1] * prev1
    for d in range(2, _POLY_DEG + 1):
        cur = 2.0 * tx_img * prev1 - prev2
        acc = acc + coef[d] * cur
        prev2, prev1 = prev1, cur
    # the exact remap is bounded by the curve's y-range; clamp fit overshoot
    acc = jnp.clip(acc, jnp.min(ys), jnp.max(ys))
    return jnp.where(jax.random.uniform(kp) < prob, acc, x)


# ---------------------------------------------------------------- local shuffle


def local_pixel_shuffling(
    key: jax.Array, x: jnp.ndarray, prob: float = 0.5, exact: bool = False
) -> jnp.ndarray:
    """Local pixel shuffling, TPU formulation.

    Reference (utils.py:79-109): 10 000 random blocks of size <= H/25 whose
    pixels are shuffled in place — a per-image Python loop that saturates the
    image with local scrambling (10 000 blocks x ~25 px >> 65k pixels).

    Default fast path: per-pixel random displacement — every pixel is replaced
    by a uniformly random pixel from its (2r+1)^2 neighborhood (r ~ H/50,
    matching the reference's block radius). One fused gather; destroys local
    structure while preserving global anatomy, which is the pretext-task
    purpose. Not bijective (some pixels repeat/drop) — pass `exact=True` for
    the bijective multi-round tile-permutation variant (argsort shuffle,
    ~40x slower on TPU due to small-segment sorts).
    """
    kp = jax.random.fold_in(key, 99)
    h, w = x.shape
    if not exact:
        # Gather-free local scramble: K randomly-offset rolled copies of the
        # image, per-pixel random selection among them. Every pixel is
        # replaced by a pixel at one of K random offsets within the reference
        # block radius (~H/50) — destroys local texture like the block
        # shuffle, at the cost of K cheap shifted copies + one select chain
        # instead of a 65k-point gather (~110 ms/batch on v5e).
        K = 8
        r = max(h // 50, 2)
        koff, ksel = jax.random.split(jax.random.fold_in(key, 1))
        offs = jax.random.randint(koff, (K, 2), -r, r + 1)
        sel = jax.random.randint(ksel, (h, w), 0, K)
        out = jnp.zeros_like(x)
        for k in range(K):
            rolled = jnp.roll(x, (offs[k, 0], offs[k, 1]), axis=(0, 1))
            out = jnp.where(sel == k, rolled, out)
        return jnp.where(jax.random.uniform(kp) < prob, out, x)

    out = x
    tile_sizes = (4, 8, 5, 10, 2)  # static; pad to a multiple, shuffle, crop.
    for r_i, t in enumerate(tile_sizes):
        kr = jax.random.fold_in(key, r_i)
        ko, ks = jax.random.split(kr)
        # random roll so tile boundaries differ per round
        sh = jax.random.randint(ko, (2,), 0, t)
        rolled = jnp.roll(out, (sh[0], sh[1]), axis=(0, 1))
        ph = (t - h % t) % t
        pw = (t - w % t) % t
        padded = jnp.pad(rolled, ((0, ph), (0, pw)))
        hh, ww = padded.shape
        tiles = padded.reshape(hh // t, t, ww // t, t).transpose(0, 2, 1, 3)
        tiles = tiles.reshape(hh // t, ww // t, t * t)
        perm_keys = jax.random.uniform(ks, tiles.shape)
        order = jnp.argsort(perm_keys, axis=-1)
        shuffled = jnp.take_along_axis(tiles, order, axis=-1)
        back = shuffled.reshape(hh // t, ww // t, t, t).transpose(0, 2, 1, 3)
        back = back.reshape(hh, ww)[:h, :w]
        out = jnp.roll(back, (-sh[0], -sh[1]), axis=(0, 1))
    return jnp.where(jax.random.uniform(kp) < prob, out, x)


# ---------------------------------------------------------------- painting


def _block_mask(key: jax.Array, h: int, w: int, smin_num: int, smin_den: int,
                smax_num: int, smax_den: int, margin: int = 3) -> jnp.ndarray:
    """Random rectangle mask with side in [h*smin_num//smin_den, h*smax_num//smax_den)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sx = jax.random.randint(k1, (), h * smin_num // smin_den, h * smax_num // smax_den + 1)
    sy = jax.random.randint(k2, (), w * smin_num // smin_den, w * smax_num // smax_den + 1)
    x0 = jax.random.randint(k3, (), margin, jnp.maximum(h - sx - margin, margin + 1))
    y0 = jax.random.randint(k4, (), margin, jnp.maximum(w - sy - margin, margin + 1))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    return ((rows >= x0) & (rows < x0 + sx) & (cols >= y0) & (cols < y0 + sy))


def image_in_painting(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Up to 5 uniform-noise blocks of side in [H/6, H/3] (utils.py:111-130).

    Block i is painted iff the first i+1 continue-draws all hit (<0.95),
    matching the reference's while-loop geometry.
    """
    h, w = x.shape
    out = x
    cont = jnp.bool_(True)
    for i in range(5):
        ki = jax.random.fold_in(key, i)
        kc, kb, kn = jax.random.split(ki, 3)
        cont = cont & (jax.random.uniform(kc) < 0.95)
        m = _block_mask(kb, h, w, 1, 6, 1, 3)
        noise = jax.random.uniform(kn, (h, w))
        out = jnp.where(m & cont, noise, out)
    return out


def image_out_painting(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Replace everything with noise except 1-5 kept blocks (utils.py:132-167).

    Kept-block side = H - randint(2H/7, 4H/7) for the first, H - randint(3H/7,
    4H/7) for the rest; blocks keep original content.
    """
    h, w = x.shape
    keep = jnp.zeros((h, w), dtype=bool)
    cont = jnp.bool_(True)
    for i in range(5):
        ki = jax.random.fold_in(key, i)
        kc, kb = jax.random.split(ki)
        if i == 0:
            active = jnp.bool_(True)
            lo_n, lo_d = 2, 7
        else:
            cont = cont & (jax.random.uniform(kc) < 0.95)
            active = cont
            lo_n, lo_d = 3, 7
        # side = H - randint(lo, 4H/7) -> in [H - 4H/7, H - lo]
        k1, k2, k3, k4 = jax.random.split(kb, 4)
        sx = h - jax.random.randint(k1, (), lo_n * h // lo_d, 4 * h // 7 + 1)
        sy = w - jax.random.randint(k2, (), lo_n * w // lo_d, 4 * w // 7 + 1)
        x0 = jax.random.randint(k3, (), 3, jnp.maximum(h - sx - 3, 4))
        y0 = jax.random.randint(k4, (), 3, jnp.maximum(w - sy - 3, 4))
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        m = (rows >= x0) & (rows < x0 + sx) & (cols >= y0) & (cols < y0 + sy)
        keep = keep | (m & active)
    noise = jax.random.uniform(jax.random.fold_in(key, 77), (h, w))
    return jnp.where(keep, x, noise)


# ---------------------------------------------------------------- full chain


def genesis_distort(
    key: jax.Array,
    img: jnp.ndarray,
    *,
    flip_rate: float = 0.4,
    local_rate: float = 0.5,
    nonlinear_rate: float = 0.9,
    paint_rate: float = 0.9,
    inpaint_rate: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One (distorted, target) Genesis pair (generate_pair, utils.py:209-253).

    Default rates from Transformation_based/config.py:24-31. Returns (x, y)
    where y is the (possibly flipped) original and x the distorted input.
    """
    kf, kl, kn, kp1, kp2, kin, kout = jax.random.split(key, 7)
    x, y = paired_random_flip(kf, img, img, prob=flip_rate)
    x = local_pixel_shuffling(kl, x, prob=local_rate)
    x = nonlinear_transformation(kn, x, prob=nonlinear_rate)
    do_paint = jax.random.uniform(kp1) < paint_rate
    do_inpaint = jax.random.uniform(kp2) < inpaint_rate
    painted = jnp.where(
        do_inpaint, image_in_painting(kin, x), image_out_painting(kout, x)
    )
    x = jnp.where(do_paint, painted, x)
    return x, y


def genesis_batch(key: jax.Array, imgs: jnp.ndarray, **rates):
    """vmapped genesis_distort over a batch with per-sample keys."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, im: genesis_distort(k, im, **rates))(keys, imgs)
