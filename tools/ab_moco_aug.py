"""MoCo view-augmentation breakdown + rotation-formulation A/B (round-2 tail).

The round-5 MoCo profile (runs/r4/moco_profile.log) showed the step is
augmentation-bound: fwd+bwd alone 131.8 ms/batch (971 img/s) but the full
step 369.7 ms (346 img/s), with the two 224² view pipelines alone costing
306 ms. This tool finds WHICH op dominates and A/Bs TPU-friendlier
formulations of the suspect (random_rotation's full-image nearest gather;
gathers measured ~110 ms flat per 128x256² batch on this chip — see
cmx/ops/augment.py:113 and RESULTS.md round-2 "Sparsity lever").

Subcommands:
  breakdown — time each op of moco_view_aug (vmapped, b128) in isolation
              plus the full chain and the chain minus rotation.
  rot       — A/B three rotation formulations at b128:
                direct  : img[iy, ix] pointwise gather (current)
                flat    : jnp.take on the flattened image (one 1-D gather)
                shear3  : rot90(k) + three nearest shears, each a vmapped
                          dynamic_slice of contiguous rows/cols
              prints ms + % pixel mismatch vs direct (same keys).
  crop      — A/B random_resized_crop variants at b128: cubic+antialias
              (what moco_view_aug shipped with), linear+antialias
              (torchvision RandomResizedCrop's DEFAULT interpolation —
              the reference-faithful choice for MoCo,
              pl_bolts/.../moco_data_module.py:123 passes no
              interpolation), both without antialias, and a bf16-compute
              cubic. Prints ms + mean|diff| vs linear+antialias.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/ab_moco_aug.py breakdown
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SIZE = 256
VIEW = 224


def _sync(x):
    # Sync by transferring ONE scalar, reduced on device. A full
    # jax.device_get(x) here transfers the whole output through the axon
    # tunnel (measured ~1 MB/s cold: 50 s for a 25.7 MB view batch!) and
    # systematically inflated every ms/batch this tool printed before
    # round 3 — orderings within a run were unaffected (same constant),
    # but absolutes were transfer-dominated. See RESULTS round 3
    # "measurement artifact" note.
    float(jnp.ravel(x)[0])


def _time(fn, *args, n=12, warmup=4, repeats=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((BATCH, SIZE, SIZE), dtype=np.float32))


def breakdown():
    from cmx.ops import augment as A

    imgs = _batch()
    keys = jax.random.split(jax.random.key(0), BATCH)

    def timed(name, per_image):
        f = jax.jit(jax.vmap(per_image))
        ms = _time(f, keys, imgs) * 1e3
        print(json.dumps({"op": name, "ms_per_batch": round(ms, 2)}))

    timed("rotation_p1", lambda k, im: A.random_rotation(k, im, 180.0, p=1.0))
    timed("rotation_p.5", lambda k, im: A.random_rotation(k, im, 180.0, p=0.5))
    timed("rrc_cubic", lambda k, im: A.random_resized_crop(
        k, im, VIEW, scale=(0.2, 1.0), method="cubic"))
    timed("blur_p.5", lambda k, im: A.gaussian_blur(
        k, im[:VIEW, :VIEW], sigma_range=(0.1, 2.0), radius=3, p=0.5))
    timed("flips+noise", lambda k, im: A.gaussian_noise_max10(
        k, A.random_vflip(k, A.random_hflip(k, im[:VIEW, :VIEW])), p=0.5))
    timed("full_view", lambda k, im: A.moco_view_aug(k, im, VIEW))

    def no_rot(k, im):
        ks = jax.random.split(k, 6)
        im = A.random_resized_crop(ks[1], im, VIEW, scale=(0.2, 1.0),
                                   method="cubic")
        im = A.gaussian_blur(ks[2], im, sigma_range=(0.1, 2.0), radius=3, p=0.5)
        im = A.random_hflip(ks[3], im)
        im = A.random_vflip(ks[4], im)
        return A.gaussian_noise_max10(ks[5], im, p=0.5)

    timed("view_minus_rotation", no_rot)


# ---------------------------------------------------------------------------
# rotation formulations


def rot_direct(key, img, max_degrees=180.0):
    from cmx.ops.augment import random_rotation

    return random_rotation(key, img, max_degrees, p=1.0)


def rot_flat(key, img, max_degrees=180.0):
    """Same math as random_rotation(nearest) but one flat 1-D take."""
    ka = jax.random.split(key, 2)[1]
    angle = jnp.deg2rad(jax.random.uniform(ka, minval=-max_degrees,
                                           maxval=max_degrees))
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    c, s = jnp.cos(angle), jnp.sin(angle)
    src_y = c * (yy - cy) - s * (xx - cx) + cy
    src_x = s * (yy - cy) + c * (xx - cx) + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    out = jnp.take(img.reshape(-1), idx.reshape(-1)).reshape(h, w)
    return jnp.where(inside, out, 0.0).astype(jnp.float32)


def rot_shear3(key, img, max_degrees=180.0):
    """The library formulation (cmx.ops.augment._rotate_shear3) via its
    public switch — the A/B measures the exact production code path."""
    from cmx.ops.augment import random_rotation

    return random_rotation(key, img, max_degrees, p=1.0, method="shear3")


def rot_ab():
    # Smooth field, not noise: on noise every 1-pixel rounding difference
    # flips the pixel, which would make the (expected, documented) shear3
    # rounding deviation unreadable. Timing is data-independent.
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    one = np.sin(yy / 25.0) + np.cos(xx / 19.0)
    imgs = jnp.asarray(np.broadcast_to(one, (BATCH, SIZE, SIZE)).copy(),
                       dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), BATCH)
    fns = {"direct": rot_direct, "flat": rot_flat, "shear3": rot_shear3}
    ref = jax.jit(jax.vmap(partial(rot_direct)))(keys, imgs)
    for name, fn in fns.items():
        f = jax.jit(jax.vmap(partial(fn)))
        ms = _time(f, keys, imgs) * 1e3
        out = f(keys, imgs)
        mismatch = float(jnp.mean(jnp.abs(out - ref) > 1e-6))
        print(json.dumps({"rot": name, "ms_per_batch": round(ms, 2),
                          "pixel_mismatch_vs_direct": round(mismatch, 4)}))


# ---------------------------------------------------------------------------
# crop/resize formulations


def _rrc_variant(key, img, method, antialias, dtype=jnp.float32):
    """random_resized_crop's exact window math with a configurable
    resample (cmx/ops/augment.py:32-78 keeps method but hard-codes
    antialias=True, fp32); identical keys -> identical crop windows, so
    variants differ only in the resample itself."""
    h, w = img.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, minval=0.2, maxval=1.0)
    log_r = jax.random.uniform(k2, minval=jnp.log(3 / 4), maxval=jnp.log(4 / 3))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    y0 = jax.random.uniform(k3) * (h - ch)
    x0 = jax.random.uniform(k4) * (w - cw)
    sy = VIEW / ch
    sx = VIEW / cw
    out = jax.image.scale_and_translate(
        img[..., None].astype(dtype), (VIEW, VIEW, 1), (0, 1),
        jnp.stack([sy, sx]).astype(dtype),
        jnp.stack([-y0 * sy, -x0 * sx]).astype(dtype),
        method=method, antialias=antialias)
    return out[..., 0].astype(jnp.float32)


def crop_ab():
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    one = np.sin(yy / 25.0) + np.cos(xx / 19.0)
    imgs = jnp.asarray(np.broadcast_to(one, (BATCH, SIZE, SIZE)).copy(),
                       dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), BATCH)
    variants = {
        "cubic_aa": ("cubic", True, jnp.float32),
        "linear_aa": ("linear", True, jnp.float32),
        "cubic_noaa": ("cubic", False, jnp.float32),
        "linear_noaa": ("linear", False, jnp.float32),
        "cubic_aa_bf16": ("cubic", True, jnp.bfloat16),
    }
    ref = jax.jit(jax.vmap(partial(_rrc_variant, method="linear",
                                   antialias=True)))(keys, imgs)
    for name, (method, aa, dt) in variants.items():
        f = jax.jit(jax.vmap(partial(_rrc_variant, method=method,
                                     antialias=aa, dtype=dt)))
        ms = _time(f, keys, imgs) * 1e3
        out = f(keys, imgs)
        diff = float(jnp.mean(jnp.abs(out - ref)))
        print(json.dumps({"crop": name, "ms_per_batch": round(ms, 2),
                          "mean_abs_diff_vs_linear_aa": round(diff, 5)}))


# ---------------------------------------------------------------------------
# round-2 tail #2: matmul/conv reformulations (crop einsum, conv shear)


def crop2_ab():
    """scale_and_translate vs the explicit einsum impls of the SAME weight
    matrices (cmx/ops/augment.py random_resized_crop impl=...)."""
    from cmx.ops import augment as A

    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    one = np.sin(yy / 25.0) + np.cos(xx / 19.0)
    imgs = jnp.asarray(np.broadcast_to(one, (BATCH, SIZE, SIZE)).copy(),
                       dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), BATCH)

    def run(impl):
        return jax.jit(jax.vmap(lambda k, im: A.random_resized_crop(
            k, im, VIEW, scale=(0.2, 1.0), method="linear", impl=impl)))

    ref = run("scale_translate")(keys, imgs)
    for impl in ("scale_translate", "einsum", "einsum_bf16"):
        f = run(impl)
        ms = _time(f, keys, imgs) * 1e3
        out = f(keys, imgs)
        diff = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({"crop_impl": impl, "ms_per_batch": round(ms, 2),
                          "max_abs_diff_vs_scale_translate": round(diff, 6)}))

    # weight construction alone (2 mats/sample) — separates build vs contract
    def weights_only(k, im):
        h, w = im.shape
        k1, k2, k3, k4 = jax.random.split(k, 4)
        area = h * w * jax.random.uniform(k1, minval=0.2, maxval=1.0)
        aspect = jnp.exp(jax.random.uniform(
            k2, minval=jnp.log(3 / 4), maxval=jnp.log(4 / 3)))
        cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
        ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
        y0 = jax.random.uniform(k3) * (h - ch)
        x0 = jax.random.uniform(k4) * (w - cw)
        sy, sx = VIEW / ch, VIEW / cw
        return (A._resize_weight_mat(h, VIEW, sy, -y0 * sy),
                A._resize_weight_mat(w, VIEW, sx, -x0 * sx))

    f = jax.jit(jax.vmap(weights_only))
    ms = _time(f, keys, imgs) * 1e3
    print(json.dumps({"crop_impl": "weights_only", "ms_per_batch": round(ms, 2)}))


def rot2_ab():
    """flat take (production nearest) vs shear3 under conv / dynamic-slice /
    unrolled-shift shears. Production method="shear3" now runs the unrolled
    shears (bit-exact; the conv rounds values to bf16 on TPU even at
    Precision.HIGHEST — see artifacts/r2/moco_aug3_rot2.log), so the conv
    row here wraps A._shear_rows_conv directly to keep measuring it."""
    from cmx.ops import augment as A

    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    one = np.sin(yy / 25.0) + np.cos(xx / 19.0)
    imgs = jnp.asarray(np.broadcast_to(one, (BATCH, SIZE, SIZE)).copy(),
                       dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), BATCH)

    def shear3_dus(key, img):
        """_rotate_shear3 with the pre-conv _shear_rows (DUS) bodies."""
        ka = jax.random.split(key, 2)[1]
        angle = jnp.deg2rad(jax.random.uniform(ka, minval=-180.0, maxval=180.0))
        h, w = img.shape
        quarter = jnp.round(angle / (jnp.pi / 2)).astype(jnp.int32)
        phi = -(angle - quarter * (jnp.pi / 2))
        img = jax.lax.switch((-quarter) % 4,
                             [lambda x: x, lambda x: jnp.rot90(x, 1),
                              lambda x: jnp.rot90(x, 2), lambda x: jnp.rot90(x, 3)],
                             img)
        a, b = -jnp.tan(phi / 2.0), jnp.sin(phi)
        sx = jnp.round(a * (jnp.arange(h) - (h - 1) / 2.0)).astype(jnp.int32)
        sy = jnp.round(b * (jnp.arange(w) - (w - 1) / 2.0)).astype(jnp.int32)
        img = A._shear_rows(img, sx)
        img = A._shear_rows(img.T, sy).T
        img = A._shear_rows(img, sx)
        return img.astype(jnp.float32)

    def shear3_conv(key, img):
        """_rotate_shear3 with the (rejected) depthwise-conv shear bodies."""
        ka = jax.random.split(key, 2)[1]
        angle = jnp.deg2rad(jax.random.uniform(ka, minval=-180.0, maxval=180.0))
        h, w = img.shape
        quarter = jnp.round(angle / (jnp.pi / 2)).astype(jnp.int32)
        phi = -(angle - quarter * (jnp.pi / 2))
        img = jax.lax.switch((-quarter) % 4,
                             [lambda x: x, lambda x: jnp.rot90(x, 1),
                              lambda x: jnp.rot90(x, 2), lambda x: jnp.rot90(x, 3)],
                             img)
        a, b = -jnp.tan(phi / 2.0), jnp.sin(phi)
        sx = jnp.round(a * (jnp.arange(h) - (h - 1) / 2.0)).astype(jnp.int32)
        sy = jnp.round(b * (jnp.arange(w) - (w - 1) / 2.0)).astype(jnp.int32)
        import math as _m
        mx = int(_m.tan(_m.pi / 8) * (h - 1) / 2 + 0.5) + 1
        my = int(_m.sin(_m.pi / 4) * (w - 1) / 2 + 0.5) + 1
        img = A._shear_rows_conv(img, sx, mx)
        img = A._shear_rows_conv(img.T, sy, my).T
        img = A._shear_rows_conv(img, sx, mx)
        return img.astype(jnp.float32)

    def flat_global(keys, imgs):
        """Exact nearest rotation, ONE take over the flattened batch."""
        b, h, w = imgs.shape
        kas = jax.vmap(lambda k: jax.random.split(k, 2)[1])(keys)
        angles = jax.vmap(lambda ka: jnp.deg2rad(jax.random.uniform(
            ka, minval=-180.0, maxval=180.0)))(kas)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = jnp.mgrid[0:h, 0:w]
        c = jnp.cos(angles)[:, None, None]
        s = jnp.sin(angles)[:, None, None]
        src_y = c * (yy - cy)[None] - s * (xx - cx)[None] + cy
        src_x = s * (yy - cy)[None] + c * (xx - cx)[None] + cx
        iy = jnp.round(src_y).astype(jnp.int32)
        ix = jnp.round(src_x).astype(jnp.int32)
        inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        idx = base + jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        out = jnp.take(imgs.reshape(-1), idx.reshape(-1)).reshape(b, h, w)
        return jnp.where(inside, out, 0.0).astype(jnp.float32)

    fns = {
        "flat_nearest": lambda k, im: A.random_rotation(
            k, im, 180.0, p=1.0, method="nearest"),
        "shear3_conv": shear3_conv,
        "shear3_dus": shear3_dus,
        "shear3_unroll": lambda k, im: A.random_rotation(
            k, im, 180.0, p=1.0, method="shear3"),
    }
    ref = jax.jit(jax.vmap(fns["flat_nearest"]))(keys, imgs)
    conv = jax.jit(jax.vmap(fns["shear3_conv"]))(keys, imgs)
    dus = jax.jit(jax.vmap(fns["shear3_dus"]))(keys, imgs)
    unr = jax.jit(jax.vmap(fns["shear3_unroll"]))(keys, imgs)
    print(json.dumps({"conv_vs_dus_bitmatch": bool(jnp.array_equal(conv, dus)),
                      "unroll_vs_dus_bitmatch": bool(jnp.array_equal(unr, dus))}))
    for name, fn in fns.items():
        f = jax.jit(jax.vmap(fn))
        ms = _time(f, keys, imgs) * 1e3
        out = f(keys, imgs)
        mismatch = float(jnp.mean(jnp.abs(out - ref) > 1e-6))
        print(json.dumps({"rot": name, "ms_per_batch": round(ms, 2),
                          "pixel_mismatch_vs_flat": round(mismatch, 4)}))
    # whole-batch single-take variant of the production nearest path
    fg = jax.jit(flat_global)
    ms = _time(fg, keys, imgs) * 1e3
    out = fg(keys, imgs)
    mismatch = float(jnp.mean(jnp.abs(out - ref) > 1e-6))
    print(json.dumps({"rot": "flat_global", "ms_per_batch": round(ms, 2),
                      "pixel_mismatch_vs_flat": round(mismatch, 4)}))


def view2_ab():
    """Full moco_view_aug (x2 views, like the train step) under formulation
    combos; projected step time = 131.8 ms model + measured aug."""
    from cmx.ops import augment as A

    imgs = _batch()
    key = jax.random.key(0)
    combos = {
        "baseline(nearest,scale_translate)": ("nearest", "scale_translate"),
        "einsum_crop(nearest,einsum)": ("nearest", "einsum"),
        "einsum_bf16(nearest,einsum_bf16)": ("nearest", "einsum_bf16"),
        "shear3(shear3,einsum)": ("shear3", "einsum"),
    }
    for name, (rot, ci) in combos.items():
        def two_views(k, b, rot=rot, ci=ci):
            kq, kk = jax.random.split(k)
            vq = A.vmap_aug(A.moco_view_aug, kq, b, VIEW, rot, None, ci)
            vk = A.vmap_aug(A.moco_view_aug, kk, b, VIEW, rot, None, ci)
            return vq, vk

        f = jax.jit(two_views)
        ms = _time(f, key, imgs) * 1e3
        proj = 131.8 + ms
        print(json.dumps({"views": name, "ms_per_batch": round(ms, 2),
                          "projected_step_ms": round(proj, 1),
                          "projected_img_s": round(BATCH / proj * 1e3, 1)}))


def crop3_ab():
    """Fused Pallas crop kernel vs the XLA formulations: same RNG stream /
    windows (shared _crop_window_params), ms + max|diff| vs scale_translate.
    The pallas row batches via ONE kernel (grid=B), matching how
    moco_view_aug_batch wires it in production."""
    from cmx.ops import augment as A
    from cmx.ops.pallas_crop import crop_resize_pallas

    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    one = np.sin(yy / 25.0) + np.cos(xx / 19.0)
    imgs = jnp.asarray(np.broadcast_to(one, (BATCH, SIZE, SIZE)).copy(),
                       dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), BATCH)

    def run(impl):
        return jax.jit(jax.vmap(lambda k, im: A.random_resized_crop(
            k, im, VIEW, scale=(0.2, 1.0), method="linear", impl=impl)))

    @jax.jit
    def run_pallas_batch(keys, imgs):
        params = jax.vmap(lambda k: jnp.stack(A._crop_window_params(
            k, SIZE, SIZE, VIEW, (0.2, 1.0), (3 / 4, 4 / 3))))(keys)
        return crop_resize_pallas(imgs, params, VIEW, method="linear")

    ref = run("scale_translate")(keys, imgs)
    for impl in ("scale_translate", "einsum"):
        f = run(impl)
        ms = _time(f, keys, imgs) * 1e3
        out = f(keys, imgs)
        diff = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({"crop_impl": impl, "ms_per_batch": round(ms, 2),
                          "max_abs_diff_vs_scale_translate": round(diff, 6)}))
    ms = _time(run_pallas_batch, keys, imgs) * 1e3
    out = run_pallas_batch(keys, imgs)
    diff = float(jnp.max(jnp.abs(out - ref)))
    print(json.dumps({"crop_impl": "pallas_batch", "ms_per_batch": round(ms, 2),
                      "max_abs_diff_vs_scale_translate": round(diff, 6)}))

    @jax.jit
    def run_bank_batch(keys, imgs):
        # the batch-hoisted wiring of moco_view_aug_batch: same RNG window
        # stream, integer-quantized windows, weights from the bank
        box = jax.vmap(lambda k: jnp.stack(A._crop_window_box(
            k, SIZE, SIZE, (0.2, 1.0), (3 / 4, 4 / 3))))(keys)
        return A.bank_crop_batch(
            imgs, (box[:, 0], box[:, 1], box[:, 2], box[:, 3]), VIEW,
            method="linear")

    ms = _time(run_bank_batch, keys, imgs) * 1e3
    out = run_bank_batch(keys, imgs)
    diff = float(jnp.max(jnp.abs(out - ref)))
    print(json.dumps({"crop_impl": "bank_batch", "ms_per_batch": round(ms, 2),
                      "max_abs_diff_vs_scale_translate": round(diff, 6),
                      "note": "diff = documented integer-window quantization"}))


def view3_ab():
    """PRODUCTION view pipeline (moco_view_aug_batch: whole-batch rotation)
    x2 views with the crop impl switched — the in-context A/B of the fused
    Pallas crop. projected step = 131.8 ms model + measured aug."""
    from cmx.ops import augment as A

    imgs = _batch()
    key = jax.random.key(0)

    def two_views(k, b, ci, rm=None):
        kq, kk = jax.random.split(k)
        vq = A.moco_view_aug_batch(kq, b, VIEW, rotation_method=rm,
                                   crop_impl=ci)
        vk = A.moco_view_aug_batch(kk, b, VIEW, rotation_method=rm,
                                   crop_impl=ci)
        return vq, vk

    ref = jax.jit(partial(two_views, ci="scale_translate"))(key, imgs)
    for ci, rm in (("scale_translate", None), ("einsum", None),
                   ("pallas", None), ("bank", None), ("bank_fused", None),
                   ("bank_fused", "shear3")):
        f = jax.jit(partial(two_views, ci=ci, rm=rm))
        ms = _time(f, key, imgs) * 1e3
        vq, vk = f(key, imgs)
        diff = float(jnp.maximum(jnp.max(jnp.abs(vq - ref[0])),
                                 jnp.max(jnp.abs(vk - ref[1]))))
        proj = 131.8 + ms
        tag = ci if rm is None else f"{ci}+{rm} (moco_fast)"
        print(json.dumps({"views": tag, "ms_per_batch": round(ms, 2),
                          "max_abs_diff_vs_scale_translate": round(diff, 6),
                          "projected_step_ms": round(proj, 1),
                          "projected_img_s": round(BATCH / proj * 1e3, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["breakdown", "rot", "crop",
                                    "crop2", "rot2", "view2",
                                    "crop3", "view3"])
    args = ap.parse_args()
    print(f"# devices: {jax.devices()}")
    if args.cmd == "breakdown":
        breakdown()
    elif args.cmd == "crop":
        crop_ab()
    elif args.cmd == "crop2":
        crop2_ab()
    elif args.cmd == "rot2":
        rot2_ab()
    elif args.cmd == "view2":
        view2_ab()
    elif args.cmd == "crop3":
        crop3_ab()
    elif args.cmd == "view3":
        view3_ab()
    else:
        rot_ab()


if __name__ == "__main__":
    main()
