"""Device-op tests: augmentation graph, Genesis distortions, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops import augment, genesis, masking


KEY = jax.random.key(0)


def _img(rng, h=64, w=64):
    return jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))


# ------------------------------------------------------------------ augment


def test_random_resized_crop_shape(rng):
    img = _img(rng)
    out = augment.random_resized_crop(KEY, img, 32)
    assert out.shape == (32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_random_resized_crop_full_scale_is_resize(rng):
    img = _img(rng)
    out = augment.random_resized_crop(KEY, img, 64, scale=(1.0, 1.0), ratio=(1.0, 1.0))
    # scale=1, ratio=1 -> crop is the whole image -> output ~ original
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.2)


def test_flips_and_rot90(rng):
    img = _img(rng)
    flipped = augment.random_hflip(KEY, img, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(img)[:, ::-1])
    same = augment.random_hflip(KEY, img, p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(img))
    rot = augment.random_rot90(KEY, img)
    assert rot.shape == img.shape


def test_random_rotation_preserves_energy_roughly(rng):
    img = jnp.ones((32, 32))
    out = augment.random_rotation(KEY, img, 180.0, p=1.0)
    # rotation of constant image keeps interior at 1 (zero-padded corners)
    assert float(out[16, 16]) == pytest.approx(1.0, abs=1e-5)


def test_random_rotation_flat_take_matches_direct_gather(rng):
    """The flat 1-D take inside random_rotation (cmx/ops/augment.py) must be
    BIT-IDENTICAL to the direct 2-D gather img[clip(iy), clip(ix)] it
    replaced for throughput (on-TPU A/B: 328 vs 415 ms/batch,
    runs/r4/moco_flat_rot.log). Re-derives the gather here and asserts
    exact equality over random angles and a non-square image."""
    import numpy as np

    for shape in [(64, 64), (48, 80)]:
        img = jnp.asarray(np.random.default_rng(0).random(shape), jnp.float32)
        h, w = shape
        for seed in range(4):
            k = jax.random.key(seed)
            out = augment.random_rotation(k, img, 180.0, p=1.0, method="nearest")
            kp, ka = jax.random.split(k)
            angle = jnp.deg2rad(
                jax.random.uniform(ka, minval=-180.0, maxval=180.0))
            cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
            yy, xx = jnp.mgrid[0:h, 0:w]
            c, s = jnp.cos(angle), jnp.sin(angle)
            src_y = c * (yy - cy) - s * (xx - cx) + cy
            src_x = s * (yy - cy) + c * (xx - cx) + cx
            iy = jnp.round(src_y).astype(jnp.int32)
            ix = jnp.round(src_x).astype(jnp.int32)
            inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
            ref = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
            ref = jnp.where(inside, ref, 0.0).astype(jnp.float32)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_random_rotation_shear3_matches_gather(rng):
    """The rot90+three-shear formulation tracks the direct nearest gather:
    same shape/energy, >=0.99 correlation on a smooth field over random
    angles (per-pixel rounding-order deviation is expected and documented)."""
    import numpy as np

    yy, xx = np.mgrid[0:64, 0:64]
    img = jnp.asarray(np.sin(yy / 7.0) + np.cos(xx / 5.0), dtype=jnp.float32)
    for seed in range(4):
        k = jax.random.key(seed)
        d = augment.random_rotation(k, img, 180.0, p=1.0, method="nearest")
        s = augment.random_rotation(k, img, 180.0, p=1.0, method="shear3")
        assert s.shape == d.shape
        interior = (slice(16, 48), slice(16, 48))
        c = jnp.corrcoef(s[interior].ravel(), d[interior].ravel())[0, 1]
        assert float(c) > 0.99, f"seed {seed}: corr {float(c)}"


def test_shift_pixel_crop(rng):
    img = _img(rng, 256, 256)
    v1 = augment.shift_pixel_crop(KEY, img, 224, max_pixel=0)
    assert v1.shape == (224, 224)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(img)[16:240, 16:240])
    v2 = augment.shift_pixel_crop(KEY, img, 224, max_pixel=31)
    assert v2.shape == (224, 224)


def test_gaussian_blur_smooths(rng):
    img = _img(rng)
    out = augment.gaussian_blur(KEY, img, sigma_range=(2.0, 2.0), p=1.0)
    assert float(jnp.var(out)) < float(jnp.var(img))
    assert out.shape == img.shape


def test_downscale_degrades(rng):
    img = _img(rng)
    out = augment.downscale(KEY, img, scale=0.25, p=1.0)
    assert out.shape == img.shape
    # nearest down+up produces 4x4 blocks -> fewer unique values
    assert len(np.unique(np.asarray(out))) < len(np.unique(np.asarray(img)))


def test_pipelines_jit_and_shapes(rng):
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    out = jax.jit(lambda k, b: augment.vmap_aug(augment.spark_pretrain_aug, k, b, 64))(KEY, imgs)
    assert out.shape == (4, 64, 64)
    out = jax.jit(lambda k, b: augment.vmap_aug(augment.moco_view_aug, k, b, 32))(KEY, imgs)
    assert out.shape == (4, 32, 32)
    # the task.rotation_method knob threads through the vmapped pipeline
    out3 = jax.jit(
        lambda k, b: augment.vmap_aug(augment.moco_view_aug, k, b, 32, "shear3")
    )(KEY, imgs)
    assert out3.shape == (4, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out3)))
    v1, v2 = jax.jit(
        lambda k, b: augment.vmap_aug(augment.cmunet_two_views, k, b, 32, 8)
    )(KEY, jnp.asarray(rng.normal(size=(4, 256, 256)).astype(np.float32)))
    assert v1.shape == (4, 32, 32) and v2.shape == (4, 32, 32)


def test_cmunet_two_views_batch(rng):
    """cmunet_two_views_batch: the default path is bit-identical to the
    vmapped per-sample chain; the bank path shares the key tree (same
    ShiftPixel/noise draws) and equals a per-sample chain whose shared
    RandomResizedCrop uses impl='bank' (the quantization contract is the
    crop's, not the batching's)."""
    imgs = jnp.asarray(rng.normal(size=(4, 256, 256)).astype(np.float32))
    ref1, ref2 = jax.jit(lambda k, b: augment.vmap_aug(
        augment.cmunet_two_views, k, b, 32, 8))(KEY, imgs)
    got1, got2 = jax.jit(lambda k, b: augment.cmunet_two_views_batch(
        k, b, 32, 8, crop_impl="scale_translate"))(KEY, imgs)
    assert jnp.array_equal(ref1, got1) and jnp.array_equal(ref2, got2)

    def per_sample_bank(key, img, out_size, shift):
        ks = jax.random.split(key, 5)
        base = augment.random_resized_crop(
            ks[0], img, 256, scale=(0.2, 1.0), method="cubic", impl="bank")
        base = augment.random_hflip(ks[1], base)
        v1 = augment.shift_pixel_crop(ks[2], base, out_size, max_pixel=0)
        v2 = augment.shift_pixel_crop(ks[3], base, out_size, max_pixel=shift)
        v2 = augment.gaussian_noise_max10(ks[4], v2, p=0.5)
        return v1, v2

    want1, want2 = jax.jit(lambda k, b: augment.vmap_aug(
        per_sample_bank, k, b, 32, 8))(KEY, imgs)
    bank1, bank2 = jax.jit(lambda k, b: augment.cmunet_two_views_batch(
        k, b, 32, 8, crop_impl="bank"))(KEY, imgs)
    np.testing.assert_allclose(np.asarray(bank1), np.asarray(want1),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(bank2), np.asarray(want2),
                               atol=2e-5, rtol=0)


def test_moco_view_aug_batch_bitwise(rng):
    """moco_view_aug_batch (whole-batch single-take rotation) is
    bit-identical to the vmapped per-image pipeline for the production
    "nearest" path AND for the shear3 fallback — the trained function is
    unchanged by the hoisted-rotation optimization."""
    imgs = jnp.asarray(rng.normal(size=(6, 64, 64)).astype(np.float32))
    for method in (None, "nearest", "shear3"):
        ref = jax.jit(lambda k, b: augment.vmap_aug(
            augment.moco_view_aug, k, b, 32, method))(KEY, imgs)
        fast = jax.jit(lambda k, b: augment.moco_view_aug_batch(
            k, b, 32, method))(KEY, imgs)
        assert jnp.array_equal(ref, fast), method


def test_batch_rotate_nearest_bitwise(rng):
    """batch_rotate_nearest == vmap(random_rotation) bitwise, incl. the
    p-gating (some images pass through un-rotated)."""
    imgs = jnp.asarray(rng.normal(size=(8, 48, 48)).astype(np.float32))
    keys = jax.random.split(KEY, 8)
    ref = jax.jit(jax.vmap(
        lambda k, im: augment.random_rotation(k, im, 170.0, p=0.5)))(keys, imgs)
    fast = jax.jit(lambda k, b: augment.batch_rotate_nearest(
        k, b, 170.0, p=0.5))(keys, imgs)
    assert jnp.array_equal(ref, fast)
    # the p-gate actually bites: at least one image unchanged, one rotated
    same = jnp.all(ref == imgs, axis=(1, 2))
    assert bool(jnp.any(same)) and bool(jnp.any(~same))


def test_moco_crop_method_knob(rng):
    """task.crop_method threads through: default == explicit "linear"
    (torchvision RandomResizedCrop default BILINEAR,
    moco_data_module.py:123), "cubic" (the pre-fix behavior) differs."""
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    run = lambda cm: jax.jit(
        lambda k, b: augment.vmap_aug(augment.moco_view_aug, k, b, 32, None, cm)
    )(KEY, imgs)
    default, linear, cubic = run(None), run("linear"), run("cubic")
    assert jnp.array_equal(default, linear)
    assert not jnp.array_equal(default, cubic)
    assert cubic.shape == (4, 32, 32) and bool(jnp.all(jnp.isfinite(cubic)))


def test_crop_einsum_impl_matches_scale_and_translate(rng):
    """random_resized_crop(impl="einsum") applies _resize_weight_mat as two
    explicit dots; it must reproduce jax.image.scale_and_translate (the
    "scale_translate" impl) to fp32 round-off for BOTH resample kernels,
    across random crop windows (scale down to 0.2 => antialiased
    downsampling paths included)."""
    img = _img(rng, 96, 96)
    for method in ("linear", "cubic"):
        for i in range(6):
            k = jax.random.fold_in(KEY, i)
            ref = augment.random_resized_crop(
                k, img, 48, scale=(0.2, 1.0), method=method,
                impl="scale_translate")
            out = augment.random_resized_crop(
                k, img, 48, scale=(0.2, 1.0), method=method, impl="einsum")
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_crop_einsum_bf16_close(rng):
    img = _img(rng, 64, 64)
    ref = augment.random_resized_crop(KEY, img, 32, impl="scale_translate")
    out = augment.random_resized_crop(KEY, img, 32, impl="einsum_bf16")
    assert float(jnp.mean(jnp.abs(out - ref))) < 0.02


def test_shear_rows_conv_matches_dynamic_slice(rng):
    """_shear_rows_conv (one depthwise 1-D conv) must be bit-identical to
    _shear_rows (vmapped dynamic slices) for any |shift| <= max_shift,
    including the zero-fill at the borders."""
    img = _img(rng, 32, 32)
    shifts = jnp.asarray(rng.integers(-9, 10, size=32), jnp.int32)
    ref = augment._shear_rows(img, shifts)
    out = augment._shear_rows_conv(img, shifts, 9)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # bound exactly at max_shift
    out2 = augment._shear_rows_conv(img, jnp.full((32,), 9, jnp.int32), 9)
    ref2 = augment._shear_rows(img, jnp.full((32,), 9, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))


def test_shear_rows_unroll_matches_dynamic_slice(rng):
    """_shear_rows_unroll (static slices + one-hot masked adds — the
    production shear3 body: unlike the conv it stays bit-exact fp32 on TPU,
    artifacts/r2/moco_aug3_rot2.log) must be bit-identical to _shear_rows
    for any |shift| <= max_shift, including the zero-fill at the borders."""
    img = _img(rng, 32, 32)
    shifts = jnp.asarray(rng.integers(-9, 10, size=32), jnp.int32)
    ref = augment._shear_rows(img, shifts)
    out = augment._shear_rows_unroll(img, shifts, 9)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    out2 = augment._shear_rows_unroll(img, jnp.full((32,), -9, jnp.int32), 9)
    ref2 = augment._shear_rows(img, jnp.full((32,), -9, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))


def test_moco_crop_impl_knob(rng):
    """task.crop_impl threads through moco_view_aug: einsum == default
    scale_translate to fp round-off; the whole chain stays finite."""
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    run = lambda ci: jax.jit(
        lambda k, b: augment.vmap_aug(
            augment.moco_view_aug, k, b, 32, None, None, ci)
    )(KEY, imgs)
    default, einsum = run(None), run("einsum")
    np.testing.assert_allclose(
        np.asarray(einsum), np.asarray(default), atol=3e-5, rtol=1e-4)


# ------------------------------------------------------------------ genesis


def test_nonlinear_transformation_preserves_range(rng):
    img = _img(rng)
    out = genesis.nonlinear_transformation(KEY, img, prob=1.0)
    assert out.shape == img.shape
    # remap stays within [min, max] of the bezier endpoints
    assert float(out.min()) >= float(img.min()) - 1e-3
    assert float(out.max()) <= float(img.max()) + 1e-3


def test_local_pixel_shuffling_is_permutation_like(rng):
    img = _img(rng, 40, 40)
    out = genesis.local_pixel_shuffling(KEY, img, prob=1.0)
    assert out.shape == img.shape
    # shuffle moves pixels but preserves global statistics approximately
    assert float(jnp.abs(jnp.mean(out) - jnp.mean(img))) < 0.05
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_in_painting_modifies_blocks(rng):
    img = jnp.zeros((60, 60)) - 5.0
    out = genesis.image_in_painting(KEY, img)
    changed = np.asarray(out != img)
    assert changed.any()
    # painted values are uniform [0,1)
    assert float(out.max()) <= 1.0


def test_out_painting_keeps_some_blocks(rng):
    img = jnp.zeros((60, 60)) - 5.0
    out = genesis.image_out_painting(KEY, img)
    kept = np.asarray(out == -5.0)
    assert kept.any()  # some original kept
    assert (~kept).any()  # some noise


def test_genesis_batch_jits(rng):
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    x, y = jax.jit(genesis.genesis_batch)(KEY, imgs)
    assert x.shape == imgs.shape and y.shape == imgs.shape
    assert np.isfinite(np.asarray(x)).all()


# ------------------------------------------------------------------ masking


def test_random_patch_mask_exact_ratio():
    m = masking.random_patch_mask(KEY, batch=4, img_size=64, patch_size=16, mask_ratio=0.5)
    assert m.shape == (4, 64, 64)
    # exactly half the 16 patches masked -> active fraction 0.5
    np.testing.assert_allclose(np.asarray(m).mean(axis=(1, 2)), 0.5)
    # per-sample masks differ
    assert not np.array_equal(np.asarray(m[0]), np.asarray(m[1]))


def test_random_patch_mask_shared_mode():
    m = masking.random_patch_mask(KEY, batch=3, img_size=32, patch_size=16, mask_ratio=0.5, shared=True)
    assert np.array_equal(np.asarray(m[0]), np.asarray(m[1]))


def test_spark_active_mask_keep_count():
    m = masking.spark_active_mask(KEY, batch=8, fmap_size=4, mask_ratio=0.6)
    assert m.shape == (8, 4, 4)
    keeps = np.asarray(m).sum(axis=(1, 2))
    np.testing.assert_allclose(keeps, round(16 * 0.4))


def test_patchify_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    p = masking.patchify(x, 16)
    assert p.shape == (2, 4, 256)
    back = masking.unpatchify(p, 16, 32, 32)
    np.testing.assert_allclose(np.asarray(back[..., 0]), np.asarray(x))


def test_upsample_mask():
    g = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    up = masking.upsample_mask(g, 2)
    assert up.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(up[0, :2, :2]), 1.0)


def test_nonlinear_poly_close_to_exact(rng):
    """Fast Chebyshev-fit remap tracks the exact interp remap closely."""
    img = _img(rng, 64, 64)
    for seed in range(3):
        k = jax.random.key(seed)
        fast = genesis.nonlinear_transformation(k, img, prob=1.0)
        exact = genesis.nonlinear_transformation(k, img, prob=1.0, exact=True)
        span = float(img.max() - img.min())
        err = float(jnp.abs(fast - exact).max()) / span
        assert err < 0.05, err  # <5% of intensity span


def test_downscale_random_and_albumentations_noise(rng):
    """Round-2 aug parity hardening: Downscale(scale 0.5-1) discretized
    levels; GaussNoise sigma = sqrt(U(var_limit)) applied to float values
    as-is (Finetuning/dataset.py:146-149 albumentations arguments)."""
    import jax

    from cmx.ops.augment import _albumentations_gauss_noise, downscale_random

    img = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    out = downscale_random(jax.random.key(3), img, (0.5, 1.0), p=1.0)
    assert out.shape == img.shape and np.isfinite(np.asarray(out)).all()

    noisy = _albumentations_gauss_noise(jax.random.key(0), img, (10.0, 50.0), p=1.0)
    resid = np.asarray(noisy - img)
    # sigma in [sqrt(10), sqrt(50)] ~ [3.16, 7.07]
    assert 2.5 < resid.std() < 8.0, resid.std()


def test_shear_rows_unroll_radix_bitexact(rng):
    """The two-stage radix unroll is BIT-identical to the single-stage
    unroll (and hence to the dynamic-slice spec) for every shift in range,
    including the extremes and mixed signs across rows."""
    import jax.numpy as jnp
    from cmx.ops.augment import _shear_rows_unroll, _shear_rows_unroll_radix

    img = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    for m in (3, 5, 11, 29, 53):
        shifts = jnp.asarray(
            rng.integers(-m, m + 1, size=(64,)).astype(np.int32))
        # force the extremes to appear
        shifts = shifts.at[0].set(-m).at[1].set(m).at[2].set(0)
        a = _shear_rows_unroll(img, shifts, m)
        b = _shear_rows_unroll_radix(img, shifts, m)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), m
