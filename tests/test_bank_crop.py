"""Bank crop (task.crop_impl="bank"): integer-window RandomResizedCrop via
precomputed per-extent weight banks fetched with one-hot matmuls.

Exactness contract (cmx/ops/augment.py::bank_crop_batch): the only
deviation vs the continuous impls is window quantization — which
torchvision itself performs (RandomResizedCrop.get_params rounds extents
and draws integer offsets), and the window-confined resample (taps never
read outside the crop) is torchvision's crop-then-resize semantics. These
tests pin:
  * full-window case == jax.image.scale_and_translate (fp round-off)
  * arbitrary integer windows == torch F.interpolate(bilinear, antialias)
    on the cropped window (the reference-library oracle)
  * batch path == per-sample path, same RNG window stream as other impls
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops.augment import (
    _crop_window_box,
    _crop_window_params,
    bank_crop_batch,
    crop_ch_range,
    moco_view_aug_batch,
    random_resized_crop,
)


def test_full_window_matches_scale_and_translate(rng):
    """ch = H, offset 0: the crop is a plain resize; window-confined
    renormalization coincides with scale_and_translate's in-array
    renormalization, so the two formulations agree to fp round-off."""
    h = out = 0
    img = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    box = (jnp.array([64.0]), jnp.array([0.0]),
           jnp.array([64.0]), jnp.array([0.0]))
    got = bank_crop_batch(img[None], box, 48, method="linear",
                          scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3))[0]
    want = jax.image.scale_and_translate(
        img[..., None], (48, 48, 1), (0, 1),
        jnp.array([48 / 64, 48 / 64]), jnp.array([0.0, 0.0]),
        method="linear", antialias=True)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=0)


@pytest.mark.parametrize("ch,y0,cw,x0", [
    (56, 3, 40, 20),   # downscale both axes
    (30, 10, 34, 5),   # upscale both axes
    (48, 0, 64, 0),    # mixed; windows touching the border
])
def test_matches_torch_crop_then_resize(rng, ch, y0, cw, x0):
    """Integer window -> bank crop == torch F.interpolate(bilinear,
    antialias=True) of the cropped window — the same algorithm torchvision
    uses for tensor-backend resized_crop."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = rng.normal(size=(64, 64)).astype(np.float32)
    out = 48
    box = (jnp.array([float(ch)]), jnp.array([float(y0)]),
           jnp.array([float(cw)]), jnp.array([float(x0)]))
    got = bank_crop_batch(jnp.asarray(img)[None], box, out, method="linear",
                          scale=(0.1, 1.0), ratio=(1 / 2, 2.0))[0]
    win = torch.from_numpy(img[y0:y0 + ch, x0:x0 + cw])[None, None]
    want = F.interpolate(win, size=(out, out), mode="bilinear",
                         antialias=True, align_corners=False)[0, 0].numpy()
    # 1e-4: fp32 round-off between the two weight/accumulation orders
    # (measured max 2.6e-5 over these windows)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=0)


def test_bank_rounding_and_range(rng):
    """Continuous boxes round to integers clipped into the bank range and
    valid offsets; output stays finite for extreme draws."""
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    lo, hi = crop_ch_range(64, (0.2, 1.0), (3 / 4, 4 / 3))
    assert 1 <= lo < hi <= 64
    # extreme continuous draws: below/above the range, offsets at the edge
    box = (jnp.array([1.0, 63.7, float(lo), float(hi)]),
           jnp.array([0.0, 0.2, 63.0, 0.0]),
           jnp.array([64.0, 28.4, float(lo), float(hi)]),
           jnp.array([0.0, 35.1, 63.0, 0.0]))
    out = bank_crop_batch(imgs, box, 48)
    assert out.shape == (4, 48, 48)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_asymmetric_ratio_axis_ranges(rng):
    """Round-3 advisor (medium): with an asymmetric aspect range the width
    axis draws cw = sqrt(area*aspect), whose true range is
    [sqrt(s0*A*r0), sqrt(s1*A*r1)] — NOT the height formula. The bank range
    must cover every drawn window on both axes, and the bank crop must
    still match the torch crop-then-resize oracle for a wide window only
    reachable under the asymmetric range."""
    h = w = 64
    scale, ratio = (0.2, 1.0), (2.0, 3.0)  # r0*r1 != 1
    lo_h, hi_h = crop_ch_range(h, scale, ratio, w, axis="h")
    lo_w, hi_w = crop_ch_range(w, scale, ratio, h, axis="w")
    keys = jax.random.split(jax.random.key(0), 512)
    ch, y0, cw, x0 = jax.vmap(
        lambda k: jnp.stack(_crop_window_box(k, h, w, scale, ratio)))(
            keys).T
    chi = np.round(np.asarray(ch)).astype(int)
    cwi = np.round(np.asarray(cw)).astype(int)
    assert chi.min() >= lo_h and chi.max() <= hi_h
    assert cwi.min() >= lo_w and cwi.max() <= hi_w
    # the width range reaches beyond the (wrong) height-formula range
    wrong_hi = crop_ch_range(w, scale, ratio, h, axis="h")[1]
    assert cwi.max() > wrong_hi
    # oracle check on a wide window that the old formula would have clipped
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = rng.normal(size=(h, w)).astype(np.float32)
    ci, yi, wi, xi = 24, 5, 60, 2
    box = (jnp.array([float(ci)]), jnp.array([float(yi)]),
           jnp.array([float(wi)]), jnp.array([float(xi)]))
    got = bank_crop_batch(jnp.asarray(img)[None], box, 48, method="linear",
                          scale=scale, ratio=ratio)[0]
    win = torch.from_numpy(img[yi:yi + ci, xi:xi + wi])[None, None]
    want = F.interpolate(win, size=(48, 48), mode="bilinear",
                         antialias=True, align_corners=False)[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=0)


def test_single_image_impl_matches_batch(rng):
    """random_resized_crop(impl="bank") on one image == the batched path
    with the same key (same _crop_window_box stream)."""
    img = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    key = jax.random.key(7)
    got = random_resized_crop(key, img, 48, scale=(0.2, 1.0), impl="bank")
    box = _crop_window_box(key, 64, 64, (0.2, 1.0), (3 / 4, 4 / 3))
    want = bank_crop_batch(
        img[None], tuple(jnp.broadcast_to(v, (1,)) for v in box), 48)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_window_stream_shared_with_other_impls():
    """The bank path consumes the same RNG draws as scale_translate: the
    continuous box converts to exactly the (sy, ty, sx, tx) the other
    impls use."""
    key = jax.random.key(3)
    ch, y0, cw, x0 = _crop_window_box(key, 64, 64, (0.2, 1.0), (3 / 4, 4 / 3))
    sy, ty, sx, tx = _crop_window_params(key, 64, 64, 48, (0.2, 1.0),
                                         (3 / 4, 4 / 3))
    np.testing.assert_allclose(float(sy), 48 / float(ch), rtol=1e-6)
    np.testing.assert_allclose(float(ty), -float(y0) * 48 / float(ch),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(sx), 48 / float(cw), rtol=1e-6)
    np.testing.assert_allclose(float(tx), -float(x0) * 48 / float(cw),
                               rtol=1e-5, atol=1e-5)


def test_quantization_deviation_is_small(rng):
    """bank vs scale_translate on the same keys: differences are bounded by
    the sub-pixel window quantization (not a wrong resample)."""
    imgs = jnp.asarray(rng.normal(size=(8, 64, 64)).astype(np.float32))
    imgs = jnp.cumsum(jnp.cumsum(imgs, 1), 2) / 64.0  # smooth field
    key = jax.random.key(11)
    keys = jax.random.split(key, 8)
    a = jax.vmap(lambda k, im: random_resized_crop(
        k, im, 48, impl="scale_translate"))(keys, imgs)
    b = jax.vmap(lambda k, im: random_resized_crop(
        k, im, 48, impl="bank"))(keys, imgs)
    diff = float(jnp.mean(jnp.abs(a - b)))
    scale = float(jnp.mean(jnp.abs(a)))
    # <=half-pixel window shifts on a 64px image move the view by ~7% of
    # mean |value| at most; at the production 256->224 the same half-pixel
    # is proportionally ~4x smaller. This bound catches a wrong resample,
    # not the documented quantization.
    assert diff < 0.1 * scale, (diff, scale)


def test_moco_view_aug_batch_bank(rng):
    """The batch-hoisted bank view pipeline runs, and its non-crop stages
    share the key tree: the output equals vmapped per-sample views with
    impl='bank' (exact same window draws + post-crop chain)."""
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    key = jax.random.key(5)
    got = moco_view_aug_batch(key, imgs, 48, crop_impl="bank")
    assert got.shape == (4, 48, 48)
    assert bool(jnp.all(jnp.isfinite(got)))
    from cmx.ops.augment import moco_view_aug, vmap_aug
    want = vmap_aug(moco_view_aug, key, imgs, 48, None, None, "bank")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=0)


def test_bank_fused_matches_per_stage_chain(rng):
    """crop_impl='bank_fused' (crop+blur+flips as two matmuls per axis)
    == the per-stage chain with the bank crop, to fp32 summation-order
    round-off: same window/blur/flip/noise draws, blur's Toeplitz is the
    exact linear map of the replicate-pad conv, flips are exact row/col
    reversals of the composed matrices."""
    imgs = jnp.asarray(rng.normal(size=(6, 64, 64)).astype(np.float32))
    key = jax.random.key(9)
    fused = moco_view_aug_batch(key, imgs, 48, crop_impl="bank_fused")
    staged = moco_view_aug_batch(key, imgs, 48, crop_impl="bank")
    assert fused.shape == staged.shape == (6, 48, 48)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(staged),
                               atol=2e-5, rtol=0)


def test_blur_toeplitz_exact(rng):
    """The blur basis matmul reproduces gaussian_blur's conv exactly
    (same sigma, gate forced on) to fp round-off, including the
    replicate-pad edges."""
    from cmx.ops.augment import _blur_basis, _gaussian_kernel_1d, gaussian_blur

    img = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
    key = jax.random.key(4)
    want = gaussian_blur(key, img, p=1.1)  # gate always fires
    kp, ksig = jax.random.split(key)
    sigma = jax.random.uniform(ksig, minval=0.1, maxval=2.0)
    taps = _gaussian_kernel_1d(sigma, 3)
    basis = _blur_basis(32, 3)
    bm = jnp.einsum("t,tij->ij", taps, basis,
                    precision=jax.lax.Precision.HIGHEST)
    got = jnp.einsum("ih,hw->iw", bm, img,
                     precision=jax.lax.Precision.HIGHEST)
    got = jnp.einsum("iw,jw->ij", got, bm,
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=0)


def test_bank_cache_shared_across_jits(rng):
    """Regression: the weight bank is cached as a host numpy constant.
    An earlier version built it with jnp inside the first enclosing jit
    trace and cached the TRACER — the second jit using the cache failed
    with UnexpectedTracerError (found by the round-3 view A/B)."""
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    f1 = jax.jit(lambda k, b: moco_view_aug_batch(k, b, 48, crop_impl="bank"))
    f2 = jax.jit(lambda k, b: moco_view_aug_batch(k, b, 48,
                                                  crop_impl="bank_fused"))
    a = f1(jax.random.key(0), imgs)
    b = f2(jax.random.key(0), imgs)
    # third jit reuses the BLUR basis cache created inside f2's trace —
    # the second instance of the same leak (found by ab-view4 attempt 2)
    f3 = jax.jit(lambda k, b: moco_view_aug_batch(
        k, b, 48, rotation_method="shear3", crop_impl="bank_fused"))
    c = f3(jax.random.key(0), imgs)
    assert (bool(jnp.all(jnp.isfinite(a))) and bool(jnp.all(jnp.isfinite(b)))
            and bool(jnp.all(jnp.isfinite(c))))
