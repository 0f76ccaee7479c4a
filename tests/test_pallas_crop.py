"""Fused Pallas crop kernel: parity with the XLA crop formulations.

Runs in interpret mode on the CPU test mesh (pallas_ops._auto_interpret);
the compiled-on-TPU timing A/B lives in tools/ab_moco_aug.py (crop3/view3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops import augment
from cmx.ops.pallas_crop import crop_resize_pallas


def _img(rng, h=64, w=64):
    return jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_pallas_impl_matches_scale_and_translate(rng, method):
    """random_resized_crop(impl="pallas") == the default scale_and_translate
    path up to fp32 round-off: identical RNG stream (shared
    _crop_window_params), identical weight math, different executor."""
    img = _img(rng)
    for seed in range(4):
        k = jax.random.key(seed)
        ref = augment.random_resized_crop(
            k, img, 48, scale=(0.2, 1.0), method=method,
            impl="scale_translate")
        out = augment.random_resized_crop(
            k, img, 48, scale=(0.2, 1.0), method=method, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0)


def test_pallas_impl_upscale_window(rng):
    """Windows smaller than out_size (upscale, kernel_scale=1) also match."""
    img = _img(rng, 32, 32)
    for seed in range(3):
        k = jax.random.key(seed)
        ref = augment.random_resized_crop(
            k, img, 48, scale=(0.2, 0.5), impl="scale_translate")
        out = augment.random_resized_crop(
            k, img, 48, scale=(0.2, 0.5), impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0)


def test_batch_kernel_matches_vmapped_single(rng):
    """crop_resize_pallas over a batch == vmap of the per-sample pallas
    impl, bitwise (same kernel, grid vs vmap batching)."""
    batch = jnp.asarray(rng.normal(size=(5, 64, 64)).astype(np.float32))
    keys = jax.random.split(jax.random.key(1), 5)
    params = jax.vmap(lambda k: jnp.stack(augment._crop_window_params(
        k, 64, 64, 48, (0.2, 1.0), (3 / 4, 4 / 3))))(keys)
    batched = crop_resize_pallas(batch, params, 48, method="linear")
    single = jax.vmap(lambda k, im: augment.random_resized_crop(
        k, im, 48, scale=(0.2, 1.0), method="linear", impl="pallas"))(
            keys, batch)
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(single))


def test_moco_view_aug_batch_pallas_close(rng):
    """The batch-hoisted pallas view pipeline matches the production
    scale_translate pipeline to fp32 round-off through the full tail
    (blur/flips/noise), on the same key tree."""
    batch = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    key = jax.random.key(7)
    ref = augment.moco_view_aug_batch(key, batch, out_size=48)
    out = augment.moco_view_aug_batch(key, batch, out_size=48,
                                      crop_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=0)
