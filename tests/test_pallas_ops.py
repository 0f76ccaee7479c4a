"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops.masking import spark_active_mask
from cmx.ops.pallas_ops import bn_relu_mask_pallas, spark_loss_pallas
from cmx.ssl.spark import spark_loss


def test_spark_loss_pallas_matches_reference(rng):
    imgs = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    rec = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.float32))
    active = spark_active_mask(jax.random.key(0), 4, 4, 0.6)
    want = float(spark_loss(rec, imgs, active))
    got = float(spark_loss_pallas(rec, imgs, active, patch=16, interpret=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_spark_loss_pallas_all_visible_zero(rng):
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    rec = jnp.zeros_like(imgs)
    active = jnp.ones((2, 2, 2))
    got = float(spark_loss_pallas(rec, imgs, active, interpret=True))
    assert got == pytest.approx(0.0, abs=1e-6)


def test_bn_relu_mask_pallas(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32))
    got = bn_relu_mask_pallas(x, scale, bias, mask, interpret=True)
    want = jnp.maximum(x * scale + bias, 0.0) * mask
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
