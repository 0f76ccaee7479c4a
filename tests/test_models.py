"""Shape-contract tests for the UNet family.

Modeled on the reference's only self-check, `convnet_test`
(/root/reference/Pretraining/Spark/models/custom.py:193-223): hierarchical
shapes, downsample ratio, channel counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.models.unet import (
    BOTTLENECK_WIDTH,
    DOWNSAMPLE_RATIO,
    ENCODER_WIDTHS,
    FEATURE_MAP_CHANNELS,
    UNet,
    UNetEncoder,
    UNetEncoderGAP,
)

B, H, W = 2, 64, 64


def test_unet_forward_shapes():
    model = UNet(out_classes=2, dtype=jnp.float32)
    x = jnp.zeros((B, H, W))
    variables = model.init(jax.random.key(0), x)
    y, updates = model.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (B, H, W, 2)
    assert y.dtype == jnp.float32
    assert "batch_stats" in updates


def test_unet_accepts_nhwc_input():
    model = UNet(out_classes=2, dtype=jnp.float32)
    x = jnp.zeros((B, H, W, 1))
    variables = model.init(jax.random.key(0), x)
    y, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (B, H, W, 2)


def test_encoder_hierarchy_contract():
    enc = UNetEncoder(dtype=jnp.float32)
    x = jnp.zeros((B, H, W))
    variables = enc.init(jax.random.key(0), x)
    (bottleneck, skips), _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert bottleneck.shape == (B, H // DOWNSAMPLE_RATIO, W // DOWNSAMPLE_RATIO, BOTTLENECK_WIDTH)
    assert len(skips) == 4
    for i, (skip, c) in enumerate(zip(skips, ENCODER_WIDTHS)):
        f = 2**i
        assert skip.shape == (B, H // f, W // f, c)
    assert tuple(FEATURE_MAP_CHANNELS) == tuple(ENCODER_WIDTHS) + (BOTTLENECK_WIDTH,)


def test_encoder_gap_embedding():
    enc = UNetEncoderGAP(dtype=jnp.float32)
    x = jnp.zeros((B, H, W))
    variables = enc.init(jax.random.key(0), x)
    emb, _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert emb.shape == (B, 1024)


def test_masked_encoder_zeroes_masked_positions():
    """SparK contract: with a mask, encoder activations at masked positions are 0
    at every scale (reference Spark/encoder.py:20-23 semantics)."""
    enc = UNetEncoder(dtype=jnp.float32)
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, 32, 32))
    # Mask out the right half at 16x16-patch granularity.
    mask = jnp.ones((1, 32, 32))
    mask = mask.at[:, :, 16:].set(0.0)
    variables = enc.init(key, x, mask)
    (bottleneck, skips), _ = enc.apply(variables, x, mask, mutable=["batch_stats"])
    # skip at full res: right half must be exactly zero
    np.testing.assert_allclose(np.asarray(skips[0][:, :, 16:, :]), 0.0)
    np.testing.assert_allclose(np.asarray(skips[1][:, :, 8:, :]), 0.0)


def test_bilinear_up_mode():
    model = UNet(out_classes=1, up_sample_mode="bilinear", dtype=jnp.float32)
    x = jnp.zeros((B, 32, 32))
    variables = model.init(jax.random.key(0), x)
    y, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (B, 32, 32, 1)


def test_eval_mode_uses_running_stats():
    model = UNet(out_classes=2, dtype=jnp.float32, use_running_average=True)
    x = jnp.ones((B, 32, 32))
    train_model = UNet(out_classes=2, dtype=jnp.float32)
    variables = train_model.init(jax.random.key(0), x)
    y = model.apply(variables, x)  # no mutable needed in eval mode
    assert y.shape == (B, 32, 32, 2)


def test_param_count_in_expected_range():
    """The reference UNet is ~31M params; ours must match its architecture."""
    model = UNet(out_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 30e6 < n < 32.5e6, n
