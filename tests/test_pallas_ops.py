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


def test_spark_loss_pallas_trainable_grads_match(rng):
    """custom_vjp wrapper: value AND gradient match jax.grad of the jnp loss."""
    from cmx.ops.pallas_ops import spark_loss_pallas_trainable

    imgs = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    rec = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    active = spark_active_mask(jax.random.key(3), 2, 4, 0.6)

    v_ref, g_ref = jax.value_and_grad(lambda r: spark_loss(r, imgs, active))(rec)
    v_pl, g_pl = jax.value_and_grad(
        lambda r: spark_loss_pallas_trainable(r, imgs, active, 16)
    )(rec)
    assert float(v_pl) == pytest.approx(float(v_ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_spark_task_pallas_loss_matches_jnp(rng):
    """make_spark_task(pallas_loss=True) computes the same loss and gradients
    as the jnp path in a full task step (interpret mode on CPU)."""
    from cmx.ssl.spark import SparKModel, make_spark_task
    from cmx.train.state import TrainState
    import optax

    imgs = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    model = SparKModel(mask_ratio=0.6, dtype=jnp.float32)
    active0 = spark_active_mask(jax.random.key(0), 1, 4, 0.6)
    variables = model.init(jax.random.key(0), imgs[:1], active0)
    tx = optax.sgd(1e-2)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    outs = {}
    for flag in (False, True):
        task, _ = make_spark_task(model, augment=False, pallas_loss=flag)
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            state.params, state, imgs, jax.random.key(7)
        )
        outs[flag] = (float(loss), grads)
    assert outs[True][0] == pytest.approx(outs[False][0], rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        ),
        outs[True][1], outs[False][1],
    )


def test_bn_relu_mask_pallas(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32))
    got = bn_relu_mask_pallas(x, scale, bias, mask, interpret=True)
    want = jnp.maximum(x * scale + bias, 0.0) * mask
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
