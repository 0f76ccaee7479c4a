"""End-to-end smoke tests for all five SSL pretraining regimes on the
8-device virtual mesh. Small images (32-64 px) keep CPU compile cheap; the
code path (mask -> encode -> densify/decode -> loss -> update) is identical
to the full-size TPU run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.data.synthetic import make_batch
from cmx.parallel.mesh import make_mesh, shard_batch
from cmx.train.optim import make_optimizer
from cmx.train.state import TrainState
from cmx.train.trainer import make_train_step


def _imgs(b=8, size=32):
    rng = np.random.default_rng(0)
    imgs, _ = make_batch(rng, batch=b, size=size)
    return jnp.asarray(imgs)


def _run_steps(task, model_init_fn, batch, extra=None, n=3, lr=1e-3):
    params, batch_stats = model_init_fn()
    tx = make_optimizer("adamw", lr, params_example=params)
    state = TrainState.create(
        params=params, batch_stats=batch_stats, tx=tx, extra=extra,
        rng=jax.random.key(0),
    )
    mesh = make_mesh()
    batch = shard_batch(batch, mesh)
    step = make_train_step(task, tx, donate=False)
    losses = []
    for _ in range(n):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert float(metrics["nonfinite"]) == 0.0, metrics
    return state, losses


def test_genesis_task():
    from cmx.models.unet import UNet
    from cmx.ssl.reconstruction import make_genesis_task

    imgs = _imgs()
    model = UNet(out_classes=1, dtype=jnp.float32)
    task, _ = make_genesis_task(model)

    def init():
        v = model.init(jax.random.key(0), imgs[:1])
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs)
    assert all(np.isfinite(losses))


def test_mae_task_masked_and_full_loss():
    from cmx.models.unet import UNet
    from cmx.ssl.reconstruction import make_mae_task

    imgs = _imgs()
    model = UNet(out_classes=1, dtype=jnp.float32)

    def init():
        v = model.init(jax.random.key(0), imgs[:1])
        return v["params"], v["batch_stats"]

    task, _ = make_mae_task(model, mask_ratio=0.5, patch_size=16)
    state, losses = _run_steps(task, init, imgs)
    assert losses[-1] < losses[0] * 2  # sane

    task2, _ = make_mae_task(model, masked_loss_only=True)
    _, losses2 = _run_steps(task2, init, imgs)
    assert all(np.isfinite(losses2))


def test_moco_task_queue_advances():
    from cmx.models.unet import UNetEncoderGAP
    from cmx.ssl.moco import init_moco_extra, make_moco_task

    imgs = _imgs(b=8, size=32)
    model = UNetEncoderGAP(dtype=jnp.float32)
    task, _ = make_moco_task(model, num_negatives=64, augment=False)

    v = model.init(jax.random.key(0), imgs[:1])
    extra = init_moco_extra(jax.random.key(1), v["params"], v["batch_stats"], 64)

    def init():
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs, extra=extra)
    # ptr advanced by 3 steps * 8 keys = 24
    assert int(state.extra["queue_ptr"]) == 24
    # queue rows 0..23 are unit-norm keys, different from init
    norms = np.linalg.norm(np.asarray(state.extra["queue"][:24]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # key params moved toward online params (EMA)
    k0 = np.asarray(jax.tree.leaves(extra["key_params"])[0])
    k1 = np.asarray(jax.tree.leaves(state.extra["key_params"])[0])
    assert not np.array_equal(k0, k1)
    # with augment=False q == k, so the positive logit (1/T) dominates the
    # random-queue negatives and the loss starts near zero
    assert 0.0 <= losses[0] < 10.0


def test_spark_task_full_unet():
    from cmx.ssl.spark import SparKModel, make_spark_task

    imgs = _imgs(b=8, size=32)
    model = SparKModel(mask_ratio=0.6, full_unet=True, dtype=jnp.float32)
    task, _ = make_spark_task(model, augment=False)

    def init():
        from cmx.ops.masking import spark_active_mask

        active = spark_active_mask(jax.random.key(9), 1, 2, 0.6)
        v = model.init(jax.random.key(0), imgs[:1], active)
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_spark_task_light_decoder():
    from cmx.ssl.spark import SparKModel, make_spark_task

    imgs = _imgs(b=8, size=32)
    model = SparKModel(mask_ratio=0.6, full_unet=False, decoder_width=64,
                       dtype=jnp.float32)
    task, _ = make_spark_task(model, augment=False)

    def init():
        from cmx.ops.masking import spark_active_mask

        active = spark_active_mask(jax.random.key(9), 1, 2, 0.6)
        v = model.init(jax.random.key(0), imgs[:1], active)
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs)
    assert all(np.isfinite(losses))


def test_spark_loss_only_masked_patches():
    """Loss ignores reconstruction on visible patches entirely."""
    from cmx.ssl.spark import spark_loss

    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32)).astype(np.float32))
    active = jnp.ones((2, 2, 2))  # everything visible -> no masked patches
    rec = jnp.zeros_like(imgs)
    loss = spark_loss(rec, imgs, active)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_cmunet_task():
    from cmx.ssl.cmunet import CMUNetOnline, init_cmunet_extra, make_cmunet_task

    imgs = _imgs(b=8, size=64)
    model = CMUNetOnline(dtype=jnp.float32)
    # view 32 => encoder bottleneck 2x2x1024 => reduce 256 => flat 1024
    task, _ = make_cmunet_task(model, view_size=32, patch_size=16, augment=False)

    v = model.init(
        jax.random.key(0), imgs[:1, :32, :32], jnp.ones((1, 32, 32))
    )
    extra = init_cmunet_extra(jax.random.key(1), v["params"], v["batch_stats"])

    def init():
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs, extra=extra)
    assert all(np.isfinite(losses))
    # target params drifted toward online (EMA with m=.996)
    t0 = np.asarray(jax.tree.leaves(extra["target_params"])[0])
    t1 = np.asarray(jax.tree.leaves(state.extra["target_params"])[0])
    assert not np.array_equal(t0, t1)
    # reduce kernel unchanged (fixed at init)
    np.testing.assert_array_equal(
        np.asarray(extra["reduce_kernel"]), np.asarray(state.extra["reduce_kernel"])
    )


def test_cmunet_task_bank_views():
    """The cmunet task trains with the bank view tail (task.crop_impl=
    'bank' through cmunet_two_views_batch) — finite losses, EMA advances.
    The view-level bank==per-sample equivalence is pinned in test_ops."""
    from cmx.ssl.cmunet import CMUNetOnline, init_cmunet_extra, make_cmunet_task

    imgs = _imgs(b=8, size=64)
    model = CMUNetOnline(dtype=jnp.float32)
    task, _ = make_cmunet_task(model, view_size=32, patch_size=16,
                               augment=True, crop_impl="bank")
    v = model.init(
        jax.random.key(0), imgs[:1, :32, :32], jnp.ones((1, 32, 32))
    )
    extra = init_cmunet_extra(jax.random.key(1), v["params"], v["batch_stats"])

    def init():
        return v["params"], v["batch_stats"]

    state, losses = _run_steps(task, init, imgs, extra=extra)
    assert all(np.isfinite(losses))
