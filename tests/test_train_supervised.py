"""End-to-end supervised slice: data -> sharded pjit step -> loss falls.

This is the framework's minimum slice (SURVEY §7 build order step 1) run on
the 8-device virtual CPU mesh — the real sharded code path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cmx.data.synthetic import make_batch
from cmx.models.unet import UNet
from cmx.parallel.mesh import make_mesh, shard_batch
from cmx.train.optim import make_optimizer
from cmx.train.state import TrainState
from cmx.train.supervised import make_eval_fn, make_supervised_task
from cmx.train.trainer import make_train_step


def _tiny_model():
    # Narrow UNet keeps CPU-compile cheap; architecture code path identical.
    from cmx.models.unet import UNetEncoder, UNetDecoder
    return UNet(out_classes=2, dtype=jnp.float32)


def test_supervised_step_runs_and_improves():
    rng = np.random.default_rng(0)
    imgs, masks = make_batch(rng, batch=8, size=32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    model = UNet(out_classes=2, dtype=jnp.float32)
    task, _ = make_supervised_task(model, augment=False)

    variables = model.init(jax.random.key(0), imgs[:1])
    tx = make_optimizer("sgd", 1e-2, momentum=0.9,
                        params_example=variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx,
        rng=jax.random.key(1),
    )

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8  # virtual CPU mesh active
    batch = shard_batch((imgs, masks), mesh)
    step = make_train_step(task, tx, donate=False)

    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert float(metrics["nonfinite"]) == 0.0
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5

    # eval path with running stats
    eval_fn = make_eval_fn(model)
    logits = eval_fn(state.params, state.batch_stats, imgs)
    assert logits.shape == (8, 32, 32, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_nan_guard_skips_update():
    rng = np.random.default_rng(0)
    imgs, masks = make_batch(rng, batch=4, size=32)
    imgs = jnp.asarray(imgs).at[0, 0, 0].set(jnp.nan)
    masks = jnp.asarray(masks)

    model = UNet(out_classes=2, dtype=jnp.float32)
    task, _ = make_supervised_task(model, augment=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32)))
    tx = make_optimizer("sgd", 1e-2, params_example=variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    step = make_train_step(task, tx, donate=False)
    old_leaf = np.asarray(
        jax.tree.leaves(state.params)[0]
    ).copy()
    state2, metrics = step(state, (imgs, masks))
    assert float(metrics["nonfinite"]) == 1.0
    new_leaf = np.asarray(jax.tree.leaves(state2.params)[0])
    np.testing.assert_array_equal(old_leaf, new_leaf)  # update skipped


def test_nan_guard_protects_post_update_state():
    """A non-finite step must not poison task-owned extra state either:
    MoCo would otherwise enqueue NaN keys / absorb NaN EMA BN stats and make
    every later step NaN while the guard silently skips them (round-2 fix in
    cmx/train/trainer.py)."""
    import optax

    from cmx.train.trainer import Task, TaskAux

    def loss_fn(params, state, batch, rng):
        loss = jnp.sum(params["w"] * batch)
        return loss, TaskAux(
            batch_stats={}, metrics={},
            updates={"candidate": jnp.full((4,), loss)},
        )

    def post_update(state, aux):
        return {"queue": aux.updates["candidate"]}

    task = Task(name="toy", loss_fn=loss_fn, post_update=post_update)
    tx = optax.sgd(1e-2)
    state = TrainState.create(
        params={"w": jnp.ones((4,))}, batch_stats={}, tx=tx,
        extra={"queue": jnp.zeros((4,))},
    )
    step = make_train_step(task, tx, donate=False)

    # finite step: queue absorbs the new keys
    state2, m = step(state, jnp.ones((4,)))
    assert float(m["nonfinite"]) == 0.0
    assert np.all(np.asarray(state2.extra["queue"]) != 0.0)

    # NaN step: queue must stay EXACTLY as before
    before = np.asarray(state2.extra["queue"]).copy()
    state3, m = step(state2, jnp.full((4,), jnp.nan))
    assert float(m["nonfinite"]) == 1.0
    np.testing.assert_array_equal(np.asarray(state3.extra["queue"]), before)
