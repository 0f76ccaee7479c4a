"""Distributed correctness: sharded == single-device, and determinism.

The global-view claim of the trainer (SyncBN stats, implicit grad psum,
global-batch contrastive) is only true if an 8-way batch-sharded step
produces the SAME numbers as the unsharded step. This is the test the
reference cannot express (its DDP semantics differ from single-GPU by
construction: per-GPU BN stats unless SyncBN, shuffle-BN, etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cmx.data.synthetic import make_batch
from cmx.models.unet import UNet
from cmx.parallel.mesh import make_mesh, replicate, shard_batch
from cmx.train.optim import make_optimizer
from cmx.train.state import TrainState
from cmx.train.supervised import make_supervised_task
from cmx.train.trainer import make_train_step


def _setup():
    rng = np.random.default_rng(0)
    imgs, masks = make_batch(rng, batch=8, size=32)
    model = UNet(out_classes=2, dtype=jnp.float32)
    task, _ = make_supervised_task(model, augment=False)
    v = model.init(jax.random.key(0), jnp.asarray(imgs[:1]))
    tx = make_optimizer("sgd", 1e-2, momentum=0.9, params_example=v["params"])
    return imgs, masks, task, tx, v


def _one_step(task, tx, v, batch, mesh):
    state = TrainState.create(
        params=v["params"], batch_stats=v["batch_stats"], tx=tx,
        rng=jax.random.key(7),
    )
    state = replicate(state, mesh)
    step = make_train_step(task, tx, donate=False)
    state, metrics = step(state, shard_batch(batch, mesh))
    return state, metrics


def test_sharded_step_matches_single_device():
    imgs, masks, task, tx, v = _setup()
    batch = (jnp.asarray(imgs), jnp.asarray(masks))

    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices())
    s1, m1 = _one_step(task, tx, v, batch, mesh1)
    s8, m8 = _one_step(task, tx, v, batch, mesh8)

    assert float(m1["loss"]) == np.float32(m8["loss"])  # bitwise-comparable fp32
    np.testing.assert_allclose(
        float(m1["dice_loss"]), float(m8["dice_loss"]), rtol=1e-6
    )
    # updated params agree leafwise (global grad psum == unsharded grad)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # SyncBN: batch stats identical
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_step_deterministic_across_runs():
    imgs, masks, task, tx, v = _setup()
    batch = (jnp.asarray(imgs), jnp.asarray(masks))
    mesh = make_mesh()
    _, m_a = _one_step(task, tx, v, batch, mesh)
    _, m_b = _one_step(task, tx, v, batch, mesh)
    assert float(m_a["loss"]) == float(m_b["loss"])
