"""Config system, checkpoint roundtrip, encoder export/load, harness utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.config.config import Config, apply_overrides, display, to_dict


def test_overrides_typed():
    cfg = Config()
    apply_overrides(cfg, ["optim.lr=0.01", "train.epochs=7",
                          "task.name=spark", "task.full_unet=False",
                          "optim.wd_end=0.2", "optim.clip_norm=None"])
    assert cfg.optim.lr == 0.01
    assert cfg.train.epochs == 7
    assert cfg.task.name == "spark"
    assert cfg.task.full_unet is False
    assert cfg.optim.wd_end == 0.2
    assert cfg.optim.clip_norm is None


def test_overrides_unknown_key_raises():
    cfg = Config()
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["optim.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals"])


def test_display_and_dict():
    cfg = Config()
    s = display(cfg)
    assert "lr" in s and "[optim]" in s
    d = to_dict(cfg)
    assert d["train"]["seed"] == 42


def test_checkpoint_roundtrip(tmp_path):
    from cmx.ckpt.checkpoint import CheckpointManager
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState

    params = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    bs = {"layer": {"mean": jnp.zeros((4,))}}
    tx = make_optimizer("adamw", 1e-3, params_example=params)
    state = TrainState.create(params=params, batch_stats=bs, tx=tx,
                              rng=jax.random.key(0))
    state = state.replace(step=jnp.asarray(5, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(5, state, config={"a": 1})
    mgr.mgr.wait_until_finished()
    assert mgr.latest_step() == 5

    template = TrainState.create(params=jax.tree.map(jnp.zeros_like, params),
                                 batch_stats=jax.tree.map(jnp.zeros_like, bs),
                                 tx=tx, rng=jax.random.key(0))
    restored = mgr.restore(template)
    assert int(restored.step) == 5
    np.testing.assert_array_equal(
        np.asarray(restored.params["layer"]["kernel"]), np.ones((4, 4))
    )
    mgr.close()
    assert os.path.exists(tmp_path / "ck" / "config.json")


def test_save_best_gate(tmp_path):
    from cmx.ckpt.checkpoint import CheckpointManager
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState

    params = {"w": jnp.ones((2, 2))}
    tx = make_optimizer("sgd", 1e-3)
    state = TrainState.create(params=params, batch_stats={}, tx=tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert mgr.save_best(1, state, 0.5)
    assert not mgr.save_best(2, state, 0.7)  # worse -> not saved
    assert mgr.save_best(3, state, 0.3)
    mgr.mgr.wait_until_finished()
    assert mgr.latest_step() == 3
    mgr.close()


def test_encoder_export_load_roundtrip(tmp_path):
    from cmx.ckpt.checkpoint import export_encoder, load_encoder
    from cmx.models.unet import UNet
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState

    model = UNet(out_classes=1, dtype=jnp.float32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 32, 32)))
    tx = make_optimizer("sgd", 1e-3)
    state = TrainState.create(params=v["params"], batch_stats=v["batch_stats"], tx=tx)
    path = str(tmp_path / "encoder.npz")
    export_encoder(state, path)

    # load into a FRESH 2-class model: encoder subtree overwritten, decoder kept
    model2 = UNet(out_classes=2, dtype=jnp.float32)
    v2 = model2.init(jax.random.key(2), jnp.zeros((1, 32, 32)))
    params, bs = load_encoder(path, v2["params"], v2["batch_stats"])
    src = np.asarray(v["params"]["encoder"]["down1"]["double_conv"]["conv0"]["kernel"])
    dst = np.asarray(params["encoder"]["down1"]["double_conv"]["conv0"]["kernel"])
    np.testing.assert_array_equal(src, dst)
    # decoder untouched
    d0 = np.asarray(v2["params"]["decoder"]["up1"]["double_conv"]["conv0"]["kernel"])
    d1 = np.asarray(params["decoder"]["up1"]["double_conv"]["conv0"]["kernel"])
    np.testing.assert_array_equal(d0, d1)


def test_find_best_epochs():
    from cmx.train.harness import find_best_epochs

    logs = {
        "dice_loss": [0.9, 0.5, 0.4, 0.45],
        "cross_entropy_loss": [0.5, 0.3, 0.2, 0.5],
        "hausdorff": [float("inf"), 3.0, float("nan"), 2.0],
    }
    assert find_best_epochs(logs) == 2


def test_average_meter():
    from cmx.utils.logging import AverageMeter

    m = AverageMeter()
    for v in [1.0, 2.0, 3.0]:
        m.add(v)
    assert m.mean == pytest.approx(2.0)
    assert m.std == pytest.approx(np.std([1, 2, 3]))


def test_jsonl_logger(tmp_path):
    import json

    from cmx.utils.logging import JsonlLogger

    lg = JsonlLogger(str(tmp_path / "log.jsonl"))
    lg.write(epoch=0, loss=1.5)
    lg.write(epoch=1, loss=1.2)
    lines = open(tmp_path / "log.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["epoch"] == 1
