"""Aux subsystems: MoCo validation, SparK vis, analysis, preprocessing, TB."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_moco_validate_and_val_queue():
    from cmx.models.unet import UNetEncoderGAP
    from cmx.ssl.moco import (
        init_moco_extra, init_val_queue, make_moco_task, make_moco_validate,
    )
    from cmx.train.optim import make_optimizer
    from cmx.train.state import TrainState

    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32)).astype(np.float32))
    model = UNetEncoderGAP(dtype=jnp.float32)
    v = model.init(jax.random.key(0), imgs[:1])
    extra = init_moco_extra(jax.random.key(1), v["params"], v["batch_stats"], 64)
    tx = make_optimizer("sgd", 1e-3)
    state = TrainState.create(params=v["params"], batch_stats=v["batch_stats"],
                              tx=tx, extra=extra)
    vq = init_val_queue(jax.random.key(2), 64)
    validate = make_moco_validate(model, view_size=32, augment=False)
    metrics, vq2 = validate(state, vq, imgs, jax.random.key(3))
    assert set(metrics) == {"val_loss", "val_acc1", "val_acc5"}
    assert np.isfinite(float(metrics["val_loss"]))
    assert int(vq2["queue_ptr"]) == 8
    assert 0.0 <= float(metrics["val_acc1"]) <= 1.0


def test_spark_reconstruct_vis():
    from cmx.ops.masking import spark_active_mask
    from cmx.ssl.spark import SparKModel, spark_reconstruct

    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32)).astype(np.float32))
    model = SparKModel(mask_ratio=0.6, full_unet=True, dtype=jnp.float32)
    active = spark_active_mask(jax.random.key(1), 2, 2, 0.6)
    v = model.init(jax.random.key(0), imgs, active)
    inp, masked, rec_or_inp = spark_reconstruct(
        model, v["params"], v["batch_stats"], imgs, active
    )
    assert inp.shape == masked.shape == rec_or_inp.shape == imgs.shape
    # visible positions keep the original pixels exactly
    from cmx.ops.masking import upsample_mask

    act_pix = np.asarray(upsample_mask(active, 16)) > 0
    np.testing.assert_allclose(
        np.asarray(rec_or_inp)[act_pix], np.asarray(imgs)[act_pix]
    )
    # masked positions of `masked` are zero
    np.testing.assert_allclose(np.asarray(masked)[~act_pix], 0.0)


def test_analysis_bhattacharyya():
    from cmx.data.analysis import (
        bhattacharyya_coefficient, group_similarity_matrix, intensity_histogram,
    )

    rng = np.random.default_rng(0)
    a = [rng.normal(0, 1, (32, 32)) for _ in range(4)]
    b = [rng.normal(2, 1, (32, 32)) for _ in range(4)]
    ha, hb = intensity_histogram(a), intensity_histogram(b)
    assert bhattacharyya_coefficient(ha, ha) == pytest.approx(1.0, abs=1e-6)
    assert bhattacharyya_coefficient(ha, hb) < 0.9
    sim = group_similarity_matrix({"h1": a, "h2": b})
    assert sim["h1"]["h2"] == sim["h2"]["h1"] == pytest.approx(
        bhattacharyya_coefficient(ha, hb), abs=1e-9
    )


def test_preprocessing_pipeline(tmp_path):
    from cmx.data.preprocessing import (
        Cropper, IntensityNormalizer, MaskContourFiller, MaskIntegrater,
        MinMaxNormalizer, Pipeline, UnlabelledRemover, write_dataset,
    )

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (520, 520)).astype(np.uint8) for _ in range(3)]
    m0 = np.zeros((520, 520), np.uint8)
    m0[100:200, 100:200] = 255
    masks = [[m0], [], [m0.copy()]]

    pipe = Pipeline([
        UnlabelledRemover(), MaskIntegrater(), MaskContourFiller(),
        Cropper(size=475), IntensityNormalizer(),
    ])
    out_imgs, out_masks = pipe.transform(imgs, masks)
    assert len(out_imgs) == 2  # unlabelled dropped
    assert out_imgs[0].shape == (475, 475)
    assert out_masks[0].shape == (475, 475)
    assert abs(float(np.mean(out_imgs[0]))) < 1e-4  # z-scored
    assert set(np.unique(out_masks[0])) <= {0, 255}

    write_dataset(out_imgs, out_masks, ["a", "b"], str(tmp_path / "ds"))
    import os

    assert os.path.exists(tmp_path / "ds" / "imgs" / "a.npy")
    m = np.load(tmp_path / "ds" / "masks" / "a.npy")
    assert set(np.unique(m)) <= {0, 1}

    mm, _ = MinMaxNormalizer().transform([imgs[0]], [None])
    assert mm[0].min() == pytest.approx(0.0) and mm[0].max() == pytest.approx(1.0)


def test_tensorboard_logger_smoke(tmp_path):
    from cmx.utils.tensorboard import TensorboardLogger

    tb = TensorboardLogger(str(tmp_path / "tb"))
    tb.log_scalar("loss", 1.0, 0)
    tb.log_dict({"a": 1.0, "b": 2.0}, 1, prefix="x/")
    tb.close()


def test_metric_logger_log_every(capsys):
    from cmx.utils.logging import MetricLogger

    lg = MetricLogger()
    for x in lg.log_every(range(5), print_freq=2, header="t"):
        lg.update(loss=float(x))
    out = capsys.readouterr().out
    assert "t [0]" in out and "done in" in out


def test_layer_lr_decay_scales_and_transform():
    """Layer-wise lr decay (cmae/core/optimizer/optimizer.py:141-239 analog):
    earlier encoder stages get geometrically smaller update scales."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cmx.train.optim import layer_lr_decay_scales, scale_by_layer_decay

    params = {
        "encoder": {
            "down1": {"conv": jnp.ones((3, 3))},
            "down4": {"conv": jnp.ones((3, 3))},
            "bottleneck": {"conv": jnp.ones((3, 3))},
        },
        "decoder": {"head": {"kernel": jnp.ones((3, 3))}},
    }
    scales = layer_lr_decay_scales(params, decay_rate=0.5, num_layers=5)
    assert float(scales["encoder"]["down1"]["conv"]) == 0.5**5
    assert float(scales["encoder"]["down4"]["conv"]) == 0.5**2
    assert float(scales["encoder"]["bottleneck"]["conv"]) == 0.5**1
    assert float(scales["decoder"]["head"]["kernel"]) == 1.0

    tx = optax.chain(optax.sgd(1.0), scale_by_layer_decay(params, 0.5))
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    ups, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(
        np.asarray(ups["encoder"]["down1"]["conv"]), -(0.5**5), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ups["decoder"]["head"]["kernel"]), -1.0, rtol=1e-6
    )


def test_center_histograms_and_ridgeline(tmp_path):
    """Per-hospital distribution analysis + ridgeline plot
    (data_processing/utils.py:34-116)."""
    import numpy as np

    from cmx.data.analysis import (
        center_mean_histograms, group_by_center, ridgeline,
    )

    rng = np.random.default_rng(0)
    keyed = {
        f"{h:02d}-{i}": rng.normal(h * 0.5, 1, (16, 16))
        for h in range(3) for i in range(4)
    }
    groups = group_by_center(keyed)
    assert list(groups) == ["00", "01", "02"]
    hists = center_mean_histograms(keyed, bins=32)
    assert all(v.shape == (32,) for v in hists.values())
    # shifted centers -> histogram mass shifts right
    assert np.argmax(hists["02"]) >= np.argmax(hists["00"])
    try:
        ridgeline(hists, save_path=str(tmp_path / "ridge.png"))
        assert (tmp_path / "ridge.png").exists()
    except ImportError:
        pass  # matplotlib optional
