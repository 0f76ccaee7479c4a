"""Fine-tune harness: fit + evaluate + grid_search at tiny scale."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmx.data.synthetic import make_batch
from cmx.models.unet import UNet
from cmx.train import harness


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    imgs, masks = make_batch(rng, batch=24, size=32)
    return imgs, masks


def test_fit_and_evaluate(data):
    imgs, masks = data
    model = UNet(out_classes=2, dtype=jnp.float32)
    res = harness.fit(
        imgs[:16], masks[:16], imgs[16:], masks[16:],
        lr=1e-2, epochs=2, batch=8, model=model, augment=False,
    )
    assert len(res.valid_logs["dice_loss"]) == 2
    assert res.runtime > 0
    assert 0 <= res.best_epoch < 2
    m = harness.evaluate(
        harness.get_runner(model, False).eval_fn, res.state,
        imgs[16:], masks[16:], batch=8, host=True,
    )
    assert "hausdorff" in m and "soft_clDice" in m
    assert np.isfinite(m["dice_loss"])


def test_grid_search_picks_best(data, tmp_path):
    imgs, masks = data
    model = UNet(out_classes=2, dtype=jnp.float32)
    lr, bs, eps, results = harness.grid_search(
        imgs, masks, lrs=[1e-2, 1e-3], epochs_grid=[1], batches=[8],
        n_folds=2, model=model, augment=False,
        results_path=str(tmp_path / "res.pkl"),
    )
    assert lr in (1e-2, 1e-3)
    assert len(results) == 2
    assert (tmp_path / "res.pkl").exists()
    # logs carry the reference metric names
    fold0 = results[0]["folds"][0]
    assert "dice_loss" in fold0["valid_logs"]
    assert "cross_entropy_loss" in fold0["valid_logs"]


def test_scan_fit_segmentation_invariant(monkeypatch):
    """The watchdog-safe segmented scan must be bitwise-equivalent to one
    unsegmented scan (epoch offsets are traced; carry threads best-state)."""
    import numpy as np
    import jax.numpy as jnp

    from cmx.data.synthetic import make_batch
    from cmx.models.unet import UNet
    from cmx.train import harness

    imgs, masks = map(np.asarray, make_batch(np.random.default_rng(3), 16, 32))
    model = UNet(out_classes=2, dtype=jnp.float32)

    def run():
        return harness.fit(imgs[:12], masks[:12], imgs[12:], masks[12:],
                           lr=1e-3, epochs=6, batch=4, augment=False,
                           model=model)

    res_one = run()  # budget 4096 -> single segment
    monkeypatch.setattr(harness, "_SEG_BUDGET", 24)  # forces 3 segments
    res_seg = run()
    assert res_one.valid_logs["dice_loss"] == res_seg.valid_logs["dice_loss"]
    assert res_one.train_logs["loss"] == res_seg.train_logs["loss"]
    assert res_one.best_epoch == res_seg.best_epoch
