"""Metric parity tests: jnp implementations vs direct numpy/torch references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.eval import host_metrics
from cmx.eval.metrics import (
    cross_entropy_loss,
    dice_loss,
    f_score,
    iou_loss,
    mse_loss,
    segmentation_loss,
    segmentation_metrics,
    soft_cldice_loss,
    soft_skeletonize,
)


def _fake_batch(rng, b=2, h=32, w=32, c=2):
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = (rng.random((b, h, w)) > 0.7).astype(np.int32)
    onehot = np.stack([1 - labels, labels], axis=-1).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(onehot)


def test_f_score_perfect_prediction(rng):
    _, onehot = _fake_batch(rng)
    s = f_score(onehot, onehot, ignore_channels=[0])
    assert float(s) == pytest.approx(1.0, abs=1e-6)


def test_dice_loss_matches_manual(rng):
    logits, onehot = _fake_batch(rng)
    # Manual: softmax -> threshold 0.5 -> fg channel -> 1 - F1
    p = np.asarray(jax.nn.softmax(logits, axis=-1))
    pr = (p > 0.5).astype(np.float32)[..., 1]
    gt = np.asarray(onehot)[..., 1]
    tp = (pr * gt).sum()
    fp = pr.sum() - tp
    fn = gt.sum() - tp
    expected = 1 - (2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)
    got = float(dice_loss(logits, onehot))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_dice_threshold_blocks_gradient(rng):
    """Reference parity: thresholded Dice has zero gradient (train loss is
    CE-driven, Finetuning/train.py:455 + metrics.py:128-133)."""
    logits, onehot = _fake_batch(rng)
    g = jax.grad(lambda lg: dice_loss(lg, onehot))(logits)
    np.testing.assert_allclose(np.asarray(g), 0.0)
    g_soft = jax.grad(lambda lg: dice_loss(lg, onehot, threshold=None))(logits)
    assert float(jnp.abs(g_soft).max()) > 0


def test_cross_entropy_matches_torch(rng):
    import torch

    logits, onehot = _fake_batch(rng)
    got = float(cross_entropy_loss(logits, onehot))
    t_logits = torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2)
    t_target = torch.tensor(np.asarray(onehot)).permute(0, 3, 1, 2)
    expected = torch.nn.functional.cross_entropy(t_logits, t_target).item()
    assert got == pytest.approx(expected, rel=1e-5)


def test_iou_loss_range(rng):
    logits, onehot = _fake_batch(rng)
    v = float(iou_loss(logits, onehot))
    assert 0.0 <= v <= 1.0


def test_soft_skeletonize_matches_torch_reference(rng):
    """Our NHWC lax morphology == the torch max-pool formulation
    (metrics.py:447-492)."""
    import torch
    import torch.nn.functional as F

    img = (rng.random((1, 40, 40, 1)) > 0.6).astype(np.float32)
    got = np.asarray(soft_skeletonize(jnp.asarray(img), num_iter=5))

    def soft_erode(x):
        p1 = -F.max_pool2d(-x, (3, 1), (1, 1), (1, 0))
        p2 = -F.max_pool2d(-x, (1, 3), (1, 1), (0, 1))
        return torch.min(p1, p2)

    def soft_open(x):
        return F.max_pool2d(soft_erode(x), (3, 3), (1, 1), (1, 1))

    t = torch.tensor(img).permute(0, 3, 1, 2)
    skel = F.relu(t - soft_open(t))
    for _ in range(5):
        t = soft_erode(t)
        delta = F.relu(t - soft_open(t))
        skel = skel + F.relu(delta - skel * delta)
    expected = skel.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_soft_cldice_zero_for_perfect(rng):
    _, onehot = _fake_batch(rng)
    big_logits = (onehot * 2 - 1) * 20.0
    v = float(soft_cldice_loss(big_logits, onehot))
    assert v == pytest.approx(0.0, abs=1e-3)


def test_segmentation_loss_and_metrics_jit(rng):
    logits, onehot = _fake_batch(rng)
    loss = jax.jit(segmentation_loss)(logits, onehot)
    assert np.isfinite(float(loss))
    m = jax.jit(segmentation_metrics)(logits, onehot)
    assert set(m) == {"dice_loss", "cross_entropy_loss", "iou_loss", "soft_clDice"}


# ------------------------------------------------------------- host metrics


def test_hausdorff_identical_masks():
    m = np.zeros((32, 32), bool)
    m[10:20, 10:20] = True
    assert host_metrics.hausdorff_distance_mask(m, m) == pytest.approx(0.0)


def test_hausdorff_empty_cases():
    e = np.zeros((16, 16), bool)
    m = np.zeros((16, 16), bool)
    m[4:8, 4:8] = True
    assert host_metrics.hausdorff_distance_mask(e, e) == 0.0
    assert host_metrics.hausdorff_distance_mask(e, m) == float("inf")
    assert host_metrics.hausdorff_distance_mask(m, e) == float("inf")


def test_hausdorff_shifted_square():
    a = np.zeros((64, 64), bool)
    b = np.zeros((64, 64), bool)
    a[20:30, 20:30] = True
    b[25:35, 20:30] = True  # shifted 5 rows
    d = host_metrics.hausdorff_distance_mask(a, b, method="standard")
    assert 4.0 <= d <= 6.0


def test_skeletonize_line():
    m = np.zeros((32, 32), bool)
    m[10:13, 5:25] = True  # 3px-thick horizontal bar
    sk = host_metrics.skeletonize(m)
    assert sk.sum() > 0
    assert sk.sum() < m.sum() / 2  # thinned
    rows = np.argwhere(sk)[:, 0]
    assert set(rows) <= {10, 11, 12}


def test_radius_arteries_sane():
    m = np.zeros((64, 64), bool)
    m[30:35, 10:50] = True  # bar of half-width ~2
    rmin, rmean, rmax = host_metrics.compute_radius_arteries(m)
    assert 1.0 <= rmean <= 6.0
    assert rmin <= rmean <= rmax
