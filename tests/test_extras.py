"""Extended transforms, linear probe, apis, label smoothing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops import augment_extra as ax

KEY = jax.random.key(0)


def _img(rng, h=32, w=32):
    return jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))


def test_color_jitter(rng):
    img = _img(rng)
    out = ax.color_jitter(KEY, img, p=1.0)
    assert out.shape == img.shape
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_random_erasing(rng):
    img = jnp.ones((32, 32))
    out = ax.random_erasing(KEY, img, p=1.0, fill=0.0)
    erased = float(jnp.sum(out == 0.0))
    assert 0 < erased < 32 * 32


def test_solarize_posterize_invert(rng):
    img = _img(rng)
    s = ax.solarize(KEY, img, p=1.0)
    assert float(s.min()) >= float(img.min()) - 1e-5
    q = ax.posterize(KEY, img, bits=3, p=1.0)
    assert len(np.unique(np.asarray(q))) <= 2**3 + 1
    inv = ax.invert(KEY, img, p=1.0)
    np.testing.assert_allclose(
        np.asarray(inv + img), float(img.max() + img.min()), atol=1e-4
    )


def test_resize_edge(rng):
    img = _img(rng, 40, 80)
    out = ax.resize_edge(img, 20, mode="short")
    assert out.shape == (20, 40)
    out = ax.resize_edge(img, 20, mode="long")
    assert out.shape == (10, 20)


def test_translate(rng):
    img = jnp.ones((16, 16))
    out = ax.translate(KEY, img, max_frac=0.5, p=1.0)
    assert out.shape == img.shape
    assert float(out.sum()) <= 16 * 16  # zeros shifted in


def test_multi_view(rng):
    img = _img(rng)
    views = ax.multi_view(
        KEY, img,
        [lambda k, x: x * 2.0, lambda k, x: x + 1.0],
        [2, 1],
    )
    assert len(views) == 3
    np.testing.assert_allclose(np.asarray(views[0]), np.asarray(img) * 2)


def test_label_smooth_loss(rng):
    from cmx.eval.metrics import cross_entropy_loss, label_smooth_loss

    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
    onehot = jax.nn.one_hot((rng.random((2, 8, 8)) > 0.5).astype(int), 2)
    plain = float(cross_entropy_loss(logits, onehot))
    smooth = float(label_smooth_loss(logits, onehot, 0.1))
    assert smooth != pytest.approx(plain)
    assert np.isfinite(smooth)


def test_linear_probe_separates_easy_features(rng):
    from cmx.ssl.linear_probe import fg_fraction_labels, linear_probe

    # synthetic features where class is linearly decodable
    n, d = 64, 16
    labels = rng.integers(0, 4, n).astype(np.int32)
    feats = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    feats[np.arange(n), labels] += 3.0
    out = linear_probe(feats, labels, steps=300)
    assert out["test_acc"] > 0.7, out

    masks = (rng.random((10, 8, 8)) > 0.5).astype(np.float32)
    lb = fg_fraction_labels(masks, n_buckets=4)
    assert lb.shape == (10,) and lb.max() <= 3


def test_mlp_probe_separates_nonlinear_features(rng):
    """SSLEvaluator MLP variant (evaluator.py:16-23): hidden layer + dropout
    solves an XOR-style task the linear probe cannot."""
    from cmx.ssl.linear_probe import probe

    rng = np.random.default_rng(0)  # pinned: XOR probe quality is seed-noisy
    n = 256
    xy = rng.normal(size=(n, 2)).astype(np.float32)
    labels = ((xy[:, 0] > 0) ^ (xy[:, 1] > 0)).astype(np.int32)  # XOR
    feats = np.concatenate([xy, rng.normal(size=(n, 6)).astype(np.float32) * 0.1], 1)
    lin = probe(feats, labels, hidden_dim=None, dropout=0.0, steps=400)
    mlp = probe(feats, labels, hidden_dim=64, dropout=0.1, steps=800, lr=5e-3)
    assert mlp["test_acc"] > 0.85, (lin, mlp)
    assert mlp["test_acc"] > lin["test_acc"] + 0.15, (lin, mlp)


def test_apis_init_and_inference(rng):
    from cmx.apis import inference_model, init_model

    model, variables = init_model(out_classes=2, dtype=jnp.float32)
    img = rng.normal(size=(64, 64)).astype(np.float32)
    probs = inference_model(model, variables, img, size=256)
    assert probs.shape == (256, 256, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
