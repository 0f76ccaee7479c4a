"""Linear / MLP probe evaluation of pretrained encoders.

Counterpart of the vendored pl_bolts SSLEvaluator MLP probe + SSLFineTuner
linear-eval module (Pretraining/MoCo/pl_bolts/models/self_supervised/
evaluator.py:1-36, ssl_finetuner.py:1-145): train a small head on FROZEN
1024-d GAP features to measure representation quality. Here the labels are
segmentation-derived (default: foreground fraction buckets), since the FAME2
task has no image-level classes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmx.models.unet import UNetEncoderGAP


def fg_fraction_labels(masks: np.ndarray, n_buckets: int = 4) -> np.ndarray:
    """Image-level labels = quantile bucket of foreground fraction."""
    frac = masks[..., 1].mean(axis=(1, 2)) if masks.ndim == 4 else masks.mean(axis=(1, 2))
    qs = np.quantile(frac, np.linspace(0, 1, n_buckets + 1)[1:-1])
    return np.digitize(frac, qs).astype(np.int32)


def extract_features(
    params, batch_stats, imgs: np.ndarray, batch: int = 32,
    model: Optional[UNetEncoderGAP] = None,
) -> np.ndarray:
    """Frozen 1024-d GAP embeddings for a corpus."""
    model = model or UNetEncoderGAP(use_running_average=True)
    eval_model = model.clone(use_running_average=True)

    @jax.jit
    def fwd(x):
        return eval_model.apply({"params": params, "batch_stats": batch_stats}, x)

    feats = []
    n = imgs.shape[0]
    for i in range(0, n, batch):
        xb = imgs[i : i + batch]
        real = xb.shape[0]
        if real < batch:
            xb = np.concatenate([xb, xb[:1].repeat(batch - real, 0)])
        feats.append(np.asarray(fwd(jnp.asarray(xb)))[:real])
    return np.concatenate(feats)


def linear_probe(
    feats: np.ndarray,
    labels: np.ndarray,
    *,
    n_classes: Optional[int] = None,
    lr: float = 1e-2,
    steps: int = 500,
    seed: int = 0,
    test_fraction: float = 0.25,
) -> Dict[str, float]:
    """Train a linear classifier on frozen features; returns train/test acc."""
    n_classes = n_classes or int(labels.max()) + 1
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(feats))
    n_test = max(1, int(len(feats) * test_fraction))
    te, tr = order[:n_test], order[n_test:]
    x_tr = jnp.asarray(feats[tr])
    y_tr = jnp.asarray(labels[tr])
    x_te = jnp.asarray(feats[te])
    y_te = jnp.asarray(labels[te])

    w = jnp.zeros((feats.shape[1], n_classes))
    b = jnp.zeros((n_classes,))
    tx = optax.adam(lr)
    opt_state = tx.init((w, b))

    @jax.jit
    def step(wb, opt_state):
        def loss_fn(wb):
            logits = x_tr @ wb[0] + wb[1]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y_tr).mean()

        loss, g = jax.value_and_grad(loss_fn)(wb)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(wb, updates), opt_state, loss

    wb = (w, b)
    for _ in range(steps):
        wb, opt_state, loss = step(wb, opt_state)

    def acc(x, y):
        return float(jnp.mean((jnp.argmax(x @ wb[0] + wb[1], -1) == y)))

    return {
        "train_acc": acc(x_tr, y_tr),
        "test_acc": acc(x_te, y_te),
        "final_loss": float(loss),
    }
