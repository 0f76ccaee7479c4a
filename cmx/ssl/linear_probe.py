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


def _probe_apply(params, x, *, dropout_rng=None, p=0.0, train=False):
    """SSLEvaluator forward (evaluator.py:10-26).

    Linear head:  Dropout -> Linear(in, classes)
    MLP head:     Dropout -> Linear(in, hidden, no bias) -> BatchNorm1d ->
                  ReLU -> Dropout -> Linear(hidden, classes)
    BatchNorm here uses batch statistics in train mode and the same batch
    statistics at eval (the probe is trained full-batch, so they coincide).
    """
    def drop(x, key):
        if not train or p <= 0.0:
            return x
        keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
        return jnp.where(keep, x / (1.0 - p), 0.0)

    keys = (
        jax.random.split(dropout_rng, 2)
        if dropout_rng is not None
        else (None, None)
    )
    if "w_hidden" in params:
        h = drop(x, keys[0]) @ params["w_hidden"]
        mean = h.mean(axis=0)
        var = h.var(axis=0)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * params["bn_scale"] + params["bn_bias"]
        h = jax.nn.relu(h)
        h = drop(h, keys[1])
        return h @ params["w_out"] + params["b_out"]
    return drop(x, keys[0]) @ params["w_out"] + params["b_out"]


def probe(
    feats: np.ndarray,
    labels: np.ndarray,
    *,
    n_classes: Optional[int] = None,
    hidden_dim: Optional[int] = None,
    dropout: float = 0.1,
    lr: float = 1e-2,
    steps: int = 500,
    seed: int = 0,
    test_fraction: float = 0.25,
) -> Dict[str, float]:
    """Train an SSLEvaluator-style probe on frozen features.

    `hidden_dim=None` = linear classifier; `hidden_dim=512` = the reference's
    MLP probe (Dropout/Linear/BN/ReLU/Dropout/Linear, evaluator.py:16-23).
    Returns train/test accuracy.
    """
    n_classes = n_classes or int(labels.max()) + 1
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(feats))
    n_test = max(1, int(len(feats) * test_fraction))
    te, tr = order[:n_test], order[n_test:]
    x_tr = jnp.asarray(feats[tr])
    y_tr = jnp.asarray(labels[tr])
    x_te = jnp.asarray(feats[te])
    y_te = jnp.asarray(labels[te])

    k_init = jax.random.key(seed)
    d = feats.shape[1]
    if hidden_dim:
        k1, k2 = jax.random.split(k_init)
        params = {
            "w_hidden": jax.random.normal(k1, (d, hidden_dim)) * (1.0 / np.sqrt(d)),
            "bn_scale": jnp.ones((hidden_dim,)),
            "bn_bias": jnp.zeros((hidden_dim,)),
            "w_out": jax.random.normal(k2, (hidden_dim, n_classes))
            * (1.0 / np.sqrt(hidden_dim)),
            "b_out": jnp.zeros((n_classes,)),
        }
    else:
        params = {"w_out": jnp.zeros((d, n_classes)), "b_out": jnp.zeros((n_classes,))}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def step(carry, i):
        params, opt_state = carry
        key = jax.random.fold_in(k_init, i)

        def loss_fn(params):
            logits = _probe_apply(params, x_tr, dropout_rng=key, p=dropout, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y_tr).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    # One compiled scan instead of `steps` host dispatches (remote-TPU
    # friendly; same math, same rng stream).
    (params, opt_state), losses = jax.jit(
        lambda p, o: jax.lax.scan(step, (p, o), jnp.arange(steps))
    )(params, opt_state)
    loss = losses[-1]

    def acc(x, y):
        return float(jnp.mean((jnp.argmax(_probe_apply(params, x), -1) == y)))

    return {
        "train_acc": acc(x_tr, y_tr),
        "test_acc": acc(x_te, y_te),
        "final_loss": float(loss),
    }


def linear_probe(feats: np.ndarray, labels: np.ndarray, **kw) -> Dict[str, float]:
    """Linear-only probe (back-compat wrapper around `probe`)."""
    kw.setdefault("hidden_dim", None)
    kw.setdefault("dropout", 0.0)
    return probe(feats, labels, **kw)
