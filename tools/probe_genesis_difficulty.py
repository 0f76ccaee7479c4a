"""Measure how locally invertible the Genesis distortions are on a corpus.

The round-2 MAE anomaly resolved to an inpaintability finding: at mask
ratio 0.5 the vessels are locally inpaintable, so the pretext task teaches
low-level features. This probe runs the analogous measurement for Genesis
(round-2 VERDICT missing #3's "measured explanation" arm): if a TRIVIAL
local estimator — the identity, or a small fixed blur — already achieves a
reconstruction MSE close to what the trained 31M-parameter UNet reaches,
the pretext objective is dominated by locally-undoable distortion and the
encoder has no pressure to learn shape priors.

Reference anchor: Genesis_Chest_CT.py trains MSE(distorted -> original)
with the distortion chain of Transformation_based/utils.py:209-253
(flip .4 / shuffle .5 / Bezier remap .9 / in-out-paint .9).

Baselines reported (all CPU/`jax`, corpus = the transfer corpus):
  * identity:      MSE(x_distorted, y)
  * blur3/blur7:   MSE(gauss_blur(x), y)   — a purely local smoother
  * median-ish:    MSE(5x5 mean(x), y)
  * per-rate ablation: identity-MSE of each distortion applied alone
Compare the printed numbers with the trained run's converged val MSE
(runs/*/pretrain_genesis.log) to read off how much of the objective a
local operator already solves.

With a trained model (`--model runs/.../ckpt/genesis/model.npz`) the probe
also evaluates the 31M UNet itself per distortion family — showing where
its capacity went: if it nearly zeroes the nonlinear-only MSE but barely
beats the identity on paint-only, the learned solution is tone-curve
inversion, not shape completion.

Usage: python tools/probe_genesis_difficulty.py [data_dir] [n] [--model p]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _mean_filter(x, k):
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    out = jnp.zeros_like(x)
    for dy in range(k):
        for dx in range(k):
            out = out + xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2]]
    return out / (k * k)


def _gauss(x, sigma, radius=3):
    from cmx.ops.augment import _gaussian_kernel_1d

    k1 = _gaussian_kernel_1d(jnp.float32(sigma), radius)
    pad = radius
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    t = jnp.einsum("t,bthw->bhw", k1, jnp.stack(
        [xp[:, i:i + x.shape[1], pad:pad + x.shape[2]]
         for i in range(2 * radius + 1)], 1))
    tp = jnp.pad(t, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    return jnp.einsum("t,bhwt->bhw", k1, jnp.stack(
        [tp[:, :, i:i + x.shape[2]] for i in range(2 * radius + 1)], -1))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model_path = None
    if "--model" in sys.argv:
        model_path = sys.argv[sys.argv.index("--model") + 1]
        args = [a for a in args if a != model_path]
    data_dir = args[0] if args else "runs/hard400"
    n = int(args[1]) if len(args) > 1 else 64

    from cmx.data.corpus import load_corpus
    from cmx.data.splits import list_corpus, make_splits
    from cmx.ops.genesis import genesis_batch

    xs, ys = list_corpus(data_dir)
    splits = make_splits(xs, ys, ratio=0.01)
    imgs, _ = load_corpus(splits.pretrain_x[:n], None, size=256)
    imgs = jnp.asarray(imgs)

    model_fwd = None
    if model_path:
        from cmx.ckpt.checkpoint import load_model_npz
        from cmx.models.unet import UNet

        model = UNet(out_classes=1, dtype=jnp.float32,
                     use_running_average=True)
        init = model.init(jax.random.key(0), imgs[:1])
        params, bs = load_model_npz(model_path, init["params"],
                                    init["batch_stats"])
        variables = {"params": params, "batch_stats": bs}
        model_fwd = jax.jit(lambda v, x: model.apply(v, x)[..., 0])

    key = jax.random.key(0)
    x, y = genesis_batch(key, imgs)

    def mse(a, b):
        return float(jnp.mean((a - b) ** 2))

    def row(xd, yd):
        r = {
            "identity": round(mse(xd, yd), 4),
            "gauss_s1": round(mse(_gauss(xd, 1.0), yd), 4),
            "mean5": round(mse(_mean_filter(xd, 5), yd), 4),
        }
        if model_fwd is not None:
            r["trained_model"] = round(mse(model_fwd(variables, xd), yd), 4)
        return r

    report = {"corpus": data_dir, "n": int(imgs.shape[0]),
              "model": model_path, "full_chain": row(x, y)}
    # per-distortion identity MSE: which distortion carries the objective
    for tag, rates in (
        ("shuffle_only", dict(flip_rate=0.0, local_rate=1.0,
                              nonlinear_rate=0.0, paint_rate=0.0)),
        ("nonlinear_only", dict(flip_rate=0.0, local_rate=0.0,
                                nonlinear_rate=1.0, paint_rate=0.0)),
        ("paint_only", dict(flip_rate=0.0, local_rate=0.0,
                            nonlinear_rate=0.0, paint_rate=1.0)),
    ):
        xd, yd = genesis_batch(jax.random.key(1), imgs, **rates)
        report[tag] = row(xd, yd)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
