"""Evaluation entry point: metrics for a checkpointed model on the test split.

`python -m cmx.cli.evaluate --encoder results/... [data.ratio=0.01]`

Extras:
  --probe [hidden_dim]  SSLEvaluator-style probe on frozen GAP features
                        (0 = linear; reference MLP default 512,
                        pl_bolts evaluator.py:10-26)
  --vis CKPT_DIR        SparK reconstruction triplet from a pretrain
                        checkpoint dir (spark.py:125-129 vis mode)
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import jax
import jax.numpy as jnp

from cmx.config.config import Config, apply_overrides
from cmx.utils.seeding import seed_everything


def main(argv: Optional[list] = None) -> None:
    from cmx.utils.compile_cache import enable_default_cache

    enable_default_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--encoder", default=None, help="encoder.npz to load")
    p.add_argument("--probe", nargs="?", const=512, default=None, type=int,
                   metavar="HIDDEN",
                   help="probe frozen GAP features (0=linear, default 512=MLP)")
    p.add_argument("--vis", default=None, metavar="CKPT_DIR",
                   help="save a SparK reconstruction triplet from this "
                        "pretrain checkpoint dir")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    cfg = Config()
    apply_overrides(cfg, args.overrides)
    seed_everything(cfg.train.seed)

    import os

    from cmx.data.corpus import load_corpus
    from cmx.data.splits import list_corpus, make_splits
    from cmx.data.synthetic import write_corpus
    from cmx.models.unet import UNet
    from cmx.train.harness import evaluate
    from cmx.train.supervised import make_eval_fn

    if cfg.data.synthetic or not os.path.isdir(os.path.join(cfg.data.data_dir, "imgs")):
        write_corpus(cfg.data.data_dir, n=cfg.data.synthetic_n, size=cfg.data.image_size)
    xs, ys = list_corpus(cfg.data.data_dir)
    splits = make_splits(xs, ys, ratio=cfg.data.ratio)
    te_imgs, te_masks = load_corpus(splits.test_x, splits.test_y, size=cfg.data.image_size)

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    model = UNet(out_classes=cfg.model.out_classes, dtype=dtype)
    variables = model.init(jax.random.key(cfg.train.seed), jnp.asarray(te_imgs[:1]))
    params, bs = variables["params"], variables["batch_stats"]
    if args.encoder:
        from cmx.ckpt.checkpoint import load_encoder

        params, bs = load_encoder(args.encoder, params, bs)

    class _S:  # minimal state view for evaluate()
        pass

    state = _S()
    state.params, state.batch_stats = params, bs
    eval_fn = make_eval_fn(model)
    metrics = evaluate(eval_fn, state, te_imgs, te_masks)

    if args.probe is not None:
        # Probe on FROZEN encoder features (pl_bolts SSLEvaluator analog).
        from cmx.models.unet import UNetEncoderGAP
        from cmx.ssl.linear_probe import extract_features, fg_fraction_labels, probe

        gap = UNetEncoderGAP(dtype=dtype, use_running_average=True)
        gv = gap.init(jax.random.key(0), jnp.asarray(te_imgs[:1]))
        gp, gbs = gv["params"], gv["batch_stats"]
        if args.encoder:
            from cmx.ckpt.checkpoint import load_encoder

            gp, gbs = load_encoder(args.encoder, gp, gbs)
        feats = extract_features(gp, gbs, te_imgs, model=gap)
        labels = fg_fraction_labels(te_masks)
        hidden = args.probe if args.probe > 0 else None
        res = probe(feats, labels, hidden_dim=hidden)
        metrics.update({f"probe_{k}": v for k, v in res.items()})

    if args.vis:
        import numpy as np

        from cmx.ckpt.checkpoint import load_model_npz
        from cmx.eval.visualize import save_reconstruction_triplet
        from cmx.ops.masking import spark_active_mask
        from cmx.ssl.spark import SparKModel, spark_reconstruct

        smodel = SparKModel(dtype=dtype)
        f = cfg.data.image_size // 16
        a0 = spark_active_mask(jax.random.key(1), 1, f, smodel.mask_ratio)
        sv = smodel.init(jax.random.key(0), jnp.asarray(te_imgs[:1]), a0)
        model_npz = os.path.join(args.vis, "model.npz")
        sparams, sbs = load_model_npz(model_npz, sv["params"], sv["batch_stats"])
        n_vis = min(4, te_imgs.shape[0])
        active = spark_active_mask(
            jax.random.key(cfg.train.seed), n_vis, f, smodel.mask_ratio
        )
        inp, masked, rec = spark_reconstruct(
            smodel, sparams, sbs, jnp.asarray(te_imgs[:n_vis]), active,
        )
        out_png = os.path.join(args.vis, "reconstruction.png")
        try:
            save_reconstruction_triplet(inp, masked, rec, out_png)
            metrics["vis_path"] = out_png
        except ImportError:
            out_npz = os.path.join(args.vis, "reconstruction.npz")
            np.savez(out_npz, input=np.asarray(inp), masked=np.asarray(masked),
                     reconstruction=np.asarray(rec))
            metrics["vis_path"] = out_npz

    print(json.dumps({k: (round(float(v), 4) if not isinstance(v, str) else v)
                      for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
