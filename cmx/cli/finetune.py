"""Supervised fine-tuning entry point (Finetuning/train.py's surface).

`python -m cmx.cli.finetune [--pretrained ckpt/spark/encoder.npz]
    [data.ratio=0.01] [train.epochs=128] ...`

Reproduces the reference flow (train.py:429-471): seed-42 splits, optional
pretrained-encoder load, grid search with KFold, final test retrain + eval.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmx.config.config import Config, apply_overrides, display
from cmx.utils.seeding import seed_everything


def main(argv: Optional[list] = None) -> None:
    from cmx.utils.compile_cache import enable_default_cache

    enable_default_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained", "-p", default=None,
                   help="encoder.npz exported by a pretraining run")
    p.add_argument("--lrs", type=float, nargs="*", default=[1e-2, 1e-3, 1e-4, 1e-5])
    p.add_argument("--epochs", type=int, nargs="*", default=[128])
    p.add_argument("--batches", type=int, nargs="*", default=[32])
    p.add_argument("--out", default="results")
    p.add_argument("--corpus-seed", type=int, default=None,
                   help="corpus-seed axis: sugar for data.corpus_seed=N "
                        "(resolves data_dir -> data_dir_sN, seeds synthetic "
                        "generation)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    cfg = Config()
    apply_overrides(cfg, args.overrides)
    if args.corpus_seed is not None:
        cfg.data.corpus_seed = args.corpus_seed
    print(display(cfg))
    seed_everything(cfg.train.seed)

    from cmx.data.corpus import load_corpus
    from cmx.data.splits import list_corpus, make_splits
    from cmx.data.synthetic import resolve_corpus
    from cmx.models.unet import UNet
    from cmx.train.harness import evaluate, fit, grid_search
    from cmx.train.supervised import make_eval_fn

    xs, ys = list_corpus(resolve_corpus(cfg.data))
    splits = make_splits(xs, ys, ratio=cfg.data.ratio)
    ft_imgs, ft_masks = load_corpus(splits.finetune_x, splits.finetune_y,
                                    size=cfg.data.image_size)
    te_imgs, te_masks = load_corpus(splits.test_x, splits.test_y,
                                    size=cfg.data.image_size)

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    model = UNet(out_classes=cfg.model.out_classes,
                 up_sample_mode=cfg.model.up_sample_mode, dtype=dtype,
                 fused=cfg.model.fused_conv)
    init_variables = model.init(jax.random.key(cfg.train.seed),
                                jnp.asarray(ft_imgs[:1]))
    if args.pretrained:
        from cmx.ckpt.checkpoint import load_encoder

        params, bs = load_encoder(args.pretrained, init_variables["params"],
                                  init_variables["batch_stats"])
        init_variables = {"params": params, "batch_stats": bs}
        print(f"loaded pretrained encoder from {args.pretrained}")

    os.makedirs(args.out, exist_ok=True)
    tag = "None"
    if args.pretrained:
        tag = os.path.basename(args.pretrained).split(".")[0]
        if tag in ("encoder", "model"):  # generic export name: use the
            # checkpoint dir (the task name) so results don't collide
            tag = os.path.basename(os.path.dirname(os.path.abspath(args.pretrained))) or tag
    lr, bs_, eps, results = grid_search(
        ft_imgs, ft_masks,
        lrs=args.lrs, epochs_grid=args.epochs, batches=args.batches,
        seed=cfg.train.seed, model=model, init_variables=init_variables,
        results_path=os.path.join(args.out, f"result_finetuning_unet_{tag}.pkl"),
    )
    print(f"best hypers: lr={lr} batch={bs_} epochs={eps}")

    # Final: retrain on the whole fine-tune set, evaluate on held-out test
    # (the reference test(), train.py:380-426).
    res = fit(ft_imgs, ft_masks, te_imgs, te_masks, lr=lr, epochs=eps,
              batch=bs_, seed=cfg.train.seed, model=model,
              init_variables=init_variables, verbose=True)
    eval_fn = make_eval_fn(model)
    test_metrics = evaluate(eval_fn, res.state, te_imgs, te_masks, batch=bs_)
    print("test:", {k: round(v, 4) for k, v in test_metrics.items()})
    with open(os.path.join(args.out, f"test_{tag}.json"), "w") as f:
        json.dump({"hypers": {"lr": lr, "batch": bs_, "epochs": eps},
                   "test_metrics": test_metrics,
                   "dice": 1.0 - test_metrics["dice_loss"]}, f, indent=2)


if __name__ == "__main__":
    main()
