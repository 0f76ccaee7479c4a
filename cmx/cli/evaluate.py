"""Evaluation entry point: metrics for a checkpointed model on the test split.

`python -m cmx.cli.evaluate --encoder results/... [data.ratio=0.01]`
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
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--encoder", default=None, help="encoder.npz to load")
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
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
