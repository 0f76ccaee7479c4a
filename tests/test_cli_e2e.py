"""CLI end-to-end: pretrain (tiny) -> resume -> export -> finetune load.

Runs the actual CLIs in-process on the CPU mesh with a tiny synthetic
corpus — the full user journey including checkpoint auto-resume (the
reference capability matrix, SURVEY §5 Checkpoint/resume)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_pretrain_resume_and_finetune(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from cmx.cli import finetune, pretrain

    common = [
        "data.synthetic=True", "data.synthetic_n=12", "data.image_size=32",
        "train.batch_size=8", "model.dtype=float32", "task.augment=False",
        "task.patch_size=16",
    ]

    # phase 1: 2 epochs, save every epoch
    pretrain.main(["--task", "mae", "train.epochs=2",
                   "train.save_every_epoch=True", *common])
    assert os.path.exists("checkpoints/mae/encoder.npz")
    log1 = open("checkpoints/mae/log.jsonl").read().strip().split("\n")
    assert len(log1) == 2

    # phase 2: resume=True continues to epoch 4 without retraining 0-1
    pretrain.main(["--task", "mae", "train.epochs=4", *common])
    log2 = open("checkpoints/mae/log.jsonl").read().strip().split("\n")
    epochs = [json.loads(l)["epoch"] for l in log2]
    assert epochs == [0, 1, 2, 3]

    # phase 3: finetune from the exported encoder
    finetune.main([
        "-p", "checkpoints/mae/encoder.npz",
        "--lrs", "0.001", "--epochs", "1", "--batches", "8",
        "--out", "results", "--",
        "data.synthetic=True", "data.synthetic_n=12", "data.image_size=32",
        "data.ratio=0.3", "model.dtype=float32",
    ])
    # the generic export name resolves to the task dir for the results tag
    out = json.load(open("results/test_mae.json"))
    assert "dice" in out and np.isfinite(out["dice"])


def test_evaluate_probe_and_vis(tmp_path, monkeypatch):
    """evaluate CLI extras: --probe (SSLEvaluator MLP on frozen features) and
    --vis (SparK reconstruction triplet from model.npz)."""
    monkeypatch.chdir(tmp_path)
    import io
    from contextlib import redirect_stdout

    from cmx.cli import evaluate, pretrain

    common = [
        "data.synthetic=True", "data.synthetic_n=12", "data.image_size=32",
        "train.batch_size=8", "model.dtype=float32", "task.augment=False",
    ]
    pretrain.main(["--task", "spark", "train.epochs=1", *common])
    assert os.path.exists("checkpoints/spark/model.npz")

    buf = io.StringIO()
    with redirect_stdout(buf):
        evaluate.main([
            "--encoder", "checkpoints/spark/encoder.npz",
            "--probe", "16",
            "--vis", "checkpoints/spark",
            "--",
            "data.synthetic=True", "data.synthetic_n=12",
            "data.image_size=32", "model.dtype=float32", "data.ratio=0.3",
        ])
    out = json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    assert "probe_test_acc" in out and np.isfinite(out["probe_test_acc"])
    assert "vis_path" in out and os.path.exists(out["vis_path"])
