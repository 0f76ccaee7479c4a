"""Scan-compiled pretrain epochs == per-step host loop.

The pretrain CLI's scan path (cli/pretrain.py, train.scan=True) compiles
epoch segments as one lax.scan device program but draws batch indices from
the same InfiniteBatchSampler stream as the host loop — so params, logged
metrics, and exported weights must match the per-step path up to float
reassociation (XLA fuses differently across the scan boundary; measured
max param deviation 3e-11 after 2 fp32 epochs). The _fit_scan analog for
fine-tuning is covered by test_harness.py::test_scan_fit_segmentation_invariant.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _run(tmp_path, tag, extra):
    from cmx.cli import pretrain

    ckpt = str(tmp_path / tag)
    pretrain.main([
        "--task", "mae",
        "data.synthetic=True", "data.synthetic_n=12", "data.image_size=32",
        "train.batch_size=4", "train.epochs=2", "model.dtype=float32",
        "task.augment=False", "task.patch_size=16", "train.resume=False",
        # SGD: adam normalizes by sqrt(v), amplifying float-reassociation
        # noise ~1e-11 into ~1e-3-relative param deviations after a few
        # steps; SGD keeps updates proportional to the (matching) grads.
        "optim.name=sgd", "optim.lr=0.01",
        f"train.ckpt_dir={ckpt}", f"data.data_dir={tmp_path / 'data'}",
        *extra,
    ])
    model = dict(np.load(os.path.join(ckpt, "mae", "model.npz")))
    logs = [json.loads(l) for l in
            open(os.path.join(ckpt, "mae", "log.jsonl")).read().strip().split("\n")]
    return model, logs


def test_scan_epoch_matches_host_loop(tmp_path):
    # scan_budget=8 at batch 4 -> 2-step segments: exercises segmentation
    # (steps_per_epoch=3 -> segments of 2 and 1) plus the remainder compile.
    m_scan, l_scan = _run(tmp_path, "scan", ["train.scan=True",
                                             "train.scan_budget=8"])
    m_host, l_host = _run(tmp_path, "host", ["train.scan=False"])

    assert set(m_scan) == set(m_host)
    for k in m_scan:
        # scan and host-loop compile to DIFFERENT programs (scan body +
        # fused gather vs fetch + step), so every step injects fp32
        # fusion-reassociation noise ~1e-7 that the optimizer trajectory
        # amplifies over 2 epochs; measured final-state deviation is
        # ~5e-5 abs / up to 3% rel on near-zero batch-stat leaves. The
        # check is therefore a trajectory-closeness check, not bitwise:
        # identical batch sequence + equivalent math.
        np.testing.assert_allclose(m_scan[k], m_host[k], rtol=1e-3,
                                   atol=3e-4, err_msg=k)
    assert len(l_scan) == len(l_host)
    for a, b in zip(l_scan, l_host):
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-3, abs=1e-5)
