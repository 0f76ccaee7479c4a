"""Regression net for the transfer-matrix regeneration contract.

The committed claim (CURRENT.md "Transfer science") is that
`python tools/summarize_transfer.py` regenerates the full 6-method x
5-column matrix — including the n-seed means, the encoder-pool
provenance header, and the n-gated Spearman line — from the
git-tracked artifacts alone (artifacts/r2..r5), with no dependence on
the reset-mortal runs/ tree. This test pins that contract plus the
headline anchor values quoted in README/CURRENT; when a new cell lands
and a mean moves, update the anchors here together with the docs.

Mirrors the reference's result-tabulation step (the pickle grids under
Finetuning/models_checkpoints/PT-FT_split_experiments/ read back by
Finetuning/train.py:424-426), which has no such regression net.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def matrix_output():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "summarize_transfer.py")],
        cwd=REPO, capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_matrix_regenerates_all_rows(matrix_output):
    # 6 shipped methods + the 3 tuned/protocol rows, every one present.
    for row in ("scratch", "cmunet", "spark", "genesis", "moco", "mae",
                "genesis_tuned", "mae_r75", "moco_pool30"):
        assert f"| {row} |" in matrix_output, f"matrix row missing: {row}"


def test_provenance_header_discloses_pool_asymmetry(matrix_output):
    # Round-5 item 1: the header must disclose that legacy wide/middle
    # cells reuse 79%-pool encoders and point at the honest-protocol row.
    assert "encoder-pool provenance" in matrix_output
    assert "79% pool" in matrix_output
    assert "moco_pool30" in matrix_output


def test_headline_anchor_cells(matrix_output):
    # Anchors quoted in README/CURRENT; artifacts are git-tracked, so
    # these are deterministic. Update together with the docs.
    anchors = [
        "0.5682",  # moco 79/1 n=3 mean (tops the column)
        "0.7583",  # moco 50/30 n=3 mean
        "0.5097",  # scratch 79/1 n=3 mean
        "0.7516",  # moco_pool30 50/30 n=2 mean (honest disjoint pool)
        "0.5390",  # genesis_tuned 79/1 n=3 mean
    ]
    for a in anchors:
        assert a in matrix_output, f"anchor mean missing from matrix: {a}"


def test_spearman_line_is_n_gated(matrix_output):
    # Only replicated (n>=2) columns enter the rank-correlation line;
    # single-seed columns are explicitly suppressed as noise.
    assert "79/1: +0.49" in matrix_output
    assert "70/10: +0.54" in matrix_output
    assert "50/30: +0.20" in matrix_output
    suppressed = [
        ln for ln in matrix_output.splitlines()
        if "suppressed" in ln and "75/5" in ln and "60/20" in ln
    ]
    assert suppressed, "n=1 columns must be listed as Spearman-suppressed"


def test_runs_tree_not_required(matrix_output):
    # The reset-proofing contract: nothing above may have come from a
    # live runs/ tree (this container's runs/ was wiped; keep it that
    # way for this assertion when a runs/transfer_r2 root exists by
    # checking the matrix cites n-seed means that only exist layered
    # across artifacts/r2..r5).
    assert "[3]" in matrix_output and "[2]" in matrix_output
