"""The driver invokes `python bench.py` / `python __graft_entry__.py` with
whatever interpreter its PATH resolves; after a container reset dropped
/opt/venv/bin from PATH that interpreter has no jax. Both entry scripts
re-exec themselves under /opt/venv/bin/python in that case (script execution
only). These tests pin the guard without touching a TPU: the argparse
surface of the re-exec'd process must come up."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENV = "/opt/venv/bin/python"
BARE = "/usr/local/bin/python"


def _bare_python_lacks_jax():
    if not (os.path.exists(VENV) and os.path.exists(BARE)):
        return False
    r = subprocess.run(
        [BARE, "-c", "import jax"], capture_output=True,
        env={**os.environ, "PYTHONPATH": ""},
    )
    return r.returncode != 0


@pytest.mark.skipif(
    not _bare_python_lacks_jax(),
    reason="needs a venv-less interpreter at /usr/local/bin/python",
)
def test_bench_reexecs_under_venv():
    r = subprocess.run(
        [BARE, os.path.join(REPO, "bench.py"), "--help"],
        capture_output=True, text=True, timeout=180,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr
    assert "usage: bench.py" in r.stdout


def test_graft_entry_import_does_not_reexec():
    # When IMPORTED by an interpreter without jax, the module must raise the
    # real ModuleNotFoundError, never execv (which would kill the importer).
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "try:\n"
        "    import __graft_entry__\n"
        "except ModuleNotFoundError:\n"
        "    print('RAISED')\n" % REPO
    )
    if not _bare_python_lacks_jax():
        pytest.skip("needs a venv-less interpreter")
    r = subprocess.run(
        [BARE, "-c", code], capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr
    assert "RAISED" in r.stdout
