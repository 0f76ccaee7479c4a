"""REAL multi-process data-parallel feed: 2 jax processes x 2 CPU devices.

Verifies the fix for the round-1 finding that `shard_batch` used
jax.device_put with a global NamedSharding (which cannot assemble per-host
shards): under jax.distributed with world=2, each host feeds only its
rank-sliced shard and the compiled global-view loss must equal the
single-process loss over the concatenated global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import _mp_worker as W


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_feed_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "rank0.json"
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # No axon sitecustomize: plain CPU backend so env vars take effect in the
    # children. 2 local CPU devices per process -> 4 global.
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._mp_worker", str(rank), str(port),
             str(out)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(W.WORLD)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    got = json.loads(out.read_text())
    assert got["n_devices"] == 4 and got["local_devices"] == 2, got

    # single-process reference over the SAME global batch
    import jax
    import jax.numpy as jnp

    imgs = W.make_data()
    gb = W.global_batch_for_iter0(imgs)
    params = jax.tree.map(jnp.asarray, W.model_params())
    want = float(jax.jit(W.loss_fn)(params, jnp.asarray(gb)))
    assert got["loss"] == pytest.approx(want, rel=1e-6), (got["loss"], want)
