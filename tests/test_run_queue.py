"""tools/run_queue.py: resumable artifact-keyed experiment queue.

The round-2 VERDICT (item 7) asked for one parameterized runner with an
artifact-keyed manifest replacing the per-reset session shell scripts. These
tests pin the contract: satisfied jobs skip, pending jobs run and are checked
against their artifacts, retries switch to retry_cmd, post steps harvest,
and --status never executes anything."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "run_queue.py")


def run_queue(manifest_path, *extra):
    return subprocess.run(
        [sys.executable, TOOL, str(manifest_path), *extra],
        capture_output=True, text=True)


def write_manifest(path, jobs):
    with open(path, "w") as f:
        json.dump(jobs, f)


def test_satisfied_jobs_skip_and_pending_run(tmp_path):
    art1 = tmp_path / "a.txt"
    art1.write_text("done")
    art2 = tmp_path / "b.txt"
    marker = tmp_path / "ran_first.txt"
    jobs = [
        {"name": "first", "artifacts": [str(art1)],
         "cmd": f"touch {marker}"},
        {"name": "second", "artifacts": [str(art2)],
         "cmd": f"echo out > {art2}"},
    ]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m)
    assert r.returncode == 0, r.stdout + r.stderr
    assert not marker.exists()  # satisfied job must not run
    assert art2.exists()
    # second invocation: everything satisfied, nothing runs
    r2 = run_queue(m)
    assert r2.returncode == 0
    assert "all jobs satisfied" in r2.stdout


def test_missing_artifact_after_success_fails(tmp_path):
    jobs = [{"name": "liar", "artifacts": [str(tmp_path / "never.txt")],
             "cmd": "true", "retries": 1}]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m)
    assert r.returncode == 1
    assert "artifacts missing" in r.stdout


def test_retry_uses_retry_cmd(tmp_path):
    art = tmp_path / "out.txt"
    count = tmp_path / "count.txt"
    jobs = [{
        "name": "flaky",
        "artifacts": [str(art)],
        # first attempt fails; retry_cmd succeeds and writes the artifact
        "cmd": f"echo 1 >> {count}; false",
        "retry_cmd": f"echo retry >> {count}; echo ok > {art}",
        "retries": 3,
        "log": str(tmp_path / "flaky.log"),
    }]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m)
    assert r.returncode == 0, r.stdout
    assert art.read_text().strip() == "ok"
    lines = count.read_text().strip().split("\n")
    assert lines == ["1", "retry"]
    log = (tmp_path / "flaky.log").read_text()
    assert "attempt 1" in log and "attempt 2" in log


def test_post_step_harvests(tmp_path):
    src = tmp_path / "src.txt"
    dst = tmp_path / "harvest" / "dst.txt"
    jobs = [{
        "name": "harvested",
        "artifacts": [str(dst)],
        "cmd": f"echo data > {src}",
        "post": f"mkdir -p {dst.parent} && cp {src} {dst}",
    }]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m)
    assert r.returncode == 0, r.stdout
    assert dst.read_text().strip() == "data"


def test_status_runs_nothing(tmp_path):
    marker = tmp_path / "marker.txt"
    jobs = [{"name": "pending", "artifacts": [str(tmp_path / "x")],
             "cmd": f"touch {marker}"}]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m, "--status")
    assert r.returncode == 0
    assert "pending" in r.stdout
    assert not marker.exists()


def test_only_filter_and_stop_on_failure(tmp_path):
    ran_b = tmp_path / "b_ran.txt"
    jobs = [
        {"name": "a", "artifacts": [str(tmp_path / "a.out")],
         "cmd": "false", "retries": 1},
        {"name": "b", "artifacts": [str(ran_b)], "cmd": f"touch {ran_b}"},
    ]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    # default: stop at failed job a; b never runs
    r = run_queue(m)
    assert r.returncode == 1
    assert not ran_b.exists()
    # --only b: run just b
    r2 = run_queue(m, "--only", "b")
    assert r2.returncode == 0
    assert ran_b.exists()


def test_keep_going_runs_rest(tmp_path):
    ran_b = tmp_path / "b_ran.txt"
    jobs = [
        {"name": "a", "artifacts": [str(tmp_path / "a.out")],
         "cmd": "false", "retries": 1},
        {"name": "b", "artifacts": [str(ran_b)], "cmd": f"touch {ran_b}"},
    ]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m, "--keep-going")
    assert r.returncode == 1  # failure still reported
    assert ran_b.exists()  # but b ran


def stamp_manifest(tmp_path):
    """A pretrain-shaped producer keyed on a reset-proof stamp plus a
    fine-tune-shaped consumer: the round-4 VERDICT item-3 topology. The
    'runs' dir plays the reset-mortal tree, 'artifacts' the git-tracked
    one."""
    runs = tmp_path / "runs"
    arts = tmp_path / "artifacts"
    enc = runs / "ckpt" / "encoder.npz"
    stamp = arts / "stamps" / "pretrain.stamp.json"
    count = tmp_path / "pretrain_count.txt"
    jobs = [
        {"name": "pretrain",
         "artifacts": [str(stamp)],
         "products": [str(enc)],
         "cmd": (f"mkdir -p {enc.parent} {stamp.parent} && "
                 f"echo weights > {enc} && echo stamp > {stamp} && "
                 f"echo 1 >> {count}")},
        {"name": "finetune",
         "needs": [str(enc)],
         "artifacts": [str(arts / "test.json")],
         "cmd": f"cp {enc} {arts / 'test.json'}"},
    ]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    return m, enc, stamp, count, arts


def test_needs_rebuilds_missing_producer(tmp_path):
    """Simulated container reset: delete runs/, relaunch -> the queue
    re-runs exactly the producer whose product a pending job needs."""
    import shutil
    m, enc, stamp, count, arts = stamp_manifest(tmp_path)
    r = run_queue(m)
    assert r.returncode == 0, r.stdout + r.stderr
    assert enc.exists() and stamp.exists()
    assert count.read_text().strip() == "1"

    # reset: runs/ wiped, artifacts/ (stamp + finetune result) survive
    shutil.rmtree(tmp_path / "runs")
    # everything satisfied -> nothing re-runs, even though the product is gone
    r2 = run_queue(m)
    assert r2.returncode == 0
    assert "all jobs satisfied" in r2.stdout
    assert not enc.exists()
    assert count.read_text().strip() == "1"
    # --status discloses the wiped product
    rs = run_queue(m, "--status")
    assert "products missing" in rs.stdout

    # a NEW dependent job appears (the round-5 pattern: later cells reuse
    # the encoder): its missing need re-runs the pretrain first
    jobs = json.load(open(m))
    jobs.append({"name": "finetune2", "needs": [str(enc)],
                 "artifacts": [str(arts / "test2.json")],
                 "cmd": f"cp {enc} {arts / 'test2.json'}"})
    write_manifest(m, jobs)
    r3 = run_queue(m)
    assert r3.returncode == 0, r3.stdout + r3.stderr
    assert "rebuilding via pretrain" in r3.stdout
    assert enc.exists()
    assert count.read_text().strip().split("\n") == ["1", "1"]
    assert (arts / "test2.json").exists()
    # finetune (already satisfied) did NOT re-run: test.json still original
    assert (arts / "test.json").read_text() == (arts / "test2.json").read_text()


def test_need_without_producer_fails_loudly(tmp_path):
    jobs = [{"name": "orphan", "needs": [str(tmp_path / "nowhere.npz")],
             "artifacts": [str(tmp_path / "out.txt")],
             "cmd": "true", "retries": 1}]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    r = run_queue(m)
    assert r.returncode == 1
    assert "no job in the manifest products it" in r.stdout


def test_pretrain_writes_stamp(tmp_path):
    """cmx.cli.pretrain exports encoder.npz.stamp.json with config, corpus
    identity, and a correct content hash (round-4 VERDICT item 3)."""
    import hashlib
    import subprocess as sp

    ck = tmp_path / "ck"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = sp.run(
        [sys.executable, "-m", "cmx.cli.pretrain", "--task", "genesis",
         f"data.data_dir={tmp_path / 'corp'}", "data.synthetic_n=4",
         "data.image_size=32", "data.ratio=0.25", "train.epochs=1",
         "train.batch_size=2", f"train.ckpt_dir={ck}",
         "train.save_every_epoch=False", "train.tensorboard=False",
         "model.dtype=float32"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    enc = ck / "genesis" / "encoder.npz"
    stamp_path = ck / "genesis" / "encoder.npz.stamp.json"
    assert enc.exists() and stamp_path.exists()
    stamp = json.load(open(stamp_path))
    assert stamp["task"] == "genesis"
    assert stamp["config"]["data"]["synthetic_n"] == 4
    assert stamp["n_pretrain_images"] == 2  # 4 imgs: 1 test, 1 ft, 2 pool
    assert stamp["epochs_run"] == 1
    digest = hashlib.sha256(enc.read_bytes()).hexdigest()
    assert stamp["encoder_sha256"] == digest
    assert stamp["corpus_meta"] is not None


def test_resolve_corpus_seed_axis(tmp_path, monkeypatch):
    """data.corpus_seed resolves dir -> dir_sN and seeds generation
    (round-2 VERDICT item 8)."""
    from cmx.config.config import Config
    from cmx.data.synthetic import resolve_corpus

    cfg = Config()
    cfg.data.data_dir = str(tmp_path / "corp")
    cfg.data.synthetic_n = 4
    cfg.data.image_size = 32
    d0 = resolve_corpus(cfg.data)
    assert d0 == cfg.data.data_dir
    assert len(os.listdir(os.path.join(d0, "imgs"))) == 4

    cfg.data.corpus_seed = 1
    d1 = resolve_corpus(cfg.data)
    assert d1 == cfg.data.data_dir + "_s1"
    import numpy as np
    a = np.load(os.path.join(d0, "imgs", "sample_0000.npy"))
    b = np.load(os.path.join(d1, "imgs", "sample_0000.npy"))
    assert a.shape == b.shape == (32, 32)
    assert not np.allclose(a, b)  # different corpus seed => different data

    # idempotent-by-absence: re-resolve does not rewrite
    t0 = os.path.getmtime(os.path.join(d1, "imgs", "sample_0000.npy"))
    resolve_corpus(cfg.data)
    assert os.path.getmtime(os.path.join(d1, "imgs", "sample_0000.npy")) == t0


def test_corpus_meta_guard(tmp_path):
    """Round-3 advisor: a corpus generated with different (n, size, hard,
    seed) at the same path must fail loudly, not silently serve wrong
    data; a meta-less legacy corpus is accepted as-is."""
    import numpy as np
    import pytest

    from cmx.config.config import Config
    from cmx.data.synthetic import resolve_corpus

    cfg = Config()
    cfg.data.data_dir = str(tmp_path / "corp")
    cfg.data.synthetic_n = 4
    cfg.data.image_size = 32
    d = resolve_corpus(cfg.data)
    assert os.path.isfile(os.path.join(d, "meta.json"))

    # same config re-resolves fine
    resolve_corpus(cfg.data)
    # differing generation parameters fail loudly
    cfg.data.synthetic_hard = True
    with pytest.raises(RuntimeError, match="different parameters"):
        resolve_corpus(cfg.data)
    cfg.data.synthetic_hard = False
    cfg.data.synthetic_n = 8
    with pytest.raises(RuntimeError, match="different parameters"):
        resolve_corpus(cfg.data)

    # legacy corpus without meta.json: accepted unchanged
    os.remove(os.path.join(d, "meta.json"))
    assert resolve_corpus(cfg.data) == d

    # a half-published corpus (imgs/ without masks/ cannot happen with the
    # imgs-last publish order, but masks/ alone must trigger regeneration)
    import shutil
    d2 = str(tmp_path / "half")
    cfg2 = Config()
    cfg2.data.data_dir = d2
    cfg2.data.synthetic_n = 4
    cfg2.data.image_size = 32
    resolve_corpus(cfg2.data)
    shutil.rmtree(os.path.join(d2, "imgs"))
    resolve_corpus(cfg2.data)  # regenerates
    assert len(os.listdir(os.path.join(d2, "imgs"))) == 4


def test_concurrent_queue_lock(tmp_path):
    """A second queue on the same manifest exits immediately with the lock
    message instead of racing (round-3 incident: two instances double-
    booked the TPU and one read a half-generated corpus)."""
    import subprocess as sp
    art = tmp_path / "slow.out"
    jobs = [{"name": "slow", "artifacts": [str(art)],
             "cmd": f"sleep 3 && echo ok > {art}"}]
    m = tmp_path / "m.json"
    write_manifest(m, jobs)
    p1 = sp.Popen([sys.executable, TOOL, str(m)], stdout=sp.PIPE, text=True)
    import time
    time.sleep(1.0)
    r2 = run_queue(m)
    assert r2.returncode == 1
    assert "lock held" in r2.stdout
    assert p1.wait(timeout=30) == 0
    assert art.read_text().strip() == "ok"
