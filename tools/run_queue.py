"""Resumable experiment queue — one manifest instead of per-reset shell scripts.

Round-2 VERDICT item 7: the five container resets each forced a hand-written
`runs_round2_session*.sh`, losing in-flight work and making "what ran last"
archaeology. This tool replaces that pattern: a JSON manifest of jobs, each
keyed by the artifact path(s) it must produce. Re-running after a reset skips
every satisfied job and resumes at the first unsatisfied one — zero new
scripts per reset. `--status` answers "what ran / what's pending" directly.

Manifest: a JSON list of job objects, executed in order:
  {
    "name": "seed1-pretrain-genesis",          # unique id
    "artifacts": ["runs/seed1/ckpt/genesis/encoder.npz"],  # all exist => skip
    "cmd": "python -m cmx.cli.pretrain --task genesis ...",# run via bash -c
    "retry_cmd": "... train.resume=True",      # optional: used on retries
                                               # (e.g. flip resume on)
    "log": "runs/seed1/pretrain_genesis.log",  # stdout+stderr appended here
    "timeout": 7200,                           # per-attempt seconds (def 7200)
    "retries": 3,                              # total attempts (default 3)
    "tpu": true,                               # probe the TPU before each try
    "post": "cp runs/.../test_*.json artifacts/..."  # optional harvest step,
                                               # runs after cmd succeeds
    "products": ["runs/seed1/ckpt/.../encoder.npz"],  # reset-mortal outputs
                                               # (checked after cmd, and
                                               # rebuildable on demand)
    "needs": ["runs/seed1/ckpt/.../encoder.npz"]  # inputs that must exist
                                               # before cmd runs; a missing
                                               # need re-runs its producer
  }

Stamp-keyed rebuild (round-4 VERDICT weak #3): pretrain jobs key their
`artifacts` on the git-tracked provenance stamp (harvested into artifacts/
by their post step) and declare the encoder under runs/ as a `products`
entry. A container reset wipes runs/ but not the stamp, so the pretrain
job stays satisfied and is skipped — UNTIL a later job `needs` the wiped
encoder, at which point the queue re-runs exactly the producer jobs whose
products are missing (recursively, with the producer's own needs checked
first). Deleting runs/ and relaunching therefore rebuilds exactly the
missing encoders (tests/test_run_queue.py::test_needs_rebuilds_missing_producer).

The TPU probe runs in a subprocess (a half-dead axon tunnel hangs backend
init inside a C call — not interruptible in-process; see bench._wait_backend)
and is CAPPED: after --tpu-tries failed probes (default 30 ~ 1 h) the queue
exits nonzero with a clear message, so a dead tunnel is distinguishable from
a slow one (round-2 advisor finding on wait_tpu's unbounded loop).

Usage:
  python tools/run_queue.py manifest.json            # run pending jobs
  python tools/run_queue.py manifest.json --status   # table only, no runs
  python tools/run_queue.py manifest.json --only a,b # restrict to named jobs
  python tools/run_queue.py manifest.json --keep-going  # don't stop at a
                                                     # failed job; run the rest
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENV_BIN = "/opt/venv/bin"

_PROBE = ("import jax, jax.numpy as jnp\n"
          "x = jnp.ones((256, 256))\n"
          "assert float((x @ x).sum()) > 0\n")


def _env():
    env = dict(os.environ)
    path = env.get("PATH", "")
    if VENV_BIN not in path.split(os.pathsep):
        env["PATH"] = VENV_BIN + os.pathsep + path
    env["PYTHONPATH"] = REPO + ":/root/.axon_site"
    return env


def wait_tpu(max_tries: int, sleep_s: int = 120, probe_timeout: int = 420) -> bool:
    python = os.path.join(VENV_BIN, "python")
    if not os.path.exists(python):
        python = sys.executable
    for attempt in range(1, max_tries + 1):
        try:
            subprocess.run([python, "-c", _PROBE], check=True, env=_env(),
                           timeout=probe_timeout, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return True
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
            print(f"[queue] TPU unavailable (probe {attempt}/{max_tries}); "
                  f"sleep {sleep_s}s", flush=True)
            if attempt < max_tries:
                time.sleep(sleep_s)
    return False


def satisfied(job) -> bool:
    arts = job.get("artifacts", [])
    return bool(arts) and all(os.path.exists(a) for a in arts)


def missing_products(job):
    return [p for p in job.get("products", []) if not os.path.exists(p)]


def ensure_needs(job, producers, tpu_tries, chain=()):
    """Make every path in job['needs'] exist, re-running producer jobs for
    the missing ones (the stamp-keyed rebuild path: a satisfied pretrain
    whose runs/-resident encoder was wiped by a container reset re-runs
    here when a dependent fine-tune needs it)."""
    for n in job.get("needs", []):
        if os.path.exists(n):
            continue
        prod = producers.get(n)
        if prod is None:
            print(f"[queue] {job['name']}: need {n!r} is missing and no job "
                  f"in the manifest products it", flush=True)
            return False
        if prod["name"] in chain:
            print(f"[queue] dependency cycle: {' -> '.join(chain)} -> "
                  f"{prod['name']}", flush=True)
            return False
        print(f"[queue] {job['name']}: need {n!r} missing -> rebuilding via "
              f"{prod['name']}", flush=True)
        if not ensure_needs(prod, producers, tpu_tries,
                            chain + (job["name"],)):
            return False
        if not run_job(prod, tpu_tries):
            return False
        if not os.path.exists(n):
            print(f"[queue] {prod['name']} ran but {n!r} still missing",
                  flush=True)
            return False
    return True


def run_job(job, tpu_tries: int) -> bool:
    name = job["name"]
    log = job.get("log")
    retries = int(job.get("retries", 3))
    timeout = int(job.get("timeout", 7200))
    if log:
        os.makedirs(os.path.dirname(log) or ".", exist_ok=True)
    for attempt in range(1, retries + 1):
        if job.get("tpu") and not wait_tpu(tpu_tries):
            print(f"[queue] FATAL: TPU still down after {tpu_tries} probes "
                  f"(job {name})", flush=True)
            return False
        cmd = job["cmd"] if attempt == 1 else job.get("retry_cmd", job["cmd"])
        print(f"[queue] {name}: attempt {attempt}/{retries}: {cmd}", flush=True)
        logf = open(log, "a") if log else None
        try:
            if logf:
                logf.write(f"\n=== [queue] {name} attempt {attempt} "
                           f"@ {time.strftime('%F %T')} ===\n$ {cmd}\n")
                logf.flush()
            r = subprocess.run(["bash", "-c", cmd], cwd=REPO, env=_env(),
                               timeout=timeout,
                               stdout=logf or None, stderr=subprocess.STDOUT
                               if logf else None)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
            print(f"[queue] {name}: attempt {attempt} timed out ({timeout}s)",
                  flush=True)
        finally:
            if logf:
                logf.close()
        if ok:
            post = job.get("post")
            if post:
                # bounded like the main cmd (round-3 advisor: an unbounded
                # post — a cp into a wedged mount, a post that launches a
                # TPU job — would stall the whole queue indefinitely)
                try:
                    pr = subprocess.run(["bash", "-c", post], cwd=REPO,
                                        env=_env(),
                                        timeout=min(timeout, 600))
                    post_ok = pr.returncode == 0
                except subprocess.TimeoutExpired:
                    post_ok = False
                    print(f"[queue] {name}: post step timed out", flush=True)
                if not post_ok:
                    print(f"[queue] {name}: post step failed", flush=True)
                    return False
            missing = [a for a in job.get("artifacts", [])
                       if not os.path.exists(a)] + missing_products(job)
            if missing:
                print(f"[queue] {name}: cmd succeeded but artifacts missing: "
                      f"{missing}", flush=True)
                return False
            print(f"[queue] {name}: DONE", flush=True)
            return True
        print(f"[queue] {name}: attempt {attempt} failed", flush=True)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest")
    ap.add_argument("--status", action="store_true",
                    help="print satisfied/pending table and exit")
    ap.add_argument("--only", default=None,
                    help="comma-separated job names to consider")
    ap.add_argument("--keep-going", action="store_true",
                    help="continue past a failed job instead of stopping")
    ap.add_argument("--tpu-tries", type=int, default=30,
                    help="max TPU probes per wait (~2 min each; default 30)")
    args = ap.parse_args()

    # One queue per manifest: two concurrent instances race on corpus
    # generation and double-book the TPU (observed round 3 — a backgrounded
    # compound launched a second copy; a finetune then read a half-written
    # corpus). flock is held for the process lifetime.
    import fcntl

    lock = open(args.manifest + ".lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        print(f"[queue] another queue already runs {args.manifest} "
              "(lock held); exiting", flush=True)
        return 1

    with open(args.manifest) as f:
        jobs = json.load(f)
    names = [j["name"] for j in jobs]
    assert len(set(names)) == len(names), "duplicate job names in manifest"
    for j in jobs:
        assert j.get("artifacts"), (
            f"job {j['name']!r} has no artifacts — it would re-run on every "
            "queue pass; give it a stamp file (post: touch ...)")
    all_jobs = jobs
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(names)
        assert not unknown, f"unknown job names: {sorted(unknown)}"
        jobs = [j for j in jobs if j["name"] in keep]

    # products -> producing job, over the FULL manifest (not the --only
    # subset) so a filtered run can still rebuild a wiped dependency.
    producers = {}
    for j in all_jobs:
        for p in j.get("products", []):
            assert p not in producers, (
                f"product {p!r} claimed by both {producers[p]['name']!r} "
                f"and {j['name']!r}")
            producers[p] = j

    width = max(len(j["name"]) for j in jobs) if jobs else 4
    print(f"[queue] manifest {args.manifest}: {len(jobs)} jobs")
    for j in jobs:
        state = "satisfied" if satisfied(j) else "pending"
        lost = missing_products(j) if state == "satisfied" else []
        if lost:
            state += f" (products missing: {len(lost)})"
        print(f"  {j['name']:<{width}}  {state}")
    if args.status:
        return 0

    failed = []
    for j in jobs:
        if satisfied(j):
            continue
        if not ensure_needs(j, producers, args.tpu_tries):
            failed.append(j["name"])
            if not args.keep_going:
                print(f"[queue] stopping at failed job {j['name']}", flush=True)
                return 1
            continue
        if not run_job(j, args.tpu_tries):
            failed.append(j["name"])
            if not args.keep_going:
                print(f"[queue] stopping at failed job {j['name']}", flush=True)
                return 1
    if failed:
        print(f"[queue] finished with failures: {failed}", flush=True)
        return 1
    print("[queue] all jobs satisfied", flush=True)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `--status | head`
        sys.exit(0)
