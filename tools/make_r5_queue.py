"""Generate tools/r5_queue.json — the round-5 experiment program.

Priority-ordered so that stopping the queue at any point leaves complete
deliverables (VERDICT round 4 "Next round"):

  1. Item 1 — close the wide-split protocol hole: MoCo pretrained on the
     DISJOINT ratio-0.3 pool (200 imgs, no overlap with the 30% fine-tune
     set) for the two tight-margin seeds (1, 2), fine-tuned at 50/30.
     Matrix row `moco_pool30` vs the same-seed `moco` cells isolates the
     79%-pool transductive advantage. Reference protocol being matched:
     the ratio-dependent pretrain splits (Pretraining/Spark/main.py:52-68,
     Genesis_Chest_CT.py:26-29) vs the CM-UNet superset quirk
     (cmunet_dataset.py:31-32).
  2. Item 4b — mae_tuned (matrix tag mae_r75) to n=3 at 79/1: re-pretrain
     with the exact seed-0 r75 protocol (runs_mae_r4.sh) on seeds 1, 2.
  3. Item 4a — genesis_tuned 50/30 cells for seeds 0, 1 (protocol of the
     r4b/r4c seed-2 pair: gt pretrain at ratio 0.01, ft at ratio 0.3).
  4. Item 5 — the 70/10 column at n=2: rebuild the five wiped seed-2
     default encoders (r4 protocols, bit-identical commands) and run the
     six-cell ft10 column.

Every pretrain keys its queue artifact on the git-tracked provenance
stamp (artifacts/r5/stamps/) and declares its runs/-resident encoder as a
`products` entry, so post-reset relaunches rebuild exactly the encoders
that later jobs `need` (tools/run_queue.py stamp-keyed rebuild).
"""

import json
import os

DATA = "data.data_dir=runs/hard400 data.synthetic_hard=True data.synthetic_n=400"


def seed_args(seed):
    return f"data.corpus_seed={seed} " if seed else ""


def pretrain_job(name, task_cli, seed, ckpt_root, enc_path, stamp, extra,
                 task_subdir=None, timeout=14400):
    """One stamp-keyed pretrain job. task_subdir: the ckpt subdir the CLI
    writes (cfg.task.name after preset resolution, e.g. genesis_tuned ->
    genesis)."""
    sub = task_subdir or task_cli
    src = f"{ckpt_root}/{sub}/encoder.npz"
    base = (f"python -m cmx.cli.pretrain --task {task_cli} --preset "
            f"{seed_args(seed)}{DATA} train.ckpt_dir={ckpt_root} "
            f"train.batch_size=64 {extra}")
    post = (f"mkdir -p {os.path.dirname(enc_path)} artifacts/r5/stamps && "
            f"cp {src} {enc_path} && "
            f"cp {src}.stamp.json artifacts/r5/stamps/{stamp}")
    if os.path.abspath(enc_path) == os.path.abspath(src):
        post = (f"mkdir -p artifacts/r5/stamps && "
                f"cp {src}.stamp.json artifacts/r5/stamps/{stamp}")
    return {
        "name": name,
        "artifacts": [f"artifacts/r5/stamps/{stamp}"],
        "products": [enc_path],
        "cmd": base + " train.resume=False",
        "retry_cmd": base + " train.resume=True",
        "post": post,
        "log": f"runs/r5/logs/{name}.log",
        "timeout": timeout,
        "tpu": True,
    }


def ft_job(name, seed, ratio, enc_path, tag, batches, art_dir):
    """One fine-tune job producing the matrix cell artifacts."""
    out = f"runs/r5/seed{seed}/ft{int(ratio * 100):02d}"
    pre = f"-p {enc_path} " if enc_path else ""
    needs = [enc_path] if enc_path else []
    return {
        "name": name,
        "artifacts": [f"artifacts/r5/{art_dir}/test_{tag}.json"],
        **({"needs": needs} if needs else {}),
        "cmd": (f"python -m cmx.cli.finetune {pre}--out {out} "
                f"--batches {batches} -- {seed_args(seed)}{DATA} "
                f"data.ratio={ratio}"),
        "post": (f"mkdir -p artifacts/r5/{art_dir} && "
                 f"cp {out}/test_{tag}.json "
                 f"{out}/result_finetuning_unet_{tag}.pkl "
                 f"artifacts/r5/{art_dir}/"),
        "log": f"runs/r5/logs/{name}.log",
        "timeout": 10800,
        "tpu": True,
    }


jobs = []

# ---- Item 1: moco on the disjoint ratio-0.3 pool, seeds 1+2, ft30 ----
for s in (1, 2):
    enc = f"runs/r5/seed{s}/enc/moco_pool30/encoder.npz"
    jobs.append(pretrain_job(
        f"pool30-moco-s{s}-pretrain", "moco", s,
        f"runs/r5/seed{s}/ckpt_pool30", enc, f"moco_pool30_s{s}.stamp.json",
        "data.ratio=0.3 train.epochs=400 task.num_negatives=4096"))
    jobs.append(ft_job(f"pool30-moco-s{s}-ft30", s, 0.3, enc,
                       "moco_pool30", 32, f"seed{s}_ft30"))

# ---- Item 4b: mae_r75 (mae_tuned protocol) seeds 1+2, ft01 ----
for s in (1, 2):
    enc = f"runs/r5/seed{s}/enc/mae_r75/encoder.npz"
    jobs.append(pretrain_job(
        f"mae75-s{s}-pretrain", "mae", s,
        f"runs/r5/seed{s}/ckpt_mae75", enc, f"mae_r75_s{s}.stamp.json",
        "data.ratio=0.01 train.epochs=400 task.mask_ratio=0.75 "
        "optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 "
        "optim.clip_norm=None"))
    jobs.append(ft_job(f"mae75-s{s}-ft01", s, 0.01, enc,
                       "mae_r75", 4, f"seed{s}_ft01"))

# ---- Item 4a: genesis_tuned 50/30 for seeds 0+1 ----
for s in (0, 1):
    enc = f"runs/r5/seed{s}/enc/genesis_tuned/encoder.npz"
    jobs.append(pretrain_job(
        f"gt-s{s}-pretrain", "genesis_tuned", s,
        f"runs/r5/seed{s}/ckpt_gt", enc, f"genesis_tuned_s{s}.stamp.json",
        "data.ratio=0.01 train.epochs=400", task_subdir="genesis"))
    jobs.append(ft_job(f"gt-s{s}-ft30", s, 0.3, enc, "genesis_tuned", 32,
                       f"seed{s}_ft30" if s else "ft30"))

# ---- Item 5: seed-2 70/10 column (rebuild the five wiped encoders) ----
S2 = "runs/r5/seed2/ckpt"
# moco first: it carries the headline claim, so if the round clock cuts
# the column short the most load-bearing cell is already in.
PROTO = {
    "moco": "data.ratio=0.01 train.epochs=400 task.num_negatives=4096",
    "spark": "data.ratio=0.01 train.epochs=800 task.pallas_loss=False",
    "genesis": "data.ratio=0.01 train.epochs=400",
    "mae": ("data.ratio=0.01 train.epochs=400 optim.name=sgd optim.lr=1e-2 "
            "optim.weight_decay=0.0 optim.clip_norm=None"),
    "cmunet": "data.ratio=0.01 train.epochs=400",
}
jobs.append(ft_job("s2-scratch-ft10", 2, 0.1, None, "None", 16, "seed2_ft10"))
for t, extra in PROTO.items():
    enc = f"{S2}/{t}/encoder.npz"
    jobs.append(pretrain_job(f"s2-pretrain10-{t}", t, 2, S2, enc,
                             f"{t}_s2.stamp.json", extra))
    jobs.append(ft_job(f"s2-{t}-ft10", 2, 0.1, enc, t, 16, "seed2_ft10"))

names = [j["name"] for j in jobs]
assert len(set(names)) == len(names)
out = os.path.join(os.path.dirname(__file__), "r5_queue.json")
with open(out, "w") as f:
    json.dump(jobs, f, indent=2)
print(f"wrote {out}: {len(jobs)} jobs")
for j in jobs:
    print(" ", j["name"])
