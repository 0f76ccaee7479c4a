"""Tabulate the SSL transfer experiments (runs_transfer_r*.sh) for RESULTS.md.

Reads <dir>/test_*.json (+ probe logs if present) and prints a markdown
table: scratch vs each pretrained regime on the held-out test set.

Usage: python tools/summarize_transfer.py [results_dir_or_run_root ...]
  default: every ft* column under runs/transfer_r2 plus runs/mae_r4/ft.
A run root (containing an ft/ subdir) expands to its ft* subdirs.
"""

import glob
import json
import os
import re
import sys


def expand(arg):
    if glob.glob(os.path.join(arg, "test_*.json")):
        return [arg]
    return sorted(d for d in glob.glob(os.path.join(arg, "ft*"))
                  if os.path.isdir(d))


def summarize(ft_dir):
    R = os.path.dirname(ft_dir)
    print(f"\n## {ft_dir}")
    rows = []
    for path in sorted(glob.glob(os.path.join(ft_dir, "test_*.json"))):
        tag = os.path.basename(path)[5:-5]
        with open(path) as f:
            d = json.load(f)
        tm = d["test_metrics"]
        rows.append({
            "run": "scratch" if tag == "None" else tag,
            "dice": d["dice"],
            "dice_loss": tm.get("dice_loss"),
            "iou_loss": tm.get("iou_loss"),
            "cldice": tm.get("soft_clDice"),
            "hausdorff": tm.get("hausdorff"),
            "lr": d["hypers"]["lr"],
        })
    rows.sort(key=lambda r: (r["run"] != "scratch", -r["dice"]))

    probes = {}
    for path in sorted(glob.glob(os.path.join(R, "probe_*.log"))):
        tag = os.path.basename(path)[6:-4]
        txt = open(path).read()
        m = re.findall(r"probe.*?acc[^0-9]*([0-9.]+)", txt)
        if m:
            probes[tag] = float(m[-1])

    print("| run | test Dice | dice_loss | iou_loss | clDice loss | hausdorff | best lr | probe acc |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        p = probes.get(r["run"], "")
        def f(v):
            return f"{v:.4f}" if isinstance(v, float) else (v or "-")
        print(f"| {r['run']} | **{r['dice']:.4f}** | {f(r['dice_loss'])} | "
              f"{f(r['iou_loss'])} | {f(r['cldice'])} | {f(r['hausdorff'])} | "
              f"{r['lr']:g} | {p} |")

    scratch = next((r for r in rows if r["run"] == "scratch"), None)
    if scratch:
        winners = [r["run"] for r in rows
                   if r["run"] != "scratch" and r["dice"] > scratch["dice"]]
        print(f"\npretrained beating scratch ({scratch['dice']:.4f}): "
              f"{winners or 'NONE'}")


def main():
    args = sys.argv[1:] or ["runs/transfer_r2", "runs/mae_r4"]
    for arg in args:
        for ft_dir in expand(arg):
            summarize(ft_dir)


if __name__ == "__main__":
    main()
