#!/bin/bash
# Round-2 aug-perf queue (chains after runs_round2_resume.sh).
#
# Measures the two MoCo-augmentation reformulations (commit 1c1291e) and the
# transfer-equivalence evidence needed to decide the rotation default:
#   A  tools/ab_moco_aug.py crop2/rot2/view2 — on-TPU timing + numerics of
#      the einsum crop (exact) and the conv-shear shear3 rotation.
#   B  single-variable rotation experiment on the seed-0 corpus:
#      pretrain MoCo with task.rotation_method=shear3 (everything else =
#      the moco_linear recapture recipe), then fine-tune the 79/1 cell and
#      the seed-stable ft30 (50/30-analog) cell; plus the moco_linear
#      (nearest-rotation) ft30 control so shear3-vs-nearest compares at a
#      split where seed noise is small (RESULTS: 79/1 podium is seed noise).
# Default flips are decided manually from these logs, never in-script.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
A=artifacts/r2
mkdir -p runs/r4 $A

# Gate: wait for the resume queue to finish so the chip is never contended.
while ! grep -q ROUND2_RESUME_DONE runs_round2_resume.out 2>/dev/null; do
  sleep 120
done

wait_tpu () {
  local n=0
  while true; do
    timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0
" && return 0
    n=$((n + 1)); echo "TPU unavailable (attempt $n); sleeping 180s"; sleep 180
  done
}
retry_tpu () {
  local log=$1; shift
  local i
  for i in 1 2 3 4; do
    wait_tpu
    timeout 10800 "$@" >> "$log" 2>&1 && return 0
    echo "attempt $i failed: $*" | tee -a "$log"
  done
  return 1
}
harvest () {
  mkdir -p $A/$2
  cp $1/test_*.json $A/$2/ 2>/dev/null
  cp $1/result_finetuning_unet_*.pkl $A/$2/ 2>/dev/null
  true
}

# ---- A. formulation A/Bs ----
for sub in crop2 rot2 view2; do
  retry_tpu runs/r4/moco_aug2_$sub.log python -u tools/ab_moco_aug.py $sub
  cp runs/r4/moco_aug2_$sub.log $A/ 2>/dev/null
done
echo AUG_A_DONE

# ---- B. shear3 rotation transfer equivalence (seed-0 corpus) ----
MS=runs/moco_shear3
mkdir -p $MS
retry_tpu $MS/pretrain.log python -m cmx.cli.pretrain --task moco --preset \
  data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$MS/ckpt \
  train.resume=False train.epochs=400 train.batch_size=64 \
  task.num_negatives=4096 task.rotation_method=shear3
mkdir -p $MS/enc/moco_shear3
cp $MS/ckpt/moco/encoder.npz $MS/enc/moco_shear3/encoder.npz
retry_tpu $MS/ft.log python -m cmx.cli.finetune -p $MS/enc/moco_shear3/encoder.npz \
  --out $MS/ft --batches 4 -- data.data_dir=runs/hard400 data.ratio=0.01
harvest $MS/ft moco_shear3
retry_tpu $MS/ft30.log python -m cmx.cli.finetune -p $MS/enc/moco_shear3/encoder.npz \
  --out $MS/ft30 --batches 32 -- data.data_dir=runs/hard400 data.ratio=0.3
harvest $MS/ft30 moco_shear3_ft30
# nearest-rotation control at ft30 (same linear-crop encoder as the queue's
# moco_linear recapture) — single-variable comparison at the stable split.
retry_tpu runs/moco_linear/ft30.log python -m cmx.cli.finetune \
  -p runs/moco_linear/enc/moco_linear/encoder.npz \
  --out runs/moco_linear/ft30 --batches 32 -- data.data_dir=runs/hard400 data.ratio=0.3
harvest runs/moco_linear/ft30 moco_linear_ft30
echo AUG_B_DONE
echo ROUND2_AUG_DONE
