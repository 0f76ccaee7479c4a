#!/bin/bash
# Round-2 session-3 queue: another container reset wiped runs/ mid-way through
# runs_round2_session2.sh (its section A logs were harvested; ML/C/P/D were
# not). This runner executes the still-missing pieces in VALUE order, so an
# early cutoff loses the least:
#   0    corpora: seed-0 runs/hard400 + seed-1 runs/hard400_s1
#   A2   rot2 re-measure AFTER the Precision.HIGHEST conv-shear fix (completes
#        the truncated session-2 RESULTS section: mismatch should drop from
#        0.8774 to the 0.2911 index-rounding floor, timing re-captured).
#   P    seed-1 pretrains (5 regimes, recipe = runs_round2_extra.sh E2).
#   D    seed-1 ft30 column (6 regimes) -> artifacts/r2/seed1_ft30/ — tests
#        that the WIDEST split is seed-stable (complement of E2's "79/1 is
#        seed noise" finding).
#   ML/C moco_linear ft30 control + shear3 transfer equivalence (lowest
#        priority; only if time remains).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
A=artifacts/r2
mkdir -p runs/r4 $A

wait_tpu () {
  local n=0
  while true; do
    timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0
" && return 0
    n=$((n + 1)); echo "TPU unavailable (attempt $n); sleeping 120s"; sleep 120
  done
}
retry_tpu () {
  local log=$1; shift
  local i
  for i in 1 2 3; do
    wait_tpu
    timeout 7200 "$@" >> "$log" 2>&1 && return 0
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

# ---- 0. corpora ----
python - <<'EOF'
from cmx.data.synthetic import write_corpus
write_corpus("runs/hard400", n=400, size=256, seed=0, hard=True)
write_corpus("runs/hard400_s1", n=400, size=256, seed=1, hard=True)
print("corpora done")
EOF
echo SESSION3_0_DONE

# ---- A2. rot2 re-measure post Precision.HIGHEST fix ----
retry_tpu runs/r4/moco_aug3_rot2.log python -u tools/ab_moco_aug.py rot2
cp runs/r4/moco_aug3_rot2.log $A/ 2>/dev/null
echo SESSION3_A2_DONE

# ---- P. seed-1 pretrains (recipe = runs_round2_extra.sh E2) ----
S=runs/seed1
mkdir -p $S
COMMON="data.data_dir=runs/hard400_s1 data.ratio=0.01 train.ckpt_dir=$S/ckpt"
pretrain_task () {
  local t=$1; shift
  wait_tpu
  if ! timeout 7200 python -m cmx.cli.pretrain --task $t --preset $COMMON \
      train.resume=False "$@" >> $S/pretrain_$t.log 2>&1; then
    retry_tpu $S/pretrain_$t.log python -m cmx.cli.pretrain --task $t \
      --preset $COMMON train.resume=True "$@" || return 1
  fi
}
pretrain_task cmunet train.epochs=400 train.batch_size=64
pretrain_task moco train.epochs=400 train.batch_size=64 task.num_negatives=4096
pretrain_task spark train.epochs=800 train.batch_size=64 task.pallas_loss=False
pretrain_task genesis train.epochs=400 train.batch_size=64
pretrain_task mae train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None
echo SESSION3_P_DONE

# ---- D. seed-1 ft30 column (scratch first: needs no encoder) ----
FT30="data.data_dir=runs/hard400_s1 data.ratio=0.3"
retry_tpu $S/ft30_scratch.log python -m cmx.cli.finetune --out $S/ft30 --batches 32 -- $FT30
harvest $S/ft30 seed1_ft30
for t in cmunet moco spark genesis mae; do
  retry_tpu $S/ft30_$t.log python -m cmx.cli.finetune -p $S/ckpt/$t/encoder.npz \
    --out $S/ft30 --batches 32 -- $FT30
  harvest $S/ft30 seed1_ft30
done
echo SESSION3_D_DONE

# ---- ML. moco_linear encoder + ft30 control ----
ML=runs/moco_linear
mkdir -p $ML
retry_tpu $ML/pretrain.log python -m cmx.cli.pretrain --task moco --preset \
  data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$ML/ckpt \
  train.resume=False train.epochs=400 train.batch_size=64 \
  task.num_negatives=4096
mkdir -p $ML/enc/moco_linear
cp $ML/ckpt/moco/encoder.npz $ML/enc/moco_linear/encoder.npz
retry_tpu $ML/ft30.log python -m cmx.cli.finetune \
  -p $ML/enc/moco_linear/encoder.npz \
  --out $ML/ft30 --batches 32 -- data.data_dir=runs/hard400 data.ratio=0.3
harvest $ML/ft30 moco_linear_ft30
echo SESSION3_ML_DONE

# ---- C. shear3 rotation transfer equivalence ----
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
echo SESSION3_C_DONE
echo ROUND2_SESSION3_DONE
