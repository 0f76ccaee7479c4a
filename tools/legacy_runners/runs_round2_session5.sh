#!/bin/bash
# Round-2 session-5 queue: session-4 died in a container reset mid-way through
# its P section (spark pretrain was running). Surviving state, verified at
# session start: runs/hard400 + runs/hard400_s1 corpora, seed-1 cmunet and
# moco pretrains (runs/seed1/ckpt/{cmunet,moco}/encoder.npz). Still missing:
#   P'   seed-1 spark / genesis / mae pretrains (spark ckpt dir exists but is
#        empty -> fresh start).
#   D    seed-1 ft30 column (6 regimes) -> artifacts/r2/seed1_ft30/
#   C    shear3 rotation transfer equivalence (post-fix exact shear body)
#        -> artifacts/r2/moco_shear3/
# Recipes unchanged from runs_round2_session4.sh.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
A=artifacts/r2
mkdir -p $A

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

# ---- P'. remaining seed-1 pretrains ----
S=runs/seed1
mkdir -p $S
COMMON="data.data_dir=runs/hard400_s1 data.ratio=0.01 train.ckpt_dir=$S/ckpt"
pretrain_task () {
  local t=$1; shift
  if [ -f $S/ckpt/$t/encoder.npz ]; then
    echo "skip $t: encoder already present"; return 0
  fi
  wait_tpu
  if ! timeout 7200 python -m cmx.cli.pretrain --task $t --preset $COMMON \
      train.resume=False "$@" >> $S/pretrain_$t.log 2>&1; then
    retry_tpu $S/pretrain_$t.log python -m cmx.cli.pretrain --task $t \
      --preset $COMMON train.resume=True "$@" || return 1
  fi
}
pretrain_task spark train.epochs=800 train.batch_size=64 task.pallas_loss=False
pretrain_task genesis train.epochs=400 train.batch_size=64
pretrain_task mae train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None
echo SESSION5_P_DONE

# ---- D. seed-1 ft30 column (scratch first: needs no encoder) ----
FT30="data.data_dir=runs/hard400_s1 data.ratio=0.3"
retry_tpu $S/ft30_scratch.log python -m cmx.cli.finetune --out $S/ft30 --batches 32 -- $FT30
harvest $S/ft30 seed1_ft30
for t in cmunet moco spark genesis mae; do
  retry_tpu $S/ft30_$t.log python -m cmx.cli.finetune -p $S/ckpt/$t/encoder.npz \
    --out $S/ft30 --batches 32 -- $FT30
  harvest $S/ft30 seed1_ft30
done
echo SESSION5_D_DONE

# ---- C. shear3 rotation transfer equivalence (post-fix exact shear body) ----
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
echo SESSION5_C_DONE
echo ROUND2_SESSION5_DONE
