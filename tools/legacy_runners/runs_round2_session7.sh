#!/bin/bash
# Round-2 session-7 queue: a fifth container reset wiped runs/ (again) and
# this time also dropped /opt/venv/bin from PATH. Remaining cells from the
# session-6 queue, skip-guarded on the HARVESTED artifact (not the wiped
# runs/ tree), pipelined pretrain->finetune per regime so every completed
# pair survives the next reset:
#   0        corpora: seed-1 runs/hard400_s1 (+ seed-0 runs/hard400 for C)
#   P+D      seed-1 genesis -> ft30 cell; mae -> ft30 cell; spark -> ft30
#            cell (cmunet/moco/scratch cells already in artifacts/r2/seed1_ft30)
#   C        shear3 rotation transfer equivalence (post-fix exact
#            unrolled-shift shear body) -> artifacts/r2/moco_shear3/
set -x
export PATH=/opt/venv/bin:$PATH
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

# ---- 0. corpora ----
python - <<'EOF'
from cmx.data.synthetic import write_corpus
write_corpus("runs/hard400", n=400, size=256, seed=0, hard=True)
write_corpus("runs/hard400_s1", n=400, size=256, seed=1, hard=True)
print("corpora done")
EOF
echo SESSION7_0_DONE

S=runs/seed1
mkdir -p $S
COMMON="data.data_dir=runs/hard400_s1 data.ratio=0.01 train.ckpt_dir=$S/ckpt"
FT30="data.data_dir=runs/hard400_s1 data.ratio=0.3"

pretrain_task () {
  local t=$1; shift
  if [ -f $S/ckpt/$t/encoder.npz ]; then
    echo "skip pretrain $t: encoder already present"; return 0
  fi
  wait_tpu
  if ! timeout 7200 python -m cmx.cli.pretrain --task $t --preset $COMMON \
      train.resume=False "$@" >> $S/pretrain_$t.log 2>&1; then
    retry_tpu $S/pretrain_$t.log python -m cmx.cli.pretrain --task $t \
      --preset $COMMON train.resume=True "$@" || return 1
  fi
}
ft30_cell () {
  local t=$1
  if [ -f $A/seed1_ft30/test_$t.json ]; then
    echo "skip ft30 $t: cell already harvested"; return 0
  fi
  retry_tpu $S/ft30_$t.log python -m cmx.cli.finetune -p $S/ckpt/$t/encoder.npz \
    --out $S/ft30 --batches 32 -- $FT30
  harvest $S/ft30 seed1_ft30
}

# ---- P+D interleaved: each regime's cell lands before the next pretrain ----
pretrain_task genesis train.epochs=400 train.batch_size=64 && ft30_cell genesis
echo SESSION7_GENESIS_DONE
pretrain_task mae train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None \
  && ft30_cell mae
echo SESSION7_MAE_DONE
pretrain_task spark train.epochs=800 train.batch_size=64 task.pallas_loss=False \
  && ft30_cell spark
echo SESSION7_SPARK_DONE

# ---- C. shear3 rotation transfer equivalence (post-fix exact shear body) ----
MS=runs/moco_shear3
mkdir -p $MS
if [ ! -f $A/moco_shear3/test_moco_shear3.json ]; then
  wait_tpu
  if ! timeout 7200 python -m cmx.cli.pretrain --task moco --preset \
      data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$MS/ckpt \
      train.resume=False train.epochs=400 train.batch_size=64 \
      task.num_negatives=4096 task.rotation_method=shear3 >> $MS/pretrain.log 2>&1; then
    retry_tpu $MS/pretrain.log python -m cmx.cli.pretrain --task moco --preset \
      data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$MS/ckpt \
      train.resume=True train.epochs=400 train.batch_size=64 \
      task.num_negatives=4096 task.rotation_method=shear3
  fi
  mkdir -p $MS/enc/moco_shear3
  cp $MS/ckpt/moco/encoder.npz $MS/enc/moco_shear3/encoder.npz
  retry_tpu $MS/ft.log python -m cmx.cli.finetune -p $MS/enc/moco_shear3/encoder.npz \
    --out $MS/ft --batches 4 -- data.data_dir=runs/hard400 data.ratio=0.01
  harvest $MS/ft moco_shear3
fi
echo SESSION7_C_DONE
echo ROUND2_SESSION7_DONE
