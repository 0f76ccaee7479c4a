#!/bin/bash
# Round-2 extras, run after runs_round2_tail.sh (or interleaved at a phase
# boundary). Value order:
#   E1  mae_tuned (= the round-5 ablation winner r75, mask ratio 0.75)
#       fine-tuned at the four remaining splits -> a full tuned-MAE row of
#       the transfer matrix (the reference-faithful mae row stays as-is).
#       Reuses the already-pretrained runs/mae_r4/enc/mae_r75 encoder.
#   E2  seed-1 replication of the headline 79/1-analog column (fresh corpus
#       seed 1, re-pretrain all five regimes, fine-tune all six) -> checks
#       the "CM-UNet strongest at the hardest split" claim isn't a
#       single-seed accident.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
A=artifacts/r2
MAE_T=runs/mae_r4/enc/mae_r75/encoder.npz

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

# ---- E1. tuned-MAE row (r75 encoder at the other four splits) ----
retry_tpu $R/ft05_mae_r75.log python -m cmx.cli.finetune -p $MAE_T \
  --out $R/ft05 --batches 8 -- data.data_dir=runs/hard400 data.ratio=0.05
harvest $R/ft05 ft05
retry_tpu $R/ft10_mae_r75.log python -m cmx.cli.finetune -p $MAE_T \
  --out $R/ft10 --batches 16 -- data.data_dir=runs/hard400 data.ratio=0.1
harvest $R/ft10 ft10
retry_tpu $R/ft20_mae_r75.log python -m cmx.cli.finetune -p $MAE_T \
  --out $R/ft20 --batches 32 -- data.data_dir=runs/hard400 data.ratio=0.2
harvest $R/ft20 ft20
retry_tpu $R/ft30_mae_r75.log python -m cmx.cli.finetune -p $MAE_T \
  --out $R/ft30 --batches 32 -- data.data_dir=runs/hard400 data.ratio=0.3
harvest $R/ft30 ft30
echo EXTRA_E1_DONE

# ---- E2. seed-1 replication of the 79/1-analog column ----
S=runs/seed1
mkdir -p $S
python - <<'EOF'
from cmx.data.synthetic import write_corpus
write_corpus("runs/hard400_s1", n=400, size=256, seed=1, hard=True)
print("seed-1 corpus done")
EOF
COMMON="data.data_dir=runs/hard400_s1 data.ratio=0.01 train.ckpt_dir=$S/ckpt"
FT1="data.data_dir=runs/hard400_s1 data.ratio=0.01"
pretrain_task () {
  local t=$1; shift
  wait_tpu
  if ! timeout 10800 python -m cmx.cli.pretrain --task $t --preset $COMMON \
      train.resume=False "$@" >> $S/pretrain_$t.log 2>&1; then
    retry_tpu $S/pretrain_$t.log python -m cmx.cli.pretrain --task $t \
      --preset $COMMON train.resume=True "$@" || return 1
  fi
}
pretrain_task spark train.epochs=800 train.batch_size=64 task.pallas_loss=False
pretrain_task mae train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None
pretrain_task cmunet train.epochs=400 train.batch_size=64
pretrain_task moco train.epochs=400 train.batch_size=64 task.num_negatives=4096
pretrain_task genesis train.epochs=400 train.batch_size=64
echo EXTRA_E2_PRETRAIN_DONE
retry_tpu $S/ft_scratch.log python -m cmx.cli.finetune --out $S/ft --batches 4 -- $FT1
harvest $S/ft seed1_ft01
for t in cmunet spark genesis moco mae; do
  retry_tpu $S/ft_$t.log python -m cmx.cli.finetune -p $S/ckpt/$t/encoder.npz \
    --out $S/ft --batches 4 -- $FT1
  harvest $S/ft seed1_ft01
done
echo EXTRA_E2_DONE

# E3 (moco shear3 pretrain + ft01) was dropped: the on-TPU rotation A/B
# (runs/r4/moco_flat_rot.log) showed shear3 is SLOWER than the flat-take
# nearest gather (390 vs 328 ms/batch) with 29% pixel deviation, so there
# is no flip decision left to validate — nearest stays the default.
echo ROUND2_EXTRA_DONE
