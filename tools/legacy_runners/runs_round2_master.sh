#!/bin/bash
# Driver-round-2 master runner. The previous session's experiments (MAE
# ablation, transfer-matrix fill, s2d timing) were lost to a container
# reset before their results were recorded — this re-runs EVERYTHING, in
# value order, and copies every small result artifact into the git-tracked
# artifacts/r2/ tree as each phase lands so nothing can be lost again.
#
# Phases (each ends with a PHASE_*_DONE marker on stdout):
#   0  corpus (host, deterministic seed 0)
#   1  space-to-depth timing A/B (VERDICT item 1c)
#   2  pretrains: spark/mae/cmunet/moco/genesis (same cmds as rounds 2-3)
#   3  MAE transfer ablation m50/r75/m75/full400 (VERDICT item 3)
#   4  ft10: all six at the 70/10-analog (VERDICT item 6)
#   5  ft30: genesis/moco/mae complete the 50/30 column (item 6)
#   6  ft01: all six at the 79/1-analog (artifact re-capture)
#   7  ft05 + ft20: remaining matrix columns (75/5-, 60/20-analogs)
#   8  ft30: scratch/cmunet/spark re-capture
#   9  probes + bench refresh
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
M=runs/mae_r4
A=artifacts/r2
mkdir -p $R $M/enc $A runs/r4

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
# retry_tpu <logfile> <cmd...> — up to 4 attempts, wait_tpu between
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
# harvest <src_ft_dir> <dst_name> — copy small result artifacts
harvest () {
  mkdir -p $A/$2
  cp $1/test_*.json $A/$2/ 2>/dev/null
  cp $1/result_finetuning_unet_*.pkl $A/$2/ 2>/dev/null
  true
}

# ---- 0. corpus ----
python - <<'EOF'
from cmx.data.synthetic import write_corpus
write_corpus("runs/hard400", n=400, size=256, seed=0, hard=True)
print("corpus done")
EOF
echo PHASE_0_DONE

# ---- 1. s2d timing A/B ----
retry_tpu runs/r4/ab_s2d.log python tools/ab_s2d.py --time
cp runs/r4/ab_s2d.log $A/ 2>/dev/null
echo PHASE_1_DONE

# ---- 2. pretrains ----
COMMON="data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$R/ckpt"
pretrain_task () {  # task, extra overrides...
  local t=$1; shift
  # first attempt fresh, retries resume
  wait_tpu
  if ! timeout 10800 python -m cmx.cli.pretrain --task $t --preset $COMMON \
      train.resume=False "$@" >> $R/pretrain_$t.log 2>&1; then
    retry_tpu $R/pretrain_$t.log python -m cmx.cli.pretrain --task $t \
      --preset $COMMON train.resume=True "$@" || return 1
  fi
  mkdir -p $A/enc
  cp $R/ckpt/$t/encoder.npz $A/enc/$t.npz 2>/dev/null
  tail -5 $R/pretrain_$t.log > $A/pretrain_$t.tail
}
pretrain_task spark train.epochs=800 train.batch_size=64 task.pallas_loss=False
pretrain_task mae train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None
pretrain_task cmunet train.epochs=400 train.batch_size=64
pretrain_task moco train.epochs=400 train.batch_size=64 task.num_negatives=4096
pretrain_task genesis train.epochs=400 train.batch_size=64
echo PHASE_2_DONE

# ---- 3. MAE ablation ----
FT="data.data_dir=runs/hard400 data.ratio=0.01"
BASE="--task mae --preset data.data_dir=runs/hard400 data.ratio=0.01
      train.epochs=400 train.batch_size=64
      optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None"
mae_variant () {  # name, extra overrides...
  local name=$1; shift
  wait_tpu
  if ! timeout 10800 python -m cmx.cli.pretrain $BASE train.resume=False \
      train.ckpt_dir=$M/ckpt_$name "$@" >> $M/pretrain_$name.log 2>&1; then
    retry_tpu $M/pretrain_$name.log python -m cmx.cli.pretrain $BASE \
      train.resume=True train.ckpt_dir=$M/ckpt_$name "$@" || return 1
  fi
  mkdir -p $M/enc/mae_$name
  cp $M/ckpt_$name/mae/encoder.npz $M/enc/mae_$name/encoder.npz || return 1
  tail -5 $M/pretrain_$name.log > $A/mae_pretrain_$name.tail
  retry_tpu $M/ft_$name.log python -m cmx.cli.finetune \
    -p $M/enc/mae_$name/encoder.npz --out $M/ft --batches 4 -- $FT
  harvest $M/ft mae_ablation
}
mae_variant m50 task.masked_loss_only=True
mae_variant r75 task.mask_ratio=0.75
mae_variant m75 task.masked_loss_only=True task.mask_ratio=0.75
mae_variant full400 train.patience=0
echo PHASE_3_DONE

# ---- 4. ft10 (70/10-analog, all six) ----
FT10="data.data_dir=runs/hard400 data.ratio=0.1"
retry_tpu $R/ft10_scratch.log python -m cmx.cli.finetune --out $R/ft10 --batches 16 -- $FT10
harvest $R/ft10 ft10
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft10_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft10 --batches 16 -- $FT10
  harvest $R/ft10 ft10
done
echo PHASE_4_DONE

# ---- 5. ft30 completion (genesis/moco/mae) ----
FT30="data.data_dir=runs/hard400 data.ratio=0.3"
for t in genesis moco mae; do
  retry_tpu $R/ft30_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft30 --batches 32 -- $FT30
  harvest $R/ft30 ft30
done
echo PHASE_5_DONE

# ---- 6. ft01 re-capture (all six) ----
retry_tpu $R/ft_scratch.log python -m cmx.cli.finetune --out $R/ft --batches 4 -- $FT
harvest $R/ft ft01
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft --batches 4 -- $FT
  harvest $R/ft ft01
done
echo PHASE_6_DONE

# ---- 7. ft05 + ft20 ----
FT05="data.data_dir=runs/hard400 data.ratio=0.05"
retry_tpu $R/ft05_scratch.log python -m cmx.cli.finetune --out $R/ft05 --batches 8 -- $FT05
harvest $R/ft05 ft05
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft05_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft05 --batches 8 -- $FT05
  harvest $R/ft05 ft05
done
FT20="data.data_dir=runs/hard400 data.ratio=0.2"
retry_tpu $R/ft20_scratch.log python -m cmx.cli.finetune --out $R/ft20 --batches 32 -- $FT20
harvest $R/ft20 ft20
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft20_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft20 --batches 32 -- $FT20
  harvest $R/ft20 ft20
done
echo PHASE_7_DONE

# ---- 8. ft30 re-capture (scratch/cmunet/spark) ----
retry_tpu $R/ft30_scratch.log python -m cmx.cli.finetune --out $R/ft30 --batches 32 -- $FT30
for t in cmunet spark; do
  retry_tpu $R/ft30_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft30 --batches 32 -- $FT30
done
harvest $R/ft30 ft30
echo PHASE_8_DONE

# ---- 9. probes + bench refresh ----
for t in spark mae cmunet moco genesis; do
  retry_tpu $R/probe_$t.log python -m cmx.cli.evaluate \
    --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT
done
retry_tpu $R/probe_scratch.log python -m cmx.cli.evaluate --probe 512 -- $FT
cp $R/probe_*.log $A/ 2>/dev/null
wait_tpu
python bench.py > runs/r4/bench.json 2> runs/r4/bench.err
wait_tpu
python bench.py --all > runs/r4/bench_all.json 2> runs/r4/bench_all.err
wait_tpu
python bench.py --live --batch 128 > runs/r4/bench_live.json 2> runs/r4/bench_live.err
wait_tpu
python bench.py --live --batch 64 > runs/r4/bench_live_b64.json 2> runs/r4/bench_live_b64.err
cp runs/r4/bench*.json $A/ 2>/dev/null
echo PHASE_9_DONE
echo ROUND2_MASTER_DONE
