#!/bin/bash
# Round-4 master runner: survives axon-tunnel outages (observed 2026-08-17,
# ~19:30 onward) and executes everything the outage interrupted, in order:
#   1. MAE transfer ablation (VERDICT item 3) — runs_mae_r4.sh design,
#      m50 resumes from its step-304 checkpoint
#   2. transfer-matrix fill (VERDICT item 6) — ft30 genesis/moco/mae +
#      ft10 all six (runs_transfer_r4.sh design)
#   3. space-to-depth L1 timing A/B (VERDICT item 1c)
#   4. bench.py / --all / --live refresh
# Every TPU workload is preceded by wait_tpu (bounded probe: a half-dead
# tunnel HANGS jax init rather than raising) and retried; pretrain retries
# flip to train.resume=True so completed epochs are never repaid.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
M=runs/mae_r4
R=runs/transfer_r2
mkdir -p $M/enc runs/r4

wait_tpu () {
  local n=0
  while true; do
    timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0
print('TPU OK', jax.devices())
" && return 0
    n=$((n + 1))
    echo "TPU unavailable (attempt $n); sleeping 180s"
    sleep 180
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

FT="data.data_dir=runs/hard400 data.ratio=0.01"
BASE="--task mae --preset data.data_dir=runs/hard400 data.ratio=0.01
      train.epochs=400 train.batch_size=64
      optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None"

mae_variant () {  # name, first_resume, extra overrides...
  local name=$1 resume=$2; shift 2
  # first attempt honors $resume; any retry resumes
  wait_tpu
  if ! timeout 10800 python -m cmx.cli.pretrain $BASE train.resume=$resume \
      train.ckpt_dir=$M/ckpt_$name "$@" >> $M/pretrain_$name.log 2>&1; then
    retry_tpu $M/pretrain_$name.log python -m cmx.cli.pretrain $BASE \
      train.resume=True train.ckpt_dir=$M/ckpt_$name "$@" || return 1
  fi
  mkdir -p $M/enc/mae_$name
  cp $M/ckpt_$name/mae/encoder.npz $M/enc/mae_$name/encoder.npz || return 1
  retry_tpu $M/ft_$name.log python -m cmx.cli.finetune \
    -p $M/enc/mae_$name/encoder.npz --out $M/ft --batches 4 -- $FT
}

# ---- 1. MAE ablation ----
mae_variant m50 True task.masked_loss_only=True
mae_variant r75 False task.mask_ratio=0.75
mae_variant m75 False task.masked_loss_only=True task.mask_ratio=0.75
mae_variant full400 False train.patience=0
echo MAE_R4_DONE

# ---- 2. transfer-matrix fill ----
FT30="data.data_dir=runs/hard400 data.ratio=0.3"
for t in genesis moco mae; do
  retry_tpu $R/ft30_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft30 --batches 32 -- $FT30
done
FT10="data.data_dir=runs/hard400 data.ratio=0.1"
retry_tpu $R/ft10_scratch.log python -m cmx.cli.finetune --out $R/ft10 \
  --batches 16 -- $FT10
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft10_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft10 --batches 16 -- $FT10
done
echo TRANSFER_R4_DONE

# ---- 3. space-to-depth A/B ----
retry_tpu runs/r4/ab_s2d.log python tools/ab_s2d.py --time
echo S2D_DONE

# ---- 4. bench refresh ----
wait_tpu
python bench.py > runs/r4/bench.json 2> runs/r4/bench.err
wait_tpu
python bench.py --all > runs/r4/bench_all.json 2> runs/r4/bench_all.err
wait_tpu
python bench.py --live --batch 128 > runs/r4/bench_live.json 2> runs/r4/bench_live.err
echo RUNNER_R4_DONE
