#!/bin/bash
# Round-4 MAE ablation, part b: restart after a remote-TPU outage killed the
# original runs_mae_r4.sh during variant m50 (epoch 82/400). m50 resumes from
# its best-val checkpoint; the other variants run fresh. Same design as
# runs_mae_r4.sh (VERDICT item 3).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
M=runs/mae_r4
mkdir -p $M/enc
FT="data.data_dir=runs/hard400 data.ratio=0.01"
BASE="--task mae --preset data.data_dir=runs/hard400 data.ratio=0.01
      train.epochs=400 train.batch_size=64
      optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None"

run_variant () {  # name, resume, extra overrides...
  name=$1; resume=$2; shift 2
  timeout 10800 python -m cmx.cli.pretrain $BASE train.resume=$resume \
    train.ckpt_dir=$M/ckpt_$name "$@" > $M/pretrain_$name.log 2>&1
  mkdir -p $M/enc/mae_$name
  cp $M/ckpt_$name/mae/encoder.npz $M/enc/mae_$name/encoder.npz || return 1
  timeout 10800 python -m cmx.cli.finetune -p $M/enc/mae_$name/encoder.npz \
    --out $M/ft --batches 4 -- $FT > $M/ft_$name.log 2>&1
}

run_variant m50 True task.masked_loss_only=True
run_variant r75 False task.mask_ratio=0.75
run_variant m75 False task.masked_loss_only=True task.mask_ratio=0.75
run_variant full400 False train.patience=0

echo MAE_R4B_DONE
