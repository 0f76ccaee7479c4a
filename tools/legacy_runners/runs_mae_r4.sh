#!/bin/bash
# Round-4 MAE transfer ablation (VERDICT item 3): make MAE >= scratch on the
# hard-synthetic 79/1-analog, mirroring the reference where MAE (0.5566)
# beats scratch (0.3761) on FAME2 (BASELINE.md 79/1 column; masking at
# Transformation_based/utils.py:169-207, full-image MSE at
# Genesis_Chest_CT.py:122-125).
#
# Controlled variants vs round-3's negative-transfer config (full-image MSE,
# ratio .5, per-sample masks, patience-50 early stop -> Dice 0.4297 vs
# scratch 0.4752):
#   m50   masked-patch-only loss, ratio .5
#   r75   full-image MSE, ratio .75 (harder inpainting task)
#   m75   masked-only loss, ratio .75
#   full400  reference loss/ratio, NO early stop (round 3 stopped at ep 298)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
M=runs/mae_r4
mkdir -p $M/enc
FT="data.data_dir=runs/hard400 data.ratio=0.01"
BASE="--task mae --preset data.data_dir=runs/hard400 data.ratio=0.01
      train.resume=False train.epochs=400 train.batch_size=64
      optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None"

run_variant () {  # name, extra overrides...
  name=$1; shift
  python -m cmx.cli.pretrain $BASE train.ckpt_dir=$M/ckpt_$name "$@" \
    > $M/pretrain_$name.log 2>&1
  mkdir -p $M/enc/mae_$name
  cp $M/ckpt_$name/mae/encoder.npz $M/enc/mae_$name/encoder.npz
  python -m cmx.cli.finetune -p $M/enc/mae_$name/encoder.npz \
    --out $M/ft --batches 4 -- $FT > $M/ft_$name.log 2>&1
}

run_variant m50 task.masked_loss_only=True
run_variant r75 task.mask_ratio=0.75
run_variant m75 task.masked_loss_only=True task.mask_ratio=0.75
run_variant full400 train.patience=0

echo MAE_R4_DONE
