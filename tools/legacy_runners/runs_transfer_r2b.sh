#!/bin/bash
# Transfer experiment phase 2: the remaining regimes (moco, genesis) on the
# same hard synthetic corpus + 79/1-analog split as runs_transfer_r2.sh,
# completing the scratch-vs-all-5-regimes table (BASELINE.md 79/1 column).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
COMMON="data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$R/ckpt train.resume=False"

python -m cmx.cli.pretrain --task moco --preset $COMMON \
  train.epochs=400 train.batch_size=64 task.num_negatives=4096 \
  > $R/pretrain_moco.log 2>&1
python -m cmx.cli.pretrain --task genesis --preset $COMMON \
  train.epochs=400 train.batch_size=64 \
  > $R/pretrain_genesis.log 2>&1

FT="data.data_dir=runs/hard400 data.ratio=0.01"
for t in moco genesis; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft --batches 4 -- $FT \
    > $R/ft_$t.log 2>&1
  python -m cmx.cli.evaluate --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT \
    > $R/probe_$t.log 2>&1
done
echo PHASE2_DONE
