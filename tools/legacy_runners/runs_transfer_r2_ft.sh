#!/bin/bash
# Transfer experiment, fine-tune phase (pretrains already in
# runs/transfer_r2/ckpt). Rerun of the ft legs with the scan-compiled
# harness, plus the phase-2 regimes (moco, genesis).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
FT="data.data_dir=runs/hard400 data.ratio=0.01"
COMMON="data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$R/ckpt train.resume=False"

python -m cmx.cli.finetune --out $R/ft --batches 4 -- $FT > $R/ft_scratch.log 2>&1
for t in spark mae cmunet; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft --batches 4 -- $FT \
    > $R/ft_$t.log 2>&1
done
for t in spark mae cmunet; do
  python -m cmx.cli.evaluate --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT \
    > $R/probe_$t.log 2>&1
done
python -m cmx.cli.evaluate --probe 512 -- $FT > $R/probe_scratch.log 2>&1

# phase 2: remaining regimes
python -m cmx.cli.pretrain --task moco --preset $COMMON \
  train.epochs=400 train.batch_size=64 task.num_negatives=4096 \
  > $R/pretrain_moco.log 2>&1
python -m cmx.cli.pretrain --task genesis --preset $COMMON \
  train.epochs=400 train.batch_size=64 \
  > $R/pretrain_genesis.log 2>&1
for t in moco genesis; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft --batches 4 -- $FT \
    > $R/ft_$t.log 2>&1
  python -m cmx.cli.evaluate --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT \
    > $R/probe_$t.log 2>&1
done
echo FT_ALL_DONE
