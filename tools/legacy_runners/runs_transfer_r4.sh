#!/bin/bash
# Round-4 transfer-matrix fill (VERDICT item 6): the reference ships 6
# methods x 5 splits (Finetuning/models_checkpoints/PT-FT_split_experiments,
# 30 pickles). cmx round 3 covered all 6 at the 79/1-analog (ratio .01) and
# scratch/CM-UNet/SparK at the 50/30-analog (ratio .3). This adds:
#   * genesis / moco / mae at ratio .3  (completes the wide column)
#   * ALL SIX at ratio .1 (70/10-analog middle column)
# Reuses the phase-1 encoders from runs/transfer_r2/ckpt (pretrain pool
# differs only by the images moved into the fine-tune split — the same
# documented shortcut as the round-3 wide run).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2

# -- wide column completion (ratio .3 -> 120 ft images)
FT30="data.data_dir=runs/hard400 data.ratio=0.3"
for t in genesis moco mae; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft30 --batches 32 -- $FT30 \
    > $R/ft30_$t.log 2>&1
done

# -- middle column (ratio .1 -> 40 ft images, 70/10-analog)
FT10="data.data_dir=runs/hard400 data.ratio=0.1"
python -m cmx.cli.finetune --out $R/ft10 --batches 16 -- $FT10 > $R/ft10_scratch.log 2>&1
for t in cmunet spark genesis moco mae; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft10 --batches 16 -- $FT10 \
    > $R/ft10_$t.log 2>&1
done

echo TRANSFER_R4_DONE
