#!/bin/bash
# Transfer experiment, 50/30-analog split (ratio=0.3 -> 200 pretrain /
# 120 fine-tune / 80 test on hard400): BASELINE.md's 50/30 column shows the
# SSL gains SHRINK as labeled data grows (CM-UNet +3.0 vs +25.1 at 79/1) —
# check the same qualitative behavior reproduces. Reuses the phase-1
# encoders (pretrain pool differs only by 116 images; documented shortcut).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
FT="data.data_dir=runs/hard400 data.ratio=0.3"

python -m cmx.cli.finetune --out $R/ft30 --batches 32 -- $FT > $R/ft30_scratch.log 2>&1
for t in cmunet spark; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft30 --batches 32 -- $FT \
    > $R/ft30_$t.log 2>&1
done
echo WIDE_DONE
