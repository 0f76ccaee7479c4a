#!/bin/bash
# Round-4 transfer-matrix completion, part 2: the reference ships 6 methods
# x 5 splits (Finetuning/models_checkpoints/PT-FT_split_experiments, 30
# pickles; splits 79/1, 75/5, 70/10, 60/20, 50/30). After runs_transfer_r4
# cmx covers the 79/1- (ratio .01), 70/10- (.1) and 50/30- (.3) analogs;
# this adds the remaining two columns so EVERY reference column has a cmx
# analog (ratio = reference ft%/100):
#   * ALL SIX at ratio .05 (75/5-analog, 20 ft images, batch 8)
#   * ALL SIX at ratio .2  (60/20-analog, 80 ft images, batch 32)
# Same documented shortcut as r4: reuses the phase-1 encoders from
# runs/transfer_r2/ckpt.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2

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
  for i in 1 2 3 4; do
    wait_tpu
    timeout 10800 "$@" >> "$log" 2>&1 && return 0
    echo "attempt $i failed: $*" | tee -a "$log"
  done
  return 1
}

FT05="data.data_dir=runs/hard400 data.ratio=0.05"
retry_tpu $R/ft05_scratch.log python -m cmx.cli.finetune --out $R/ft05 --batches 8 -- $FT05
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft05_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft05 --batches 8 -- $FT05
done

FT20="data.data_dir=runs/hard400 data.ratio=0.2"
retry_tpu $R/ft20_scratch.log python -m cmx.cli.finetune --out $R/ft20 --batches 32 -- $FT20
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft20_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft20 --batches 32 -- $FT20
done
echo TRANSFER_R5_DONE
