#!/bin/bash
# Round-2 final TPU queue (after extras E1/E2):
#   A  moco-linear recapture: re-pretrain the seed-0 MoCo encoder with the
#      reference-faithful BILINEAR crop (task.crop_method default flipped,
#      commit bcecd28) and recapture the 79/1 cell -> quantifies the fixed
#      deviation's effect on the committed matrix (captured with cubic).
#   B  bench refresh: BENCH_ALL regimes + headline, post rotation+crop work.
#   C  seed-1 ft30 column: all six regimes fine-tuned at the 50/30-analog on
#      the seed-1 corpus/encoders -> tests that the WIDEST split is
#      seed-stable (the complement of E2's "79/1 is seed noise" finding).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
A=artifacts/r2

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

# ---- A. moco-linear recapture ----
ML=runs/moco_linear
mkdir -p $ML
retry_tpu $ML/pretrain.log python -m cmx.cli.pretrain --task moco --preset \
  data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$ML/ckpt \
  train.resume=False train.epochs=400 train.batch_size=64 \
  task.num_negatives=4096
mkdir -p $ML/enc/moco_linear
cp $ML/ckpt/moco/encoder.npz $ML/enc/moco_linear/encoder.npz
retry_tpu $ML/ft.log python -m cmx.cli.finetune -p $ML/enc/moco_linear/encoder.npz \
  --out $ML/ft --batches 4 -- data.data_dir=runs/hard400 data.ratio=0.01
harvest $ML/ft moco_linear
echo FINAL_A_DONE

# ---- B. bench refresh ----
wait_tpu
timeout 3600 python bench.py --all > runs/r4/bench_all_r2final.json 2> runs/r4/bench_all_r2final.err
cp runs/r4/bench_all_r2final.json $A/bench_all.json 2>/dev/null
wait_tpu
timeout 3600 python bench.py > runs/r4/bench_r2final.json 2> runs/r4/bench_r2final.err
cp runs/r4/bench_r2final.json $A/bench.json 2>/dev/null
echo FINAL_B_DONE

# ---- C. seed-1 ft30 column ----
S=runs/seed1
FT30="data.data_dir=runs/hard400_s1 data.ratio=0.3"
retry_tpu $S/ft30_scratch.log python -m cmx.cli.finetune --out $S/ft30 --batches 32 -- $FT30
harvest $S/ft30 seed1_ft30
for t in cmunet spark genesis moco mae; do
  retry_tpu $S/ft30_$t.log python -m cmx.cli.finetune -p $S/ckpt/$t/encoder.npz \
    --out $S/ft30 --batches 32 -- $FT30
  harvest $S/ft30 seed1_ft30
done
echo FINAL_C_DONE
echo ROUND2_FINAL_DONE
