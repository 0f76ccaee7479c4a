#!/bin/bash
# Round-2 tail: replaces runs_round2_master.sh phases 6-9 in VALUE order
# (new matrix columns and perf probes before redundant re-captures — the
# re-runs proved pretraining deterministic, so the round-3 ft01/ft30
# numbers in RESULTS.md remain valid for the re-trained encoders).
# Launch AFTER stopping the master at a phase boundary.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
A=artifacts/r2
mkdir -p $A runs/r4

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

# ---- T0. wait for the orphaned phase-5 ft30 mae run (pid $1), harvest ----
if [ -n "$1" ]; then tail --pid="$1" -f /dev/null; fi
harvest $R/ft30 ft30
echo TAIL_FT30_MAE_HARVESTED

# ---- T1. ft05 + ft20 (75/5- and 60/20-analog columns) ----
FT05="data.data_dir=runs/hard400 data.ratio=0.05"
retry_tpu $R/ft05_scratch.log python -m cmx.cli.finetune --out $R/ft05 --batches 8 -- $FT05
harvest $R/ft05 ft05
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft05_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft05 --batches 8 -- $FT05
  harvest $R/ft05 ft05
done
echo TAIL_FT05_DONE
FT20="data.data_dir=runs/hard400 data.ratio=0.2"
retry_tpu $R/ft20_scratch.log python -m cmx.cli.finetune --out $R/ft20 --batches 32 -- $FT20
harvest $R/ft20 ft20
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft20_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft20 --batches 32 -- $FT20
  harvest $R/ft20 ft20
done
echo TAIL_FT20_DONE

# ---- T2. probes ----
FT="data.data_dir=runs/hard400 data.ratio=0.01"
for t in spark mae cmunet moco genesis; do
  retry_tpu $R/probe_$t.log python -m cmx.cli.evaluate \
    --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT
done
retry_tpu $R/probe_scratch.log python -m cmx.cli.evaluate --probe 512 -- $FT
cp $R/probe_*.log $A/ 2>/dev/null
echo TAIL_PROBES_DONE

# ---- T3. bench refresh ----
wait_tpu
python bench.py > runs/r4/bench.json 2> runs/r4/bench.err
wait_tpu
python bench.py --all > runs/r4/bench_all.json 2> runs/r4/bench_all.err
wait_tpu
python bench.py --live --batch 128 > runs/r4/bench_live.json 2> runs/r4/bench_live.err
wait_tpu
python bench.py --live --batch 64 > runs/r4/bench_live_b64.json 2> runs/r4/bench_live_b64.err
cp runs/r4/bench*.json $A/ 2>/dev/null
echo TAIL_BENCH_DONE

# ---- T4. MoCo step profile + fixed s2d fwd+bwd probe ----
for v in full fwd_only aug_only no_aug cost; do
  retry_tpu runs/r4/moco_profile.log python -u tools/ab_perf_r4.py moco --variant $v
done
cp runs/r4/moco_profile.log $A/ 2>/dev/null
retry_tpu runs/r4/ab_s2d2.log python tools/ab_s2d.py --time
cp runs/r4/ab_s2d2.log $A/ 2>/dev/null
echo TAIL_PERF_DONE

# ---- T5. re-captures (lowest value: deterministic duplicates) ----
retry_tpu $R/ft_scratch.log python -m cmx.cli.finetune --out $R/ft --batches 4 -- $FT
harvest $R/ft ft01
for t in cmunet spark genesis moco mae; do
  retry_tpu $R/ft_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft --batches 4 -- $FT
  harvest $R/ft ft01
done
echo TAIL_FT01_DONE
FT30="data.data_dir=runs/hard400 data.ratio=0.3"
retry_tpu $R/ft30_scratch.log python -m cmx.cli.finetune --out $R/ft30 --batches 32 -- $FT30
for t in cmunet spark; do
  retry_tpu $R/ft30_$t.log python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz \
    --out $R/ft30 --batches 32 -- $FT30
done
harvest $R/ft30 ft30
echo TAIL_FT30_DONE
echo ROUND2_TAIL_DONE
