#!/bin/bash
# XLA conv-backward/scheduling/layout flag sweep on the SparK step (VERDICT
# item 1b). Flag names verified against this build's libtpu (strings dump);
# flags apply at backend init, so each configuration is a fresh process.
# Baseline (no extra flags) is re-measured first for drift control.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=${1:-/tmp/xla_sweep.log}
: > $OUT

run () {
  name=$1; shift
  echo "== $name: $*" >> $OUT
  XLA_FLAGS="$*" timeout 900 python -u tools/ab_perf_r4.py step --batch 128 \
    2>/dev/null | tail -1 >> $OUT
}

run baseline ""
run fusion_cost_model "--xla_tpu_enable_experimental_fusion_cost_model=true"
run sched_real_cost "--xla_tpu_scheduler_using_real_cost_model=true"
run all_experimental_sched "--xla_tpu_enable_all_experimental_scheduler_features=true"
run large_2nd_minor "--xla_tpu_enable_large_2nd_minor_layout=true --xla_tpu_enable_large_2nd_minor_layout_for_x16=true"
run layout_negotiation "--xla_tpu_allow_layout_negotiation=true"
run aggressive_loop_fusion_layout "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run bf16_slp "--xla_tpu_enable_bf16_slp_vectorizer=true"
run dot_strength "--xla_tpu_enable_dot_strength_reduction=true"
run combo_best "--xla_tpu_enable_experimental_fusion_cost_model=true --xla_tpu_enable_large_2nd_minor_layout=true --xla_tpu_enable_large_2nd_minor_layout_for_x16=true"

cat $OUT
echo SWEEP_DONE
