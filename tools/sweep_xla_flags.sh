#!/bin/bash
# XLA conv-backward/scheduling/layout flag sweep on the SparK step (VERDICT
# item 1b). Flag names verified against this build's libtpu (strings dump).
#
# Channel: AXON_LIBTPU_OVERRIDES, NOT XLA_FLAGS. The axon PJRT plugin
# compiles REMOTELY on the terminal; local XLA_FLAGS parsing fatals on
# TPU-only flag names (parse_flags_from_env.cc "Unknown flag"), while
# AXON_LIBTPU_OVERRIDES is forwarded per-compile to the terminal's
# compiler (axon_host compile_override_flags; the var is also folded into
# the compile-cache key, so each configuration recompiles). NOT-SAFE flags
# are reported by the plugin and the terminal's value silently wins —
# watch stderr for "NOT-SAFE" to know a config didn't apply.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=${1:-/tmp/xla_sweep.log}
: > $OUT

run () {
  name=$1; shift
  echo "== $name: $*" >> $OUT
  AXON_LIBTPU_OVERRIDES="$*" timeout 1200 python -u tools/ab_perf_r4.py step --batch 128 \
    2>/tmp/sweep_err_$name.log | tail -1 >> $OUT
  grep -il "not-safe" /tmp/sweep_err_$name.log >/dev/null 2>&1 && echo "   (NOT-SAFE reported — terminal value used)" >> $OUT
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
# conv-specific lowering/fusion knobs (VERDICT 1b: conv-backward scheduling)
run conv_input_fusion_downcast "--xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"
run conv_multi_users "--xla_tpu_input_conv_multi_users=true"
run x8_producers_into_conv "--xla_tpu_fuse_non_trivial_x8_producers_into_conv_like=true"
run reduce_window_as_conv "--xla_tpu_handle_reduce_window_as_convolution=true"
run autotune_windows "--xla_tpu_autotune_windows=true"

cat $OUT
echo SWEEP_DONE
