#!/usr/bin/env bash
# One-shot on-chip validation + A/B sequence for when the axon relay is up.
# Runs everything SEQUENTIALLY (one process on the chip at a time) and
# appends JSON lines to $LOG (default /tmp/chip_sequence.jsonl).
#
#   bash script/chip_sequence.sh
#
# Order: correctness gates first (abort on failure), then throughput A/Bs.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/chip_sequence.jsonl}
: > "$LOG"

step() {  # step <name> <cmd...>
  local name=$1 out rc
  shift
  echo "=== $name ===" >&2
  out=$("$@" 2>/tmp/chip_step.err)
  rc=$?
  out=$(printf '%s\n' "$out" | tail -1)
  echo "{\"step\": \"$name\", \"rc\": $rc, \"out\": ${out:-null}}" >> "$LOG"
  echo "$name rc=$rc: $out" >&2
  return $rc
}

# 1. Parity gates (fused kernels vs flax, fwd+grad, real shapes)
step parity_highest python script/chip_parity.py || exit 1
step parity_high env UFO_KERNEL_PRECISION=high python script/chip_parity.py || exit 1

# 2. Throughput: default (HIGHEST kernels), bf16x3 kernels, glue-kernels-off
step bench_default python bench.py
step bench_prec_high env UFO_KERNEL_PRECISION=high python bench.py
step bench_glue_off env BENCH_FUSED=never python bench.py
step bench_high_glue_off env UFO_KERNEL_PRECISION=high BENCH_FUSED=never python bench.py

echo "done; results in $LOG" >&2
cat "$LOG"
