#!/bin/bash
# Round-2 TPU measurement session (run when the relay is healthy).
# Sequential single-python runs; each line appends one JSON to the log.
# Usage: bash tools/r2_measure.sh [logfile]
set -u
LOG=${1:-/tmp/r2_measure.jsonl}
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG.err"
  # env assignments come as KEY=VAL args before the marker "--"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  ( export "${envs[@]}" 2>/dev/null
    timeout 3000 python bench.py 2>>"$LOG.err" ) | tail -1 | \
    sed "s/^/{\"tag\": \"$tag\", \"line\": /; s/$/}/" >> "$LOG"
  tail -1 "$LOG"
}

# 1. default headline (serve-first ordering + wire-dtype admission):
#    expect serve_rtf >= 146.9 (s16 halves admit upload bytes) and
#    headline ~269x unchanged
run default -- --

# 2. end-to-end batch-task pipeline (BASELINE config 3 shape), large-v3,
#    16 x 60 s files, 4 concurrent workers
run batch BENCH_MODE=batch BENCH_BATCH_FILES=16 BENCH_BATCH_SECONDS=60 BENCH_BATCH_WORKERS=4 BENCH_E2E=0 -- --

# 3. batch worker sweep: does 8 beat 4?
run batch_w8 BENCH_MODE=batch BENCH_BATCH_FILES=16 BENCH_BATCH_SECONDS=60 BENCH_BATCH_WORKERS=8 BENCH_E2E=0 -- --

# 4. serve admission-bucket sweep (untried lever)
run serve_ab148 BENCH_MODE=serve SPEAKSENSE_ADMIT_BUCKETS=1,4,8 -- --
run serve_ab1816 BENCH_MODE=serve SPEAKSENSE_ADMIT_BUCKETS=1,8,16 -- --

echo "done: $LOG"
