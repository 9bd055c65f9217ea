#!/bin/bash
# Round-3 TPU experiment queue — run once when the axon tunnel is up.
# Everything uses the 512x512 quick bench (fast compiles) except the
# final flagship confirmations. Honest regime: bench.py performs no D2H
# in the timed loop, and the first trace dispatch deactivates the axon
# speculator anyway, so frame timings are real device time +- ~33 ms
# dispatch RTT per frame.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_queue.log
say() { echo "=== $* ($(date +%H:%M:%S))" | tee -a "$LOG"; }
qb() { # name, env...
  local name=$1; shift
  say "quick $name [$*]"
  env "$@" timeout 2400 python bench.py --quick 2>>"$LOG" | tail -1 \
    | sed "s/^/{\"exp\": \"$name\"} /" | tee -a "$LOG"
}

say "baseline"
qb base
say "stream retry (occupancy ~1: pays mean steps, not per-chunk max)"
qb stream16k MRT_STREAM=16384
qb stream16k_r4 MRT_STREAM=16384 MRT_REFILL=4
qb stream8k MRT_STREAM=8192
say "donation"
qb donate MRT_DONATE=1
say "fuse on/off"
qb fuse0 MRT_FUSE=0
say "tree shape re-sweep"
qb a12k8 MRT_ARITY=12 MRT_LEAF_K=8
qb a16k12 MRT_ARITY=16 MRT_LEAF_K=12
qb a8k8 MRT_ARITY=8 MRT_LEAF_K=8
say "unroll"
qb unroll2 MRT_UNROLL=2
qb unroll6 MRT_UNROLL=6
say "chunks"
qb chunks4 MRT_CHUNKS=4
qb chunks16 MRT_CHUNKS=16
say "tile size"
qb tile32k MRT_TILE=32768
qb tile131k MRT_TILE=131072
say "queue done"

say "row width (bytes-vs-rows discriminator at e2e level)"
qb row64 MRT_ROW=64 MRT_ARITY=8 MRT_LEAF_K=6
qb row64_k12leaf MRT_ROW=128 MRT_ARITY=8 MRT_LEAF_K=6
say "row-width sweep done"

say "staged-config suite (small)"
timeout 3600 python scripts/bench_suite.py --small 2>>"$LOG" | tee -a "$LOG"
say "suite done"

say "transposed traversal state (full-lane-width VPU ops)"
qb flat_base MRT_TWOLEVEL=0
qb transposed_flat MRT_TRANSPOSED=1 MRT_TWOLEVEL=0
qb transposed_flat_u2 MRT_TRANSPOSED=1 MRT_TWOLEVEL=0 MRT_UNROLL=2
qb transposed MRT_TRANSPOSED=1
qb transposed_u2 MRT_TRANSPOSED=1 MRT_UNROLL=2
say "transposed sweep done"

say "pallas atrous TPU smoke/AB"
timeout 1200 python scripts/atrous_tpu_check.py 2>>"$LOG" | tee -a "$LOG"
say "atrous check done"

say "final: flagship bench + cache re-prime"
timeout 3600 python bench.py 2>>"$LOG" | tail -1 | tee -a "$LOG"
say "flagship done"

say "capped-pass occupancy (predicted ~2.2x paid-step cut, PERF round 3)"
qb pass2_cap8 MRT_PASSES=2 MRT_PASSCAP=8
qb pass2_cap12 MRT_PASSES=2 MRT_PASSCAP=12
qb pass2_cap16 MRT_PASSES=2 MRT_PASSCAP=16
qb pass3_cap8 MRT_PASSES=3 MRT_PASSCAP=8
say "capped-pass done"
