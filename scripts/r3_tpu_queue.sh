#!/bin/bash
# Round-3 TPU experiment queue — run once when the axon tunnel is up
# (normally invoked by /tmp/tunnel_watch.sh AFTER the probes and the
# flagship cache prime). Quick-bench knob matrix under the honest timing
# regime (bench.py does no D2H in the timed loop; the first trace
# dispatch deactivates the axon speculator, so numbers are real device
# time +- ~33 ms dispatch RTT per frame).
#
# Ordering: highest-expected-value and lowest-risk first; the Pallas
# kernel smoke (device-fault risk) runs LAST. A 120 s canary between
# sections aborts the queue if the device wedges, so later sections
# don't each burn their full timeout.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_queue.log
say() { echo "=== $* ($(date +%H:%M:%S))" | tee -a "$LOG"; }
# Never SIGKILL/SIGTERM a python mid-TPU work (CLAUDE.md: a killed process
# wedges the axon grant). run_bounded launches detached and POLLS; on
# budget overrun it leaves the process to finish naturally and aborts the
# remaining queue instead of killing.
run_bounded() { # budget_s out_file cmd...
  local budget=$1 out=$2; shift 2
  "$@" > "$out" 2>&1 &
  local pid=$!
  local t=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 10; t=$((t + 10))
    if [ "$t" -ge "$budget" ]; then
      say "run exceeded ${budget}s - leaving PID $pid to finish naturally; ABORTING queue"
      exit 1
    fi
  done
  wait "$pid" 2>/dev/null || true
}
qb() { # name, env...
  local name=$1; shift
  say "quick $name [$*]"
  run_bounded 2400 /tmp/qb_run.out env "$@" python bench.py --quick
  cat /tmp/qb_run.out >> "$LOG"
  tail -1 /tmp/qb_run.out | grep '^{' \
    | sed "s/^/{\"exp\": \"$name\"} /" | tee -a "$LOG"
}
canary() {
  run_bounded 180 /tmp/canary.out python -c "import jax, jax.numpy as jnp; \
jax.block_until_ready(jnp.ones((8,)) + 1); print('canary ok')"
  grep -q "canary ok" /tmp/canary.out \
    || { say "CANARY FAILED - aborting queue"; exit 1; }
}

say "baseline"
qb base
canary

say "capped-pass occupancy (predicted ~2.2x paid-step cut, PERF round 3a)"
qb pass2_cap12 MRT_PASSES=2 MRT_PASSCAP=12
qb pass2_cap8 MRT_PASSES=2 MRT_PASSCAP=8
qb pass2_cap16 MRT_PASSES=2 MRT_PASSCAP=16
qb pass3_cap8 MRT_PASSES=3 MRT_PASSCAP=8
canary

say "transposed traversal state (full-lane-width VPU ops)"
qb transposed MRT_TRANSPOSED=1
qb transposed_u2 MRT_TRANSPOSED=1 MRT_UNROLL=2
qb flat_base MRT_TWOLEVEL=0
qb transposed_flat MRT_TRANSPOSED=1 MRT_TWOLEVEL=0
qb pass2_transposed MRT_PASSES=2 MRT_PASSCAP=12 MRT_TRANSPOSED=1
canary

say "stream retry (occupancy ~1; round-2 loss was measured in the fake regime)"
qb stream16k MRT_STREAM=16384
qb stream16k_r4 MRT_STREAM=16384 MRT_REFILL=4
qb stream8k MRT_STREAM=8192
canary

say "row width (bytes-vs-rows discriminator at e2e level)"
qb row64 MRT_ROW=64 MRT_ARITY=8 MRT_LEAF_K=6
qb row128_k6 MRT_ROW=128 MRT_ARITY=8 MRT_LEAF_K=6
canary

say "donation / fuse / shapes / unroll / chunks / tile"
qb fuse_finish MRT_FUSE_FINISH=1
qb donate MRT_DONATE=1
qb fuse0 MRT_FUSE=0
qb a12k8 MRT_ARITY=12 MRT_LEAF_K=8
qb a16k12 MRT_ARITY=16 MRT_LEAF_K=12
qb unroll2 MRT_UNROLL=2
qb unroll6 MRT_UNROLL=6
qb chunks4 MRT_CHUNKS=4
qb chunks16 MRT_CHUNKS=16
qb tile32k MRT_TILE=32768
qb tile131k MRT_TILE=131072
qb prime MRT_PRIME=1
canary

say "staged-config suite (small)"
run_bounded 3600 /tmp/suite.out python scripts/bench_suite.py --small
cat /tmp/suite.out | tee -a "$LOG"
canary

say "flagship re-prime with round-3 default trace path (CLAUDE.md working agreement)"
run_bounded 3600 /tmp/flagship.out python bench.py
tail -1 /tmp/flagship.out | tee -a "$LOG"
canary

say "config-5 FPS report (1080p->4K temporal orbit loop; VERDICT r2 item 6)"
run_bounded 3600 /tmp/fps.out python scripts/fps_report.py
tail -1 /tmp/fps.out | tee -a "$LOG"
canary

say "pallas atrous TPU smoke/AB (device-fault risk: LAST)"
run_bounded 1200 /tmp/atrous.out python scripts/atrous_tpu_check.py
cat /tmp/atrous.out | tee -a "$LOG"
say "queue done"
