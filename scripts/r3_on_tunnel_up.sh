#!/bin/bash
# Everything to run, in order, when the axon tunnel comes back
# (invoked by the /tmp/tunnel_watch.sh poller). Never kills python
# mid-TPU work: budget overruns leave the process to finish naturally
# and abort the remaining sequence (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
WLOG=/tmp/tunnel_watch.log
note() { echo "$* at $(date)" >> "$WLOG"; }

# ROUND_DEADLINE (epoch secs, optional): leave the last ~15 min of the
# round to the driver's own bench run — never start a phase that cannot
# fit before the deadline.
DEADLINE="${ROUND_DEADLINE:-0}"
fits() { # budget_s
  [ "$DEADLINE" = "0" ] && return 0
  local now; now=$(date +%s)
  [ $((now + $1 + 900)) -le "$DEADLINE" ]
}

run_bounded() { # budget_s out_file cmd...
  local budget=$1 out=$2; shift 2
  "$@" > "$out" 2>&1 &
  local pid=$!
  local t=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15; t=$((t + 15))
    if [ "$t" -ge "$budget" ]; then
      note "STUCK: $out exceeded ${budget}s (PID $pid left running); aborting sequence"
      exit 1
    fi
  done
  wait "$pid" 2>/dev/null || true
}

# fits() uses REALISTIC phase estimates (budgets in run_bounded stay the
# pessimistic stuck-detection bounds)
# ORDER (VERDICT r2 item 1): bank a verified flagship number FIRST —
# everything else is meaningless if the driver record stays 0.0.
note "tunnel up (deadline=$DEADLINE)"
fits 1800 && { run_bounded 3600 /tmp/flagship_prime.log python bench.py; note "flagship prime done"; } || note "SKIP prime (deadline)"
fits 1200 && { run_bounded 2400 /tmp/probe.log python scripts/poison_probe.py; note "probe done"; } || note "SKIP probe (deadline)"
fits 900  && { run_bounded 1800 /tmp/frameprobe.log python scripts/poison_frame_probe.py; note "frameprobe done"; } || note "SKIP frameprobe (deadline)"
fits 1500 && { run_bounded 2400 /tmp/honest.log python scripts/honest_microbench.py; note "honest done"; } || note "SKIP honest (deadline)"
fits 5400 && { bash scripts/r3_tpu_queue.sh > /tmp/r3_queue_out.log 2>&1; note "queue done"; } || note "SKIP queue (deadline)"
note "sequence finished"
