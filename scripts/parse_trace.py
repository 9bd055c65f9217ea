"""Aggregate a jax.profiler trace by op: where does frame time actually go.

Usage: python scripts/parse_trace.py /tmp/mrt_trace
Reads the newest plugins/profile/*/\*.trace.json.gz under the trace dir and
prints the top ops by total device self-time, grouping by the op_name
metadata prefix (named scopes: world_transform / bvh_refit / trace /
accumulate show up here).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrt_trace"
    paths = sorted(glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz")),
                   key=os.path.getmtime)
    if not paths:
        print("no trace found under", root)
        return
    path = paths[-1]
    print("parsing", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane events: pid/tid of TPU op track; aggregate complete events
    by_name = defaultdict(float)
    by_scope = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0) / 1e6  # us -> s
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        # keep only TPU op events (they carry run_id/hlo metadata usually)
        cat = str(args.get("group_id", "")) + str(ev.get("cat", ""))
        if not name or name.startswith("$"):
            continue
        pid = ev.get("pid")
        tname = str(pid)
        # heuristics: XLA op events have 'long_name' or 'hlo' keys, or names
        # like 'fusion.123'
        if "long_name" in args or "hlo_module" in str(args) or True:
            by_name[name] += dur
            ln = str(args.get("long_name", args.get("tf_op", "")))
            scope = ""
            for s in ("world_transform", "bvh_refit", "trace", "accumulate",
                      "sort", "gather", "while", "fusion"):
                if s in ln or s in name:
                    scope = s
                    break
            by_scope[scope or "other"] += dur
            total += dur
    print(f"total event time {total:.3f}s (all tracks, overcounts host+device)")
    print("top 25 ops:")
    for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t:8.4f}s  {name[:110]}")
    print("by scope-ish tag:")
    for name, t in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f"  {t:8.4f}s  {name}")


if __name__ == "__main__":
    main()
