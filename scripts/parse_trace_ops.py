"""Attribute device time to source lines: parse the XLA-Ops track of a
jax.profiler trace (per-op self time on the TPU core) and join each hot op
against a compiled-HLO text dump to recover source_file:source_line.

Usage:
  python scripts/parse_trace_ops.py /tmp/mrt_trace /tmp/hlo_staged.txt
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrt_trace"
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else None
    paths = sorted(glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz")),
                   key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    evs = data["traceEvents"]

    # find the device "XLA Ops" track
    ops_track = None
    for ev in evs:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("args", {}).get("name") == "XLA Ops"):
            ops_track = (ev["pid"], ev["tid"])
    if ops_track is None:
        print("no XLA Ops track found")
        return

    by_name = defaultdict(float)
    counts = defaultdict(int)
    cat = {}
    total = 0.0
    for ev in evs:
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) != ops_track:
            continue
        dur = ev.get("dur", 0) / 1e6
        by_name[ev["name"]] += dur
        counts[ev["name"]] += 1
        a = ev.get("args", {}) or {}
        if "hlo_category" in a:
            cat[ev["name"]] = a["hlo_category"]
        total += dur

    src = {}
    if hlo_path and os.path.exists(hlo_path):
        txt = open(hlo_path).read()
        # map %name -> source_file:line (first occurrence of the op's def)
        for m in re.finditer(
                r"%([\w.\-]+) = [^\n]*?source_file=\"([^\"]+)\" source_line=(\d+)",
                txt):
            src.setdefault(m.group(1), f"{os.path.basename(m.group(2))}:{m.group(3)}")

    print(f"device op total: {total:.3f}s")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:35]
    for name, t in rows:
        where = src.get(name, "")
        print(f"  {t:8.4f}s  x{counts[name]:<6} {cat.get(name,''):22} {name:28} {where}")

    by_cat = defaultdict(float)
    for name, t in by_name.items():
        by_cat[cat.get(name, "?")] += t
    print("by hlo_category:")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {t:8.4f}s  {c}")


if __name__ == "__main__":
    main()
