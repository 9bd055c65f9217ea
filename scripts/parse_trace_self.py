"""Tree-aware self-time attribution for the XLA-Ops device track: each op's
duration minus its directly-nested children (whiles contain their bodies on
the same track, so flat sums double-count). Usage:
  python scripts/parse_trace_self.py /tmp/trace_dir
"""
import glob, gzip, json, os, sys
from collections import defaultdict

def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrt_trace"
    paths = sorted(glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz")),
                   key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    evs = data["traceEvents"]
    ops_track = None
    for ev in evs:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("args", {}).get("name") == "XLA Ops"):
            ops_track = (ev["pid"], ev["tid"])
    spans = [e for e in evs if e.get("ph") == "X"
             and (e.get("pid"), e.get("tid")) == ops_track]
    spans.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    # stack-based nesting
    self_t = defaultdict(float); counts = defaultdict(int); tot = defaultdict(float)
    stack = []  # (end_ts, name, child_sum_accumulator as list)
    for e in spans:
        ts, dur, name = e["ts"], e.get("dur", 0), e["name"]
        while stack and ts >= stack[-1][0] - 1e-9:
            end, nm, chsum = stack.pop()
            pass
        if stack:
            stack[-1][2][0] += dur
        stack.append((ts + dur, name, [0.0]))
        # finalize on pop is awkward; instead store and finalize at end
        e["_frame"] = stack[-1]
    # simpler second pass: recompute with explicit finalize
    self_t.clear(); counts.clear(); tot.clear()
    stack = []
    for e in spans:
        ts, dur, name = e["ts"], e.get("dur", 0), e["name"]
        while stack and ts >= stack[-1][0] - 1e-9:
            end, nm, chsum, d = stack.pop()
            self_t[nm] += d - chsum[0]; counts[nm] += 1; tot[nm] += d
        if stack:
            stack[-1][2][0] += dur
        stack.append((ts + dur, name, [0.0], dur))
    while stack:
        end, nm, chsum, d = stack.pop()
        self_t[nm] += d - chsum[0]; counts[nm] += 1; tot[nm] += d
    grand = sum(self_t.values())
    print(f"device self-time total: {grand/1e6:.3f}s")
    for nm, t in sorted(self_t.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {t/1e6:9.4f}s  x{counts[nm]:<6} (tot {tot[nm]/1e6:8.4f}s)  {nm}")

if __name__ == "__main__":
    main()
