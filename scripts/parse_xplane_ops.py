"""Aggregate per-op device self-time straight from a jax.profiler
``*.xplane.pb`` (the raw profile artifact), skipping the trace.json
conversion — which at 3 frames x 512^2 produces a 300+ MB trace that the
exporter chokes on (observed: export hung past a 15-min timeout while the
xplane itself was written in seconds).

Usage:
  python scripts/parse_xplane_ops.py /tmp/mrt_trace/plugins/profile/*/vm.xplane.pb [top_n]

Prints, per device plane: total busy time and the top ops by summed
duration with occurrence counts — same report as scripts/parse_trace_ops.py
but sourced from the xplane directly.
"""

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrt_trace/plugins/profile/*/*.xplane.pb"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(pat))
    if not paths:
        print("no xplane found for", pat)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Steps", "XLA Modules") and "Ops" not in line.name:
                continue
            by = defaultdict(float)
            counts = defaultdict(int)
            total = 0.0
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # -> ms
                by[name] += dur
                counts[name] += 1
                total += dur
            if not by:
                continue
            print(f"\n=== plane '{plane.name}' line '{line.name}': "
                  f"{total:.1f} ms busy, {len(by)} distinct ops ===")
            for name, ms in sorted(by.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{ms:10.2f} ms  x{counts[name]:<7d} {100*ms/total:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()
