"""Round-4b fresh profile: per-band device accounting at the CURRENT code
state (tree-quality-v2 builder), at the two shapes that matter:

  --flagship : 1920x1080 spp2 b4 app scene (bench.py headline config)
  --dragon   : 1024x576 spp2 b4, dragon_subdivisions=8 (~1.33M tris)

Answers the round-4 VERDICT questions:
  * flagship: what IS the non-traversal 37% made of now (sort? shade
    gathers? QMC? relayouts?) — name the next band to attack.
  * dragon: is the 65 MB table's in-frame gather rate still ~1.6 ns/row
    (pops are physics) or worse (placement/size cliff -> table split or
    bf16 rows are live)?

Workflow per CLAUDE.md: xplane parsed directly (trace.json export hangs).

Usage: python scripts/profile_r4b.py --flagship|--dragon [--frames 3]
Then:  python scripts/parse_xplane_ops.py '/tmp/mrt_r4b_<mode>/plugins/profile/*/*.xplane.pb' 50
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = "dragon" if "--dragon" in sys.argv else "flagship"
    frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 3
    out = f"/tmp/mrt_r4b_{mode}"

    import jax

    import bench

    if mode == "dragon":
        r = bench.build_renderer(1024, 576, dragon_subdivisions=8)
    else:
        r = bench.build_renderer(1920, 1080)

    r.draw()  # compile outside the trace
    jax.block_until_ready(r.accum)

    t0 = time.time()
    with jax.profiler.trace(out):
        for _ in range(frames):
            r.draw()
        jax.block_until_ready(r.accum)
    dt = time.time() - t0
    rays = float(jax.device_get(r.last_rays_traced)) * frames
    print(f"trace written to {out}")
    print(f"{mode}: {frames} frames in {dt:.3f}s, ~{rays/1e6:.1f} Mrays total, "
          f"{rays/dt/1e6:.3f} Mrays/s")


if __name__ == "__main__":
    main()
