"""Profile the dp=1 distributed frame (xplane capture) — round 5: the
staged shard_map path still measures 1.29 vs 5.90 Mrays/s single-chip
(PERF.md 5d/5i) with the table confirmed S(1)-placed and identical ray
counts; this capture names the slow band per op class.

Workflow per CLAUDE.md: parse the .xplane.pb directly afterward:
  python scripts/parse_xplane_ops.py '/tmp/mrt_dp_prof/plugins/profile/*/*.xplane.pb' 40

Run detached: nohup python scripts/profile_dp.py > /tmp/dp_prof.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = "/tmp/mrt_dp_prof"
    import jax

    import bench
    from mrt_tpu.dist import sharding as S

    r = bench.build_renderer(1920, 1080)
    settings = r.settings()
    mesh = S.make_mesh(n_devices=1, sp=1)
    dr = S.DistributedRenderer(r.scene, settings, mesh=mesh)

    dr.draw()  # compile + warm (hints live after this)
    dr.draw()
    jax.block_until_ready(dr.accum)

    frames = 2
    t0 = time.time()
    with jax.profiler.trace(out):
        for _ in range(frames):
            dr.draw()
        jax.block_until_ready(dr.accum)
    dt = time.time() - t0
    rays = float(jax.device_get(dr.last_rays_traced)) * frames
    print(f"trace written to {out}")
    print(f"dp=1: {frames} frames in {dt:.3f}s, ~{rays/1e6:.1f} Mrays, "
          f"{rays/dt/1e6:.3f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
