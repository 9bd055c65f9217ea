"""Multi-chip flagship benchmark — ready for the day real multi-chip
hardware appears (VERDICT round-3 item 8a).

Runs the flagship app scene through DistributedRenderer over a (dp, sp)
mesh and prints ONE bench-schema JSON line:

    {"metric": "Mrays/s", "value": N, "unit": "Mrays/s",
     "vs_baseline": N / (200 * n_chips), "detail": {...}}

``vs_baseline`` is normalized against the BASELINE.md north star of
>=200 Mrays/s PER CHIP, so 1.0 means the whole mesh hit the per-chip
target — aggregate throughput alone can't game it.

Written expectation (PERF.md round 4c): replicated-BVH dp is
embarrassingly parallel — zero per-frame collectives besides the stats
psum and the sp pmean — so dp scaling should be ~linear (>=90%
efficiency) as long as the per-chip row block keeps the chip's lane
budget full (height/dp >= ~128 rows at 1080p). The harness measures
that efficiency directly by also timing dp=1 on one device of the same
platform.

Usage:
  python scripts/bench_multichip.py [--dp N] [--sp M] [--width W]
      [--height H] [--frames F] [--skip-single]

On a single-chip host this still runs (dp=1) and reports
``multi_chip: false`` — the driver can invoke it unconditionally. On a
CPU host it runs the virtual-device smoke (detail.platform = "cpu")
purely to keep the harness itself test-covered; those numbers are not
throughput claims.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(width, height, mesh):
    from mrt_tpu.core.types import RenderSettings
    from mrt_tpu.dist.sharding import DistributedRenderer
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer

    scene = make_app_scene(width=width, height=height, include_robot=False)
    # mirror bench.py's flagship settings via a throwaway single-chip
    # Renderer so the settings construction stays in ONE place
    from mrt_tpu.engine.renderer import UPSCALER_OFF

    r = Renderer(scene, output_width=width, output_height=height)
    r.upscaler_mode = UPSCALER_OFF  # measure raw tracing, like bench.py
    r.samples_per_pixel = 2
    r.max_bounces = 4
    r.use_motion_adaptive_sampling = False
    settings = r.settings()
    return DistributedRenderer(scene, settings, mesh=mesh)


def _time_frames(dr, frames):
    import jax

    dr.draw()  # compile + warm
    jax.block_until_ready(dr.accum)
    rays = 0
    t0 = time.perf_counter()
    for _ in range(frames):
        dr.draw()
        rays += int(dr.last_rays_traced)
    jax.block_until_ready(dr.accum)
    return rays, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=0, help="0 = all devices / sp")
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--gp", type=int, default=0,
                    help="geometry-sharded mode over a ('gp',) mesh of N "
                         "chips (BVH > HBM configuration) instead of dp x sp")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--skip-single", action="store_true",
                    help="skip the dp=1 reference timing")
    args = ap.parse_args()

    import jax

    from mrt_tpu.dist.sharding import make_mesh

    devices = jax.devices()
    platform = devices[0].platform

    if args.gp:
        from jax.sharding import Mesh
        import numpy as np

        from mrt_tpu.dist.geometry import GeometryShardedRenderer
        from mrt_tpu.engine.appscene import make_app_scene
        from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF

        n = min(args.gp, len(devices))
        scene = make_app_scene(width=args.width, height=args.height,
                               include_robot=False)
        r = Renderer(scene, output_width=args.width, output_height=args.height)
        r.upscaler_mode = UPSCALER_OFF
        r.samples_per_pixel = 2
        r.max_bounces = 4
        r.use_motion_adaptive_sampling = False
        gr = GeometryShardedRenderer(
            scene, r.settings(), mesh=Mesh(np.asarray(devices[:n]), ("gp",)))
        rays, secs = _time_frames(gr, args.frames)
        mrays = rays / secs / 1e6
        print(json.dumps({
            "metric": "Mrays/s", "value": round(mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(mrays / 200.0, 5),
            "detail": {"platform": platform, "mesh": {"gp": n},
                       "resolution": f"{args.width}x{args.height}",
                       "spp": 2, "bounces": 4, "frames": args.frames,
                       "total_rays": rays, "seconds": round(secs, 3)},
        }))
        return
    n = args.dp * args.sp if args.dp else len(devices)
    n = min(n, len(devices))
    # dp must divide the height; trim to the largest feasible count
    while n > 1 and (n % args.sp or args.height % (n // args.sp)):
        n -= 1
    mesh = make_mesh(n_devices=n, sp=args.sp)
    dp = mesh.shape["dp"]

    dr = _build(args.width, args.height, mesh)
    rays, secs = _time_frames(dr, args.frames)
    mrays = rays / secs / 1e6

    detail = {
        "platform": platform,
        "multi_chip": n > 1,
        "mesh": {"dp": dp, "sp": mesh.shape["sp"]},
        "resolution": f"{args.width}x{args.height}",
        "spp": 2, "bounces": 4, "frames": args.frames,
        "total_rays": rays, "seconds": round(secs, 3),
        "per_chip_mrays": round(mrays / n, 3),
    }

    if n > 1 and not args.skip_single:
        single = _build(args.width, args.height, make_mesh(n_devices=1))
        s_rays, s_secs = _time_frames(single, args.frames)
        s_mrays = s_rays / s_secs / 1e6
        detail["single_chip_mrays"] = round(s_mrays, 3)
        detail["dp_scaling_efficiency"] = round(mrays / (s_mrays * n), 3)

    print(json.dumps({
        "metric": "Mrays/s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / (200.0 * n), 5),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
