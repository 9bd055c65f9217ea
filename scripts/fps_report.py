"""Config-5 interactive-loop FPS report (BASELINE: 1080p -> 4K jittered
temporal upscale, >=30 FPS target; the display-link draw loop analog,
Renderer.swift:1405-1503).

Measures, over an orbiting-camera loop on the app scene:
  * fps           — end-to-end frames/second (draw + device-side present; the
                    image stays on device like the reference's drawable)
  * host_busy     — fraction of wall time the host spent dispatching: < 1
                    proves host frame N+1 prep overlaps device frame N
                    (frames-in-flight analog, Renderer.swift:207).

Prints one JSON line. --small runs a reduced config for CPU smoke use.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="256->512 CPU smoke")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--mode", default="temporal", choices=["temporal", "denoised"])
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=2)
    args = ap.parse_args()
    if args.small:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    from mrt_tpu import Renderer, UPSCALER_DENOISED, UPSCALER_TEMPORAL
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.upscale.presenter import present_device

    if args.small:
        out_w, out_h, frames = 512, 512, args.frames or 6
    else:
        out_w, out_h, frames = 3840, 2160, args.frames or 30

    scene = make_app_scene(width=out_w, height=out_h, include_robot=True)
    r = Renderer(scene, output_width=out_w, output_height=out_h)
    r.upscaler_mode = UPSCALER_DENOISED if args.mode == "denoised" else UPSCALER_TEMPORAL
    r.render_scale = 0.5  # 4K output -> 1080p render (config 5)
    r.samples_per_pixel = args.spp
    r.max_bounces = args.bounces

    def frame(dt):
        r.orbit(0.02, 0.0)  # interactive orbit: camera moves every frame
        r.draw(dt)
        return present_device(r)

    # warm-up: trace program + present program compile (cached across runs)
    img = frame(1 / 30.0)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    host_busy = 0.0
    for _ in range(frames):
        f0 = time.perf_counter()
        img = frame(1 / 30.0)
        host_busy += time.perf_counter() - f0  # dispatch only: no sync here
    jax.block_until_ready(img)
    total = time.perf_counter() - t0

    fps = frames / total
    render_w, render_h = r.render_width, r.render_height
    print(json.dumps({
        "metric": "fps_config5",
        "value": round(fps, 3),
        "unit": "frames/s",
        "target": 30.0,
        "detail": {
            "output": f"{out_w}x{out_h}",
            "render": f"{render_w}x{render_h}",
            "mode": args.mode,
            "spp": args.spp,
            "bounces": args.bounces,
            "frames": frames,
            "host_busy_frac": round(host_busy / total, 4),
            "ms_per_frame": round(1000.0 * total / frames, 2),
            "backend": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
