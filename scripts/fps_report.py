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

--sweep plots the interactive-quality curve (VERDICT round-3 item 6): FPS
vs (render_scale, spp, output resolution) with the temporal upscaler, one
JSON line per point plus a trailing summary line naming the max-quality
config that clears 5 FPS and the distance to the 30 FPS reference bar
(FramePresenter.swift:435-521 — scaler + tonemap + present every frame).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure(out_w, out_h, frames, mode, spp, bounces, scale):
    import jax

    from mrt_tpu import Renderer, UPSCALER_DENOISED, UPSCALER_TEMPORAL
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.upscale.presenter import present_device

    scene = make_app_scene(width=out_w, height=out_h, include_robot=True)
    r = Renderer(scene, output_width=out_w, output_height=out_h)
    r.upscaler_mode = UPSCALER_DENOISED if mode == "denoised" else UPSCALER_TEMPORAL
    r.render_scale = scale
    r.samples_per_pixel = spp
    r.max_bounces = bounces

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
    return {
        "metric": "fps_config5",
        "value": round(fps, 3),
        "unit": "frames/s",
        "target": 30.0,
        "detail": {
            "output": f"{out_w}x{out_h}",
            "render": f"{r.render_width}x{r.render_height}",
            "mode": mode,
            "spp": spp,
            "bounces": bounces,
            "render_scale": scale,
            "frames": frames,
            "host_busy_frac": round(host_busy / total, 4),
            "ms_per_frame": round(1000.0 * total / frames, 2),
            "backend": jax.devices()[0].platform,
        },
    }


# Quality-ordered sweep points: (output res, render_scale, spp). Quality
# rank = rendered rays/frame (res^2 * scale^2 * spp); the summary picks the
# highest-quality point clearing 5 FPS.
SWEEP = [
    ("4k", 3840, 2160, 0.5, 2),
    ("4k", 3840, 2160, 0.5, 1),   # the config-5 reference point
    ("4k", 3840, 2160, 0.25, 1),
    ("1080p", 1920, 1080, 1.0, 1),
    ("1080p", 1920, 1080, 0.5, 1),
    ("1080p", 1920, 1080, 0.25, 1),
    ("720p", 1280, 720, 0.5, 1),
    ("720p", 1280, 720, 0.25, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="256->512 CPU smoke")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--mode", default="temporal", choices=["temporal", "denoised"])
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--scale", type=float, default=0.5,
                    help="render_scale (config 5: 4K output -> 1080p render)")
    ap.add_argument("--sweep", action="store_true",
                    help="FPS-vs-quality curve over (res, render_scale, spp)")
    args = ap.parse_args()
    if args.small:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    if not args.sweep:
        print(json.dumps(measure(
            512 if args.small else 3840, 512 if args.small else 2160,
            args.frames or (6 if args.small else 30),
            args.mode, args.spp, args.bounces, args.scale)))
        return

    points = []
    for name, w, h, scale, spp in SWEEP:
        if args.small:
            w, h = w // 8, h // 8
        res = measure(w, h, args.frames or (4 if args.small else 12),
                      args.mode, spp, args.bounces, scale)
        res["detail"]["res_name"] = name
        points.append(res)
        print(json.dumps(res), flush=True)

    def quality(p):  # rendered rays per frame
        d = p["detail"]
        rw, rh = (int(x) for x in d["render"].split("x"))
        return rw * rh * d["spp"]

    ok = [p for p in points if p["value"] >= 5.0]
    best = max(ok, key=quality) if ok else None
    print(json.dumps({
        "metric": "fps_sweep_summary",
        "best_config_over_5fps": best["detail"] if best else None,
        "best_fps": best["value"] if best else None,
        "distance_to_30fps": round(30.0 / best["value"], 1) if best else None,
    }))


if __name__ == "__main__":
    main()
