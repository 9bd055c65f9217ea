"""Profile the interactive frame loop at the round-4g "playable point"
(720p output, render_scale 0.5, spp1 b2, temporal upscaler, orbiting
camera) to decompose the ~60-80 ms fixed per-frame floor the FPS curve
flattens into below ~0.5M rays/frame (docs/PERF.md round 4g).

Captures an xplane over N orbiting frames; parse with
  python scripts/parse_xplane_ops.py '/tmp/mrt_int_prof/plugins/profile/*/*.xplane.pb' 30
and read the Modules line: per-program device-busy vs the wall gap tells
whether the floor is device work (presenter/accumulate programs), dispatch
serialization, or host prep.

Usage: python scripts/profile_interactive.py [--frames 10]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 10
    out = "/tmp/mrt_int_prof"

    import jax

    from mrt_tpu import Renderer, UPSCALER_TEMPORAL
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.upscale.presenter import present_device

    scene = make_app_scene(width=1280, height=720, include_robot=True)
    r = Renderer(scene, output_width=1280, output_height=720)
    r.upscaler_mode = UPSCALER_TEMPORAL
    r.render_scale = 0.5
    r.samples_per_pixel = 1
    r.max_bounces = 2

    def frame(dt):
        r.orbit(0.02, 0.0)
        r.draw(dt)
        return present_device(r)

    img = frame(1 / 30.0)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        for _ in range(frames):
            img = frame(1 / 30.0)
        jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"trace written to {out}")
    print(f"{frames} frames in {dt:.3f}s = {1000*dt/frames:.1f} ms/frame "
          f"({frames/dt:.2f} FPS)")


if __name__ == "__main__":
    main()
