"""Capture a jax.profiler trace of the frame loop — the Xcode-GPU-capture
analog (SURVEY.md §5.1). Stage boundaries show up as the named scopes from
engine/renderer._render_frame (world_transform / bvh_refit / trace /
accumulate).

Usage: python scripts/profile_trace.py [--cpu] [--size 256] [--out /tmp/mrt_trace]
View with tensorboard/xprof or any perfetto-compatible viewer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 256
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/mrt_trace"

    import jax

    from mrt_tpu import Renderer, UPSCALER_OFF, make_app_scene

    robot = "--norobot" not in sys.argv
    scene = make_app_scene(width=size, height=size, include_robot=robot)
    r = Renderer(scene, output_width=size, output_height=size)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = (
        int(sys.argv[sys.argv.index("--spp") + 1]) if "--spp" in sys.argv else 1)
    if "--bounces" in sys.argv:
        r.max_bounces = int(sys.argv[sys.argv.index("--bounces") + 1])
    r.use_motion_adaptive_sampling = False

    r.draw()  # compile outside the trace
    jax.block_until_ready(r.accum)

    with jax.profiler.trace(out):
        for _ in range(3):
            r.draw(1 / 60)
        jax.block_until_ready(r.accum)
    print("trace written to", out)
    print("stats:", r.stats.report())


if __name__ == "__main__":
    main()
