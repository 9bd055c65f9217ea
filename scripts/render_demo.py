"""Offline demo renderer — the analog of the reference's demo video
(movies/demo.mp4): orbits the app scene while the robot animates, writing an
animated GIF / MP4 and a final still.

Usage: python scripts/render_demo.py [--cpu] [--size 256] [--frames 120]
       [--out /tmp/demo.gif]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 256
    frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 90
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/demo.gif"

    from mrt_tpu import Renderer, make_app_scene
    from mrt_tpu.upscale.presenter import write_png

    scene = make_app_scene(width=size, height=size)
    r = Renderer(scene, output_width=size, output_height=size)
    r.samples_per_pixel = 2
    r.max_bounces = 2

    images = []
    for i in range(frames):
        r.orbit(3.0, 0.6)  # slow sweep; resets accumulation each step
        # a few accumulation frames per camera position to tame noise
        for _ in range(3):
            r.draw(1 / 60)
        images.append(r.output_image())
        if (i + 1) % 10 == 0:
            print(f"{i + 1}/{frames} frames, stats={r.stats.report()}")

    import imageio.v2 as imageio

    if out.endswith(".gif"):
        imageio.mimsave(out, images, duration=1 / 30, loop=0)
    else:
        imageio.mimsave(out, images, fps=30)
    write_png(out.rsplit(".", 1)[0] + "_final.png", images[-1])
    print("wrote", out)


if __name__ == "__main__":
    main()
