"""Decompose the bench-vs-profile throughput gap: same flagship scene,
sweep (spp, bounces) and report Mrays/s each. Each config recompiles the
trace program variant (~20s warm queue).

Run detached: nohup python scripts/sweep_sppbounce.py > /tmp/sweep_sb.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF

    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.upscaler_mode = UPSCALER_OFF
    r.use_motion_adaptive_sampling = False

    for spp, bounces in [(1, 1), (1, 2), (1, 4), (2, 4)]:
        r.samples_per_pixel = spp
        r.max_bounces = bounces
        r.draw()
        jax.block_until_ready(r.accum)
        total = 0
        t0 = time.time()
        frames = 3
        for _ in range(frames):
            r.draw()
            total += int(r.last_rays_traced)
        jax.block_until_ready(r.accum)
        dt = time.time() - t0
        print(json.dumps(dict(
            spp=spp, bounces=bounces, mrays_s=round(total / dt / 1e6, 3),
            rays_per_frame=total // frames, ms_per_frame=round(dt / frames * 1e3, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
