"""Full benchmark suite — the five BASELINE.json staged configs.

Prints one JSON line per config. Heavier than bench.py (which is the driver's
single flagship line); run manually: python scripts/bench_suite.py [--small]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure(r, frames):
    import jax

    # warm with the SAME draw variant the loop times: draw() and draw(dt)
    # compile different prepare programs (static vs skinning+refit), and a
    # mismatched warmup put the skinned-path compile inside config 4's
    # timed window (measured 3.5 "Mrays/s" vs the honest 5.9 — round 5)
    r.draw(1 / 60)
    jax.block_until_ready(r.accum)
    # zero D2H in the timed loop (one readback serializes every later
    # dispatch on the axon tunnel — docs/PERF.md round 2j); counters are
    # device scalars read back after the clock stops
    counts = []
    t0 = time.time()
    for _ in range(frames):
        r.draw(1 / 60)
        counts.append(r.last_rays_traced)
    jax.block_until_ready(r.accum)
    dt = time.time() - t0
    total = sum(int(c) for c in counts)
    return dict(
        mrays_per_s=round(total / dt / 1e6, 3),
        fps=round(frames / dt, 2),
        frame_ms=round(dt / frames * 1e3, 1),
        rays_per_frame=total // frames,
    )


def main():
    small = "--small" in sys.argv
    scale = 4 if small else 1

    from mrt_tpu import Renderer, UPSCALER_OFF, UPSCALER_TEMPORAL, make_app_scene
    from mrt_tpu.assets import hdr
    from mrt_tpu.engine.scene import Model, Scene

    results = {}

    # config 1: sphere+plane, primary + hard shadows, 512^2, 1 spp
    w = h = 512 // scale
    s1 = Scene(width=w, height=h)
    s1.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5), Model("plane", scale=10)]
    r = Renderer(s1, output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    results["config1_primary_shadows"] = _measure(r, 4)

    # config 2: bunny+teapot, PBR + HDR env, 1-bounce GI
    s2 = Scene(width=w, height=h)
    s2.models = [
        Model("bunny", position=[-0.6, 0.45, 0], scale=1.0),
        Model("teapot", position=[0.6, 0.0, 0], scale=0.3),
        Model("plane", scale=10),
    ]
    s2.set_environment(hdr.procedural_sky(64, 128), intensity=0.6)
    r = Renderer(s2, output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    results["config2_env_gi"] = _measure(r, 4)

    # config 3: dragon + multi-mesh, 4-bounce, 1080p (the bench.py flagship)
    w3, h3 = 1920 // scale, 1080 // scale
    s3 = make_app_scene(width=w3, height=h3, include_robot=False)
    r = Renderer(s3, output_width=w3, output_height=h3)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 4
    r.use_motion_adaptive_sampling = False
    results["config3_dragon_1080p"] = _measure(r, 2)

    # config 4: skinned robot + per-frame refit over static+dynamic scene
    s4 = make_app_scene(width=w, height=h, include_robot=True)
    r = Renderer(s4, output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    results["config4_skinned_refit"] = _measure(r, 4)

    # config 5: interactive orbit, temporal upscale 1080p -> 4K (BASELINE
    # "interactive 1080p->4K upscaled"); --small quarters both ends
    w5, h5 = 3840 // scale, 2160 // scale
    s5 = make_app_scene(width=w5 // 2, height=h5 // 2, include_robot=False)
    r = Renderer(s5, output_width=w5, output_height=h5)
    r.upscaler_mode = UPSCALER_TEMPORAL
    r.render_scale = 0.5
    r.samples_per_pixel = 1
    r.max_bounces = 2
    import jax

    from mrt_tpu.upscale.presenter import present_device

    # device-side present, NO per-frame D2H (a readback serializes every
    # later dispatch on the axon tunnel — the old loop measured 0.27 fps
    # where the fps_report pattern measures ~0.69, PERF.md 5e/5k)
    r.draw(1 / 60)
    img = present_device(r)
    jax.block_until_ready(img)
    t0 = time.time()
    n = 4
    for _ in range(n):
        r.orbit(2.0, 0.0)
        r.draw(1 / 60)
        img = present_device(r)
    jax.block_until_ready(img)
    dt = time.time() - t0
    results["config5_interactive_upscaled"] = dict(
        fps=round(n / dt, 2), frame_ms=round(dt / n * 1e3, 1), output=f"{w5}x{h5}"
    )

    for k, v in results.items():
        print(json.dumps({"config": k, **v}))


if __name__ == "__main__":
    main()
