"""Measure wavefront.trace_tile as an ISOLATED program on the real app scene.

The full frame program runs at ~1.4 Mrays/s while the standalone traversal
runs at 500+ (VMEM-placed table, docs/PERF.md round 2b). This bisects at the
tile level: one jitted trace_tile (real shading, real atlas, spp/bounces like
the flagship) on 65k pixels. If this program gets the VMEM placement, the
staged-renderer restructure (host loop over tiles, per-stage programs) is the
e2e fix.

Run detached: nohup python scripts/bench_tile_program.py > /tmp/tileprog.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine import scene as scene_mod
from mrt_tpu.render import wavefront as wf
from mrt_tpu.core import types as T


def main():
    two_level = "--flat" not in sys.argv
    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 4
    r.use_motion_adaptive_sampling = False
    r.two_level = two_level
    if "--nosort" in sys.argv:
        r.sort_rays = False
    if "--chunks" in sys.argv:
        r.traversal_chunks = int(sys.argv[sys.argv.index("--chunks") + 1])

    cam = r.current_camera()
    uniforms = T.make_frame_uniforms(
        camera=cam, previous_camera=cam, frame_index=0,
        accumulation_weight=0.9, motion_accum_min_weight=0.1,
        motion_accum_low_px=0.5, motion_accum_high_px=4.0,
        motion_sampling_low_px=1.0, motion_sampling_high_px=6.0,
    )
    settings = r.settings()
    statics = r.statics
    sd = r.scene_data

    P = 65536
    px = jnp.tile(jnp.arange(256, dtype=jnp.int32), 256)
    py = jnp.repeat(jnp.arange(128, 384, dtype=jnp.int32), 256)
    offsets = jnp.zeros((P,), jnp.int32)
    pmot = jnp.zeros((P, 2), jnp.float32)

    def tile_fn(sdata, bvh, uni, px, py, offs, pmot):
        pos_w, prev_w, nrm_w = scene_mod.world_geometry(sdata)
        geom = wf.build_geometry(sdata, pos_w, prev_w, nrm_w)
        out = wf.trace_tile(settings, statics, sdata, bvh, geom, uni,
                            px, py, offs, pmot)
        return out.color, out.rays_traced

    fn = jax.jit(tile_fn)
    args = (sd, r.bvh, uniforms, px, py, offsets, pmot)
    col, rays = fn(*args)
    jax.block_until_ready(col)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        col, rays = fn(*args)
        jax.block_until_ready(col)
        best = min(best, time.perf_counter() - t0)
    n_rays = int(np.sum(np.asarray(rays)))
    print(dict(two_level=two_level, pixels=P, rays=n_rays, s=round(best, 4),
               mrays_s=round(n_rays / best / 1e6, 2)), flush=True)
    if "--profile" in sys.argv:
        with jax.profiler.trace("/tmp/tile_trace"):
            col, rays = fn(*args)
            jax.block_until_ready(col)
        print("trace written to /tmp/tile_trace", flush=True)


if __name__ == "__main__":
    main()
