"""Round 2j step 25: content bisect via MRT_BISECT_STAGE truncation of
trace_tile (compile of the truncated program, then probe).

Stages: camrays | body1 | bodyloop | bodyloop_proj | full

Run detached: nohup python scripts/bisect_history25.py > /tmp/history25.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time, os
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

stage = sys.argv[1]
if stage != "full":
    os.environ["MRT_BISECT_STAGE"] = stage

n_tris = 100_000
rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
e = 0.6 / np.sqrt(n_tris)
v1 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
v2 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
bvh = wide.build(c, v1, v2)

N = 32768
rng = np.random.default_rng(1)
o = rng.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
d = rng.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro, rd = jnp.asarray(o), jnp.asarray(d)
rm = jnp.full((N,), np.inf, jnp.float32)
mask = jnp.ones((N,), bool)

def f(table, patch, ro, rd, rm, msk):
    b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child, bvh.leaf_tri,
                     bvh.n_internal, bvh.depth)
    return wide._traverse(b, T.Rays(ro, rd, rm), 1e-4, False, msk,
                          chunks=16, sort_rays=True, profile=False, unroll=2)

fn = jax.jit(f)
args = (bvh.table, bvh.table[:8], ro, rd, rm, mask)

def timeit(label):
    st = fn(*args); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps(dict(stage=stage, phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import (
    Renderer, UPSCALER_OFF, _prepare_frame, _trace_all_tiles_frame)

scene = make_app_scene(width=128, height=128, include_robot=False)
r = Renderer(scene, output_width=128, output_height=128)
r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = 1
r.max_bounces = 1
r.use_motion_adaptive_sampling = False
settings = r.settings()
cam = r.current_camera()
uniforms = T.make_frame_uniforms(
    camera=cam, previous_camera=cam, frame_index=0,
    accumulation_weight=r.accumulation_weight,
    motion_accum_min_weight=r.motion_accumulation_min_weight,
    motion_accum_low_px=r.motion_accumulation_low_threshold_pixels,
    motion_accum_high_px=r.motion_accumulation_high_threshold_pixels,
    motion_sampling_low_px=r.motion_sampling_low_threshold_pixels,
    motion_sampling_high_px=r.motion_sampling_high_threshold_pixels,
)
scene2, geom, bvh2 = _prepare_frame(settings, r.statics, r.scene_data, r.bvh)
jax.block_until_ready(bvh2.table)
timeit("after_prepare")

patch = bvh2.table[:8]
gpatch = (geom.shade_rows[:1], geom.motion_rows[:1])
comp = _trace_all_tiles_frame.lower(
    settings, r.statics, scene2, bvh2, geom, uniforms,
    r.offsets, r.motion, r.prime_primary, r.prime_shadow, r.step_hint,
    patch, gpatch).compile()
print(json.dumps(dict(stage=stage, phase="compiled",
                      code=comp.memory_analysis().generated_code_size_in_bytes)),
      flush=True)
timeit("after_compile")
"""

CASES = ["camrays", "body1", "bodyloop", "bodyloop_proj", "full"]


def main():
    for stage in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO), stage],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"stage": stage, "error": p.stderr[-400:]}),
                  flush=True)


if __name__ == "__main__":
    main()
