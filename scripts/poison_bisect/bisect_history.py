"""Round 2j: does PROCESS HISTORY (other device programs having run) slow
the same traversal executable 100-400x?

Evidence: identical (N=32768, chunks=16, unroll=2) flat traversal on the
identical synthetic cloud runs 85.9 us in a fresh process
(bisect_flat_speed.py) vs 36,607 us after Renderer-construction programs
ran (profile_flat_cases.py). Same compiled program; xplane of the slow
state shows a ~0.5-1 us FIXED overhead on every op in the while body.

Protocol (one process): time the jitted traversal fast-config, then run
increasingly heavy foreign work, re-timing the SAME jitted fn after each:
  phase0: fresh               -> expect ~100 us
  phase1: after a small matmul program
  phase2: after wide.build of a second BVH (device refit programs)
  phase3: after Renderer(appscene) construction
  phase4: after r.draw() (the full frame program)

Run detached: nohup python scripts/bisect_history.py > /tmp/history.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

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
    print(json.dumps(dict(phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)


timeit("fresh")

mm = jax.jit(lambda a, b: a @ b)
x = jnp.ones((1024, 1024), jnp.float32)
jax.block_until_ready(mm(x, x))
timeit("after_matmul")

bvh2 = wide.build(c * 0.5, v1 * 0.5, v2 * 0.5)
timeit("after_second_build")

from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
scene = make_app_scene(width=128, height=128, include_robot=False)
r = Renderer(scene, output_width=128, output_height=128)
timeit("after_renderer_ctor")

r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = 1
r.max_bounces = 2
r.draw()
jax.block_until_ready(r.accum)
timeit("after_frame_draw")
