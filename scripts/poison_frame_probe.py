"""Round-3: what does a poisoned FRAME dispatch actually cost?

Fresh process: time the standalone traversal (clean baseline), build the
512x512 quick-bench renderer with spp=1 bounces=1, then time draw #1
(compile+first exec), #2, #3 individually, then re-time the standalone
traversal. Together with poison_probe.py `bigsmall` this separates:
  - poison = fixed per-dispatch latency  -> draws 2/3 ~= honest work + 35ms
  - poison = execution multiplier        -> draws 2/3 >> honest work

Run detached: nohup python scripts/poison_frame_probe.py > /tmp/frameprobe.log 2>&1 &
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mrt_tpu.bvh import wide  # noqa: E402
from mrt_tpu.core import types as T  # noqa: E402


def make_traversal(N=32768):
    n_tris = 100_000
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
    e = 0.6 / np.sqrt(n_tris)
    v1 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
    v2 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
    bvh = wide.build(c, v1, v2)
    rg = np.random.default_rng(1)
    o = rg.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
    d = rg.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (bvh.table, bvh.table[:8], jnp.asarray(o), jnp.asarray(d),
            jnp.full((N,), np.inf, jnp.float32), jnp.ones((N,), bool))

    def f(table, patch, ro, rd, rm, msk):
        b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child,
                         bvh.leaf_tri, bvh.n_internal, bvh.depth)
        return wide._traverse(b, T.Rays(ro, rd, rm), 1e-4, False, msk,
                              chunks=16, sort_rays=True, profile=False,
                              unroll=2)

    return jax.jit(f), args, N


probe, pargs, N = make_traversal()


def timeit(label):
    st = probe(*pargs); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); st = probe(*pargs)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps(dict(phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)


timeit("traversal_fresh")

from mrt_tpu.engine.appscene import make_app_scene  # noqa: E402
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF  # noqa: E402

scene = make_app_scene(width=512, height=512, include_robot=False)
r = Renderer(scene, output_width=512, output_height=512)
r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = 1
r.max_bounces = 1
r.use_motion_adaptive_sampling = False
timeit("traversal_after_renderer_ctor")

for i in range(1, 5):
    t0 = time.perf_counter()
    r.draw()
    jax.block_until_ready(r.accum)
    dt = time.perf_counter() - t0
    print(json.dumps(dict(phase=f"draw{i}", ms=round(dt * 1e3, 2))),
          flush=True)

timeit("traversal_after_draws")

# Does ASYNC dispatch pipeline under the honest (speculator-off) regime?
# 10 enqueued draws + one block: ~10x RTT means serialized dispatch;
# ~RTT + 10x device time means the runtime pipelines and interactive
# frame rates survive the poison.
t0 = time.perf_counter()
for _ in range(10):
    r.draw()
jax.block_until_ready(r.accum)
dt = time.perf_counter() - t0
print(json.dumps(dict(phase="draw10_pipelined",
                      total_ms=round(dt * 1e3, 2),
                      per_frame_ms=round(dt * 1e2, 2))), flush=True)
