"""Round 2j step 15: trace-program poison — SIZE or DURATION?

Cases (fresh subprocess each):
  a) 512x512, spp=2, bounces=4  (baseline: known to poison; ~0.4 s run)
  b) 512x512, spp=1, bounces=1  (same program shape/size class, ~6x shorter)
  c) 128x128, spp=1, bounces=1  (tiny run, same body)
  d) 512x512, spp=2, bounces=4, but probe fn dispatched BETWEEN warmup and
     re-run (does the poison hit instantly or accumulate?)

Run detached: nohup python scripts/bisect_history15.py > /tmp/history15.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

res, spp, bounces = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

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
    print(json.dumps(dict(res=res, spp=spp, bounces=bounces, phase=label,
                          us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF

scene = make_app_scene(width=res, height=res, include_robot=False)
r = Renderer(scene, output_width=res, output_height=res)
r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = spp
r.max_bounces = bounces
r.use_motion_adaptive_sampling = False
timeit("after_ctor")

t0 = time.perf_counter()
r.draw()
jax.block_until_ready(r.accum)
print(json.dumps(dict(res=res, spp=spp, bounces=bounces,
                      first_draw_s=round(time.perf_counter() - t0, 2))),
      flush=True)
timeit("after_first_draw")

t0 = time.perf_counter()
r.draw()
jax.block_until_ready(r.accum)
print(json.dumps(dict(res=res, spp=spp, bounces=bounces,
                      second_draw_ms=round((time.perf_counter() - t0) * 1e3, 1))),
      flush=True)
timeit("after_second_draw")
"""

CASES = [(512, 2, 4), (512, 1, 1), (128, 1, 1)]


def main():
    for res, spp, bounces in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO),
             str(res), str(spp), str(bounces)],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"case": [res, spp, bounces],
                              "error": p.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
