"""Round 2j step 12: is the D2H-cleaned bench path actually unpoisoned?

Interleave the poison-probe (standalone flat traversal timing) with the
bench's own steps: build_renderer -> warmup draw -> timed draws.

Run detached: nohup python scripts/bisect_history12.py > /tmp/history12.log 2>&1 &
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

r = bench.build_renderer(512, 512)
timeit("after_build_renderer")

r.draw()
jax.block_until_ready(r.accum)
timeit("after_warmup_draw")

counts = []
t0 = time.time()
for _ in range(2):
    r.draw()
    counts.append(r.last_rays_traced)
jax.block_until_ready(r.accum)
dt = time.time() - t0
timeit("after_timed_draws")
print(json.dumps(dict(phase="frame_rate",
                      mrays_s=round(sum(int(x) for x in counts) / dt / 1e6, 3),
                      seconds=round(dt, 3))), flush=True)
timeit("after_ray_readback")
