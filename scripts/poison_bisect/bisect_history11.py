"""Round 2j step 11: can dropping the host-read buffer (or other cheap
actions) un-poison the stream?

Run detached: nohup python scripts/bisect_history11.py > /tmp/history11.log 2>&1 &
"""

import json
import os
import sys
import time
import gc

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

small = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
host = np.asarray(small)  # poison
timeit("poisoned")

del host, small
gc.collect()
timeit("after_del_gc")

# a fresh, never-before-compiled executable after poisoning
g = jax.jit(lambda a: (a * 2.0 + 1.0).sum())
x = jnp.ones((512, 512), jnp.float32)
jax.block_until_ready(g(x))
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); jax.block_until_ready(g(x))
    best = min(best, time.perf_counter() - t0)
print(json.dumps(dict(phase="tiny_matmul_after_poison",
                      us=round(best * 1e6, 1))), flush=True)

timeit("final")
