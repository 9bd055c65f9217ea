"""Round 2j step 3: reproduce the device poison WITHOUT scene code.

scene.compile() (array uploads + dozens of eager jnp ops) makes every later
program ~280x slower. Two candidate mechanisms:
  A) many DISTINCT loaded executables (eager ops each compile+load one)
  B) many LIVE device buffers (uploads)

Run detached: nohup python scripts/bisect_history3.py > /tmp/history3.log 2>&1 &
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "exes"

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

if MODE == "exes":
    keep = []
    for i in range(1, 121):
        x = jnp.ones((8, 8 + i), jnp.float32)  # distinct shape -> distinct exe
        keep.append(jnp.sum(x * 1.5))
    jax.block_until_ready(keep[-1])
    timeit("after_120_distinct_exes")
elif MODE == "bufs":
    keep = []
    a = np.ones((64, 64), np.float32)
    for i in range(3000):
        keep.append(jax.device_put(a))  # same shape: uploads, no new exe
    jax.block_until_ready(keep[-1])
    timeit("after_3000_live_buffers")
    del keep
    timeit("after_free_buffers")
elif MODE == "uint8":
    # atlas-like upload: big uint8 / odd dtype arrays
    keep = [jax.device_put(np.zeros((2048, 2048, 4), np.uint8))]
    keep.append(jax.device_put(np.zeros((512, 512), np.float16)))
    jax.block_until_ready(keep[-1])
    timeit("after_odd_dtype_uploads")
