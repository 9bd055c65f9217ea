"""Round 2j step 17: which OP CLASS in the shading core poisons axon?

One process; probe (standalone traversal timing) between tiny jit programs
each exercising one op family the trace program uses but the (non-
poisoning) standalone traversal does not. First flip wins; later phases
rerun in a fresh process if needed.

Run detached: nohup python scripts/bisect_history17.py > /tmp/history17.log 2>&1 &
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

x = jnp.arange(4096, dtype=jnp.uint32)
g1 = jax.jit(lambda a: ((a * 1103515245 + 12345) ^ (a >> 7) | (a << 3)) % 1009)
jax.block_until_ready(g1(x))
timeit("after_uint32_bitops")

xf = jnp.linspace(0.1, 2.0, 4096)
g2 = jax.jit(lambda a: jnp.sin(a) + jnp.exp(-a) + jnp.power(a, 3.3) + jnp.log(a) + jnp.sqrt(a))
jax.block_until_ready(g2(xf))
timeit("after_transcendentals")

mb = jnp.ones((256, 256), jnp.bfloat16)
g3 = jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum())
jax.block_until_ready(g3(mb, mb))
timeit("after_bf16_matmul")

oh = jnp.ones((2048, 64), jnp.float32)
tab = jnp.ones((64, 16), jnp.float32)
g4 = jax.jit(lambda a, b: a @ b)
jax.block_until_ready(g4(oh, tab))
timeit("after_f32_matmul")

key = jax.random.PRNGKey(0)
g5 = jax.jit(lambda k: jax.random.uniform(k, (1024,)))
jax.block_until_ready(g5(key))
timeit("after_threefry")

img = jnp.ones((256, 256, 3), jnp.float32)
iy = jnp.clip(jnp.arange(4096) % 256, 0, 255)
ix = jnp.clip((jnp.arange(4096) * 7) % 256, 0, 255)
g6 = jax.jit(lambda im, y, xx: im[y, xx, :].sum())
jax.block_until_ready(g6(img, iy, ix))
timeit("after_2d_gather")

g7 = jax.jit(lambda a: jnp.cumsum(a) + jnp.argsort(a).astype(jnp.float32))
jax.block_until_ready(g7(xf))
timeit("after_cumsum_argsort")

# dynamic-update-slice loop carry (the in-program tile loop shape)
def dus_loop(a):
    def body(i, acc):
        return jax.lax.dynamic_update_slice(acc, (a[:128] + i).astype(jnp.float32)[None], (i % 8, 0))
    return jax.lax.fori_loop(0, 16, body, jnp.zeros((8, 128), jnp.float32))
g8 = jax.jit(dus_loop)
jax.block_until_ready(g8(xf))
timeit("after_dus_loop")
