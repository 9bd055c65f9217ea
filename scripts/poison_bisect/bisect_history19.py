"""Round 2j step 19: do the one-hot lookups' CONVOLUTION lowerings poison?

HLO opcode diff (poisoning trace vs clean standalone) leaves exactly one
untested op: convolution — XLA lowers take_rows_onehot's skinny
(N,L)@(L,W) HIGHEST-precision dots to `convolution bf_io->bf`.

Cases in one process, probing between:
  1. take_rows_onehot exactly as production (13-row table, 32768 lanes)
  2. the same dot WITHOUT precision=HIGHEST
  3. a plain gather lookup (control)

Run detached: nohup python scripts/bisect_history19.py > /tmp/history19.log 2>&1 &
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
from mrt_tpu.render import shade

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

tab = jnp.asarray(np.random.default_rng(2).normal(size=(13, 16)), jnp.float32)
idx = jnp.asarray(np.random.default_rng(3).integers(0, 13, N), jnp.int32)

g1 = jax.jit(lambda t, i: shade.take_rows_onehot(t, i).sum())
low = g1.lower(tab, idx).compile()
has_conv = " convolution(" in low.as_text()
print(json.dumps(dict(phase="onehot_lowering", convolution=has_conv)), flush=True)
jax.block_until_ready(g1(tab, idx))
timeit("after_onehot_highest")

def dot_default(t, i):
    onehot = (i[:, None] == jnp.arange(t.shape[0], dtype=i.dtype)[None, :])
    return jnp.dot(onehot.astype(t.dtype), t).sum()

g2 = jax.jit(dot_default)
jax.block_until_ready(g2(tab, idx))
timeit("after_onehot_default_prec")

g3 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
jax.block_until_ready(g3(tab, idx))
timeit("after_plain_gather")
