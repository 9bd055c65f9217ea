"""Round 2j step 7: which materials field poisons?

Run detached: nohup python scripts/bisect_history7.py > /tmp/history7.log 2>&1 &
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

from mrt_tpu.engine.appscene import make_app_scene

scene = make_app_scene(width=128, height=128, include_robot=False)
mats = []
for model in scene.models:
    mats.extend(model.effective_materials())
n_res = len(mats)
print("n_res", n_res, flush=True)

a = jnp.asarray([m.base_color for m in mats], jnp.float32).reshape(n_res, 3)
jax.block_until_ready(a)
timeit("after_base_color")

b = jnp.asarray([m.specular for m in mats], jnp.float32).reshape(n_res, 3)
jax.block_until_ready(b)
timeit("after_specular")

cc = jnp.asarray([m.emission for m in mats], jnp.float32).reshape(n_res, 3)
jax.block_until_ready(cc)
timeit("after_emission")

dd = jnp.asarray([m.specular_exponent for m in mats], jnp.float32)
jax.block_until_ready(dd)
print("specular_exponent values:", np.asarray(dd).tolist(), flush=True)
timeit("after_specular_exponent")

ee = jnp.asarray([m.refraction_index for m in mats], jnp.float32)
ff = jnp.asarray([m.opacity for m in mats], jnp.float32)
jax.block_until_ready(ff)
timeit("after_ior_opacity")
