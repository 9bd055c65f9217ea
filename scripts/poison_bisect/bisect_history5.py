"""Round 2j step 5: the poison is in scene.compile() but NOT the atlas or
env map. Remaining: materials jnp arrays (incl. uint32 flags), the
concatenated geometry uploads, instance transforms, scalar uploads.

Run detached: nohup python scripts/bisect_history5.py > /tmp/history5.log 2>&1 &
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

# materials-class arrays: f32 matrices + a uint32 flags vector
mats_n = 13
mm = jnp.asarray(np.zeros((mats_n, 3), np.float32))
flags = jnp.asarray(np.zeros((mats_n,), np.uint32))
jax.block_until_ready(flags)
timeit("after_mats_arrays")

# geometry-upload class: concatenated int32 index + f32 vertex pools
pos = jnp.asarray(np.zeros((90000, 3), np.float32))
idx = jnp.asarray(np.zeros((95000, 3), np.int32))
tri_res = jnp.asarray(np.zeros((95000,), np.int32))
jax.block_until_ready(tri_res)
timeit("after_geom_uploads")

# instance transforms (4x4s)
tr = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (9, 1, 1)))
jax.block_until_ready(tr)
timeit("after_transforms")

# scalar upload like env_intensity
s = jnp.asarray(1.0, jnp.float32)
jax.block_until_ready(s)
timeit("after_scalar")

# the lights object (already-built arrays inside the scene)
lv = jax.tree_util.tree_leaves(scene.lights)
print(json.dumps(dict(light_leaves=[str(getattr(x, 'shape', None)) + " " +
                                    str(getattr(x, 'dtype', '')) for x in lv])),
      flush=True)
jax.block_until_ready([x for x in lv if hasattr(x, "block_until_ready")])
timeit("after_lights_touch")

scene_data, statics = scene.compile()
timeit("after_full_compile")
