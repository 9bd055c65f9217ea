"""Round 2j step 4: bisect scene.compile() itself for the device poison.

Phases re-time the SAME jitted traversal after each piece of what
compile() does: atlas build, materials upload, SceneData upload, env map.

Run detached: nohup python scripts/bisect_history4.py > /tmp/history4.log 2>&1 &
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
from mrt_tpu.assets import texture as tex

scene = make_app_scene(width=128, height=128, include_robot=False)

# phase: atlas only
atlas_builder = tex.AtlasBuilder()
for model in scene.models:
    for sub, mat in zip(model.mesh.submeshes, model.effective_materials()):
        atlas_builder.add_resource({
            tex.MAP_BASECOLOR: mat.map_base_color,
            tex.MAP_NORMAL: mat.map_normal,
            tex.MAP_ROUGHNESS: mat.map_roughness,
            tex.MAP_METALLIC: mat.map_metallic,
            tex.MAP_AO: mat.map_ao,
            tex.MAP_OPACITY: mat.map_opacity,
            tex.MAP_EMISSION: mat.map_emission,
        })
atlas = atlas_builder.build()
jax.block_until_ready(jax.tree_util.tree_leaves(atlas)[0])
print(json.dumps(dict(atlas_shapes=[
    str(getattr(v, "shape", None)) + " " + str(getattr(v, "dtype", ""))
    for v in jax.tree_util.tree_leaves(atlas)])), flush=True)
timeit("after_atlas_build")

# phase: env map upload
em = jnp.asarray(scene.env_map)
jax.block_until_ready(em)
timeit("after_env_map")

# phase: full compile
scene_data, statics = scene.compile()
timeit("after_full_compile")
