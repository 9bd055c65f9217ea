"""Round 2j step 6: inline scene.compile() with re-timings interleaved.

Run detached: nohup python scripts/bisect_history6.py > /tmp/history6.log 2>&1 &
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
from mrt_tpu.engine.scene import SceneData, SceneStatics, MaterialDef
from mrt_tpu.assets import texture as tex

scene = make_app_scene(width=128, height=128, include_robot=False)

# ---- compile() body, inlined --------------------------------------------
positions, normals, uvs, vert_inst = [], [], [], []
indices, tri_res, tri_inst = [], [], []
atlas_builder = tex.AtlasBuilder()
mats = []
v_base = 0
for inst, model in enumerate(scene.models):
    mesh = model.mesh
    positions.append(mesh.positions)
    normals.append(mesh.normals)
    uvs.append(mesh.uvs)
    vert_inst.append(np.full(mesh.positions.shape[0], inst, np.int32))
    eff_mats = model.effective_materials()
    for sub, mat in zip(mesh.submeshes, eff_mats):
        res_id = atlas_builder.add_resource({
            tex.MAP_BASECOLOR: mat.map_base_color,
            tex.MAP_NORMAL: mat.map_normal,
            tex.MAP_ROUGHNESS: mat.map_roughness,
            tex.MAP_METALLIC: mat.map_metallic,
            tex.MAP_AO: mat.map_ao,
            tex.MAP_OPACITY: mat.map_opacity,
            tex.MAP_EMISSION: mat.map_emission,
        })
        mats.append(mat)
        indices.append(sub.indices + v_base)
        tri_res.append(np.full(sub.indices.shape[0], res_id, np.int32))
        tri_inst.append(np.full(sub.indices.shape[0], inst, np.int32))
    v_base += mesh.positions.shape[0]

timeit("after_model_loop")

atlas = atlas_builder.build()
jax.block_until_ready(jax.tree_util.tree_leaves(atlas))
timeit("after_atlas_build")

has_np = np.asarray(atlas.has_map)
n_res = len(mats)
materials = T.Materials(
    base_color=jnp.asarray([m.base_color for m in mats], jnp.float32).reshape(n_res, 3),
    specular=jnp.asarray([m.specular for m in mats], jnp.float32).reshape(n_res, 3),
    emission=jnp.asarray([m.emission for m in mats], jnp.float32).reshape(n_res, 3),
    specular_exponent=jnp.asarray([m.specular_exponent for m in mats], jnp.float32),
    refraction_index=jnp.asarray([m.refraction_index for m in mats], jnp.float32),
    opacity=jnp.asarray([m.opacity for m in mats], jnp.float32),
    texture_flags=jnp.asarray([0 for _ in range(n_res)], jnp.uint32),
)
jax.block_until_ready(jax.tree_util.tree_leaves(materials))
timeit("after_materials")

transforms = scene.instance_transforms()
timeit("after_instance_transforms")

pos_cat = jnp.asarray(np.concatenate(positions))
data = SceneData(
    positions_obj=pos_cat,
    prev_positions_obj=pos_cat,
    normals_obj=jnp.asarray(np.concatenate(normals)),
    uvs=jnp.asarray(np.concatenate(uvs)),
    vertex_instance=jnp.asarray(np.concatenate(vert_inst)),
    indices=jnp.asarray(np.concatenate(indices)),
    tri_resource=jnp.asarray(np.concatenate(tri_res)),
    tri_instance=jnp.asarray(np.concatenate(tri_inst)),
    instance_transform=jnp.asarray(transforms),
    prev_instance_transform=jnp.asarray(transforms),
    materials=materials,
    lights=scene.lights,
    atlas=atlas,
    env_map=jnp.asarray(scene.env_map),
    env_intensity=jnp.asarray(scene.env_intensity, jnp.float32),
)
jax.block_until_ready([x for x in jax.tree_util.tree_leaves(data)])
timeit("after_scenedata")
