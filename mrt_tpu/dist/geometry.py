"""Geometry-sharded rendering ("gp" axis) — SURVEY.md §5.7's genuinely novel
component: for scenes whose acceleration structure exceeds one chip's HBM,
the triangle set is partitioned into spatially-coherent shards (Morton-order
chunks of the SAH/Karras layout); every chip builds/refits a BVH over ITS
shard only, rays are replicated across the ``gp`` axis, and per-bounce hits
are combined with min-t collectives over ICI
(render/wavefront.combine_hits_across).

Memory: the BVH + packed triangle rows (the dominant footprint, ~0.3 KB/tri)
scale 1/n_gp per chip; raw vertex attributes stay replicated for shading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..bvh import lbvh, wide
from ..core import types as T
from ..engine import scene as scene_mod
from ..render import accumulate as acc
from ..render import wavefront as wf


def shard_triangles(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, n_shards: int) -> list[np.ndarray]:
    """Partition triangle ids into n_shards spatially-coherent groups
    (contiguous chunks of the Morton ordering)."""
    centroids = (v0 + v1 + v2) / 3.0
    codes = lbvh.morton_codes(
        centroids, centroids.min(axis=0), centroids.max(axis=0)
    )
    order = np.argsort(codes, kind="stable")
    return [np.sort(chunk).astype(np.int32) for chunk in np.array_split(order, n_shards)]


def build_sharded_bvhs(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, n_shards: int):
    """Per-shard WideBVHs with EQUALIZED shapes (so they stack along a leading
    mesh axis) and GLOBAL triangle ids in the leaves.

    Returns (stacked WideBVH pytree with leading dim n_shards, shard tri ids).
    """
    shards = shard_triangles(v0, v1, v2, n_shards)
    built = []
    for tri_ids in shards:
        b = wide.build(v0[tri_ids], v1[tri_ids], v2[tri_ids])
        # leaf ids are local to the shard -> remap to global
        leaf = np.asarray(b.leaf_tri)
        remapped = np.where(leaf >= 0, tri_ids[np.clip(leaf, 0, None)], -1).astype(np.int32)
        built.append(b._replace(leaf_tri=jnp.asarray(remapped)))

    # equalize: same n_internal, n_rows, depth across shards
    max_ni = max(b.n_internal for b in built)
    max_nl = max(b.n_rows - b.n_internal for b in built)
    depth = max(b.depth for b in built)
    eq = []
    for b in built:
        ni, nl = b.n_internal, b.n_rows - b.n_internal
        pad_i, pad_l = max_ni - ni, max_nl - nl
        # shift leaf ids up by pad_i (leaves now live at [max_ni, max_ni+nl))
        child = np.asarray(b.node_child)
        child = np.where(child >= ni, child + pad_i, child)
        child = np.concatenate([child, np.full((pad_i, wide.ARITY), -1, np.int32)])
        leaf = np.concatenate(
            [np.asarray(b.leaf_tri), np.full((pad_l, wide.LEAF_K), -1, np.int32)]
        )
        eq.append(
            wide.WideBVH(
                table=jnp.zeros((max_ni + max_nl, wide.ROW), jnp.float32),
                node_child=jnp.asarray(child),
                leaf_tri=jnp.asarray(leaf),
                n_internal=max_ni,
                depth=depth,
            )
        )
        # NOTE: padded internal rows are never reachable (no child points at
        # them) and padded leaves are NaN after refit (never hit).
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *eq)
    return stacked, shards


def build_gp_render_step(settings: T.RenderSettings, statics, mesh: Mesh):
    """Jitted geometry-sharded frame step over a ('gp',) mesh: rays and image
    replicated, BVH sharded, hits combined per bounce via ICI collectives."""
    assert "gp" in mesh.shape, "mesh needs a 'gp' axis"
    settings = __import__("dataclasses").replace(settings, geometry_axis="gp")

    def shard_fn(scene, bvh, uniforms, offsets, prev_accum, prev_motion,
                 skin_bundle, joint_matrices):
        # the sharded leading axis arrives as a size-1 block: squeeze it
        bvh = jax.tree.map(lambda x: x[0], bvh)
        # replicated skinning (leaf_tri ids are global, so shard refit picks
        # up the deformed pose automatically)
        if statics.skin_slices:
            from ..skinning import lbs

            pos_obj = scene.positions_obj
            nrm_obj = scene.normals_obj
            for k, (_, start, _count) in enumerate(statics.skin_slices):
                sp_pos, sp_nrm = lbs.skin(
                    skin_bundle[k].weights_dense,
                    joint_matrices[k],
                    skin_bundle[k].rest_positions,
                    skin_bundle[k].rest_normals,
                )
                pos_obj = jax.lax.dynamic_update_slice(pos_obj, sp_pos, (start, 0))
                nrm_obj = jax.lax.dynamic_update_slice(nrm_obj, sp_nrm, (start, 0))
            scene = scene._replace(positions_obj=pos_obj, normals_obj=nrm_obj)
        pos_w, prev_w, nrm_w = scene_mod.world_geometry(scene)
        geom = wf.build_geometry(scene, pos_w, prev_w, nrm_w)
        bvh = wide.refit(bvh, geom.tri_v0, geom.tri_v1, geom.tri_v2)
        out = wf.trace_block(settings, statics, scene, bvh, geom, uniforms, offsets, prev_motion)
        accum = acc.accumulate(settings, uniforms, out.color, out.motion, prev_motion, prev_accum)
        return accum, out.depth, out.motion

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("gp"), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def step(scene, bvh, uniforms, offsets, prev_accum, prev_motion,
             skin_bundle=(), joint_matrices=()):
        return shard(scene, bvh, uniforms, offsets, prev_accum, prev_motion,
                     skin_bundle, joint_matrices)

    return jax.jit(step)
