"""Geometry-sharded rendering ("gp" axis) — SURVEY.md §5.7's genuinely novel
component: for scenes whose acceleration structure exceeds one chip's HBM,
the triangle set is partitioned into spatially-coherent shards (Morton-order
chunks of the SAH/Karras layout); every chip builds/refits a BVH over ITS
shard only, rays are replicated across the ``gp`` axis, and per-bounce hits
are combined with min-t collectives over ICI
(render/wavefront.combine_hits_across).

Memory model (per chip, scene of T triangles over n shards):
  sharded  ~1/n: BVH table (~70 B/tri), leaf ids, shard shade rows (64 B/tri),
                 shard motion rows (72 B/tri), shard world tri verts (36 B/tri)
  sharded  ~1/n (optional): the packed texture atlas, as horizontal bands
                 (band_atlas + sample_packed_banded: local taps + one psum)
  replicated:    vertex pools (~50 B/VERTEX), indices (12 B/tri),
                 global->local map (4 B/tri), materials, lights, and the
                 per-map atlas layout (texels) when mip/env paths need it
So the dominant ~240 B/tri of triangle-indexed data scales 1/n; the ~16 B/tri
remainder and the vertex pools stay replicated (cheap by comparison).

Shading: hits are combined min-t across gp, so the winning triangle's
shade/motion rows may live on another chip — each chip gathers rows it OWNS
(global->local map) and a psum reconstructs the row everywhere
(wavefront._tri_rows). Rays are replicated, so all chips then shade
identically — no divergence, one extra ICI reduce per row fetch.
"""

from __future__ import annotations

import dataclasses

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
    mesh axis). Leaf ids are shard-LOCAL (refit gathers shard-local verts);
    a parallel row-id array carries the GLOBAL ids encoded into leaf rows.

    Returns (stacked WideBVH, stacked gids (n, Ts), stacked row_gids
    (n, Nl, LEAF_K), shard id lists).
    """
    shards = shard_triangles(v0, v1, v2, n_shards)
    ts_max = max(len(s) for s in shards)

    built = []
    for tri_ids in shards:
        b = wide.build(v0[tri_ids], v1[tri_ids], v2[tri_ids])  # leaf ids LOCAL
        built.append((b, tri_ids))

    max_ni = max(b.n_internal for b, _ in built)
    max_nl = max(b.n_rows - b.n_internal for b, _ in built)
    depth = max(b.depth for b, _ in built)
    eq, gids_all, rowg_all = [], [], []
    for b, tri_ids in built:
        ni, nl = b.n_internal, b.n_rows - b.n_internal
        pad_i, pad_l = max_ni - ni, max_nl - nl
        child = np.asarray(b.node_child)
        child = np.where(child >= ni, child + pad_i, child)
        child = np.concatenate([child, np.full((pad_i, wide.ARITY), -1, np.int32)])
        leaf_local = np.concatenate(
            [np.asarray(b.leaf_tri), np.full((pad_l, wide.LEAF_K), -1, np.int32)]
        )
        row_g = np.where(
            leaf_local >= 0, tri_ids[np.clip(leaf_local, 0, None)], -1
        ).astype(np.int32)
        gids = np.full(ts_max, -1, np.int32)
        gids[: len(tri_ids)] = tri_ids
        eq.append(
            wide.WideBVH(
                table=jnp.zeros((max_ni + max_nl, wide.ROW), jnp.float32),
                node_child=jnp.asarray(child),
                leaf_tri=jnp.asarray(leaf_local),
                n_internal=max_ni,
                depth=depth,
            )
        )
        gids_all.append(gids)
        rowg_all.append(row_g)
        # padded internal rows are unreachable; padded leaves NaN after refit
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *eq)
    return stacked, jnp.asarray(np.stack(gids_all)), jnp.asarray(np.stack(rowg_all)), shards


def build_shard_geometry(scene, pos_w, prev_w, nrm_w, gids, n_tris_global: int) -> wf.Geometry:
    """Shard-local Geometry: per-triangle rows only for THIS chip's gids
    (padded slots produce garbage rows that are never selected — g2l routes
    every real hit to its owner)."""
    valid = gids >= 0
    tid = jnp.maximum(gids, 0)
    idx = jnp.take(scene.indices, tid, axis=0)  # (Ts,3)

    def g(pool, col):
        return jnp.take(pool, idx[:, col], axis=0)

    v0, v1, v2 = g(pos_w, 0), g(pos_w, 1), g(pos_w, 2)
    n0, n1, n2 = g(nrm_w, 0), g(nrm_w, 1), g(nrm_w, 2)
    uv0, uv1, uv2 = g(scene.uvs, 0), g(scene.uvs, 1), g(scene.uvs, 2)
    res_f = jnp.take(scene.tri_resource, tid).astype(jnp.float32)
    shade_rows = jnp.concatenate([n0, n1, n2, uv0, uv1, uv2, res_f[:, None]], axis=1)
    p0, p1, p2 = g(prev_w, 0), g(prev_w, 1), g(prev_w, 2)
    motion_rows = jnp.concatenate([v0, v1, v2, p0, p1, p2], axis=1)

    ts = gids.shape[0]
    g2l = (
        jnp.full((n_tris_global,), -1, jnp.int32)
        .at[jnp.where(valid, gids, n_tris_global)]
        .set(jnp.arange(ts, dtype=jnp.int32), mode="drop")
    )
    return wf.Geometry(
        positions_w=pos_w,
        prev_positions_w=prev_w,
        normals_w=nrm_w,
        tri_v0=v0,
        tri_v1=v1,
        tri_v2=v2,
        shade_rows=shade_rows,
        motion_rows=motion_rows,
        mat_rows=wf.pack_mat_rows(scene.materials),
        g2l=g2l,
    )


def build_gp_render_step(settings: T.RenderSettings, statics, mesh: Mesh,
                         banded: bool = False):
    """Jitted geometry-sharded frame step over a ('gp',) mesh — or a
    combined ('dp', 'gp') mesh, the aggregate-scaling configuration: image
    ROWS shard over dp while the BVH/triangle rows/atlas bands shard over
    gp; each (dp, gp) chip traces its row block against its geometry shard
    and hits min-t-combine over the gp axis only. Rays and image are
    replicated across gp, geometry across dp.

    ``banded=True`` declares that the step will be called with
    ``atlas_bands`` (the gp-sharded packed atlas). Only then is
    ``use_mipmaps`` forced off — the banded atlas carries LOD-0 texels
    only. With a replicated atlas the caller's mip setting is honored.

    PERF NOTE (round 5j, PERF.md): commit every repeated argument to an
    explicit ``NamedSharding`` (``jax.device_put``) before a frame loop —
    uncommitted arrays are re-placed synchronously on EVERY call, which
    cost the dp path 4.8x wall clock before the fix in
    ``sharding.DistributedRenderer``. A frame driver for this gp step
    should follow the same pattern."""
    assert "gp" in mesh.shape, "mesh needs a 'gp' axis"
    if getattr(statics, "has_masks", False):
        raise ValueError(
            "geometry masks require the two-level backend; the gp-sharded "
            "step runs the flat wide BVH, which has no per-instance mask "
            "filtering — remove the non-default geometry_mask or render "
            "single-chip/dp"
        )
    overrides = dict(geometry_axis="gp", two_level=False, hit_priming=False)
    if banded:
        overrides["use_mipmaps"] = False  # bands sample the packed LOD-0 twin
    settings = dataclasses.replace(settings, **overrides)
    n_tris = statics.n_triangles
    dp = mesh.shape.get("dp", 1)
    has_dp = "dp" in mesh.shape
    assert settings.height % dp == 0, (settings.height, dp)
    local_h = settings.height // dp

    def shard_fn(scene, bvh, gids, row_gids, uniforms, offsets, prev_accum,
                 prev_motion, skin_bundle, joint_matrices, atlas_bands):
        y0 = jax.lax.axis_index("dp") * local_h if has_dp else 0
        # the sharded leading axis arrives as a size-1 block: squeeze it
        bvh = jax.tree.map(lambda x: x[0], bvh)
        gids = gids[0]
        row_gids = row_gids[0]
        if atlas_bands is not None:
            # this chip's horizontal band of the packed atlas (band_atlas);
            # sample_packed_banded psum-reconstructs full samples, so the
            # big packed texel array scales 1/n_gp per chip (VERDICT
            # round-1 missing #6 follow-through: atlas pages shard too)
            band = atlas_bands[0]
            lo = jax.lax.axis_index("gp") * band.shape[0]
            scene = scene._replace(
                atlas=scene.atlas._replace(packed=band, band_lo=lo))
        # replicated skinning (shard refit picks up the deformed pose)
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
        geom = build_shard_geometry(scene, pos_w, prev_w, nrm_w, gids, n_tris)
        bvh = wide.refit(bvh, geom.tri_v0, geom.tri_v1, geom.tri_v2, row_ids=row_gids)
        out = wf.trace_block(settings, statics, scene, bvh, geom, uniforms,
                             offsets, prev_motion, y0=y0)
        accum = acc.accumulate(settings, uniforms, out.color, out.motion, prev_motion, prev_accum)
        # honest instrumented ray count (bench_multichip --gp): rays are
        # REPLICATED across gp (pmean, not psum — every gp chip traces the
        # same rays), summed across dp row blocks; f32 as in sharding.py
        rays = jnp.sum(out.rays_traced.astype(jnp.int32)).astype(jnp.float32)
        rays = jax.lax.pmean(rays, "gp")
        if has_dp:
            rays = jax.lax.psum(rays, "dp")
        return accum, out.depth, out.motion, rays

    rowspec = P("dp", None) if has_dp else P()
    imgspec = P("dp", None, None) if has_dp else P()
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("gp"), P("gp"), P("gp"), P(), rowspec, imgspec,
                  imgspec, P(), P(), P("gp")),
        out_specs=(imgspec, rowspec, imgspec, P()),
        check_vma=False,
    )

    n_gp = mesh.shape["gp"]

    def step(scene, bvh, uniforms, offsets, prev_accum, prev_motion,
             skin_bundle=(), joint_matrices=(), gids=None, row_gids=None,
             atlas_bands=None):
        assert (atlas_bands is not None) == banded, (
            "atlas_bands presence must match the banded= flag the step was "
            "built with (mip gating is decided at build time)")
        if atlas_bands is not None:
            assert atlas_bands.shape[0] == n_gp
            # don't ship the replicated packed texels into the step — the
            # bands carry them sharded (texels stays for the env/mip paths,
            # which the gp step gates off)
            scene = scene._replace(atlas=scene.atlas._replace(
                packed=jnp.zeros((1, 1, scene.atlas.packed.shape[2]),
                                 scene.atlas.packed.dtype)))
        return shard(scene, bvh, gids, row_gids, uniforms, offsets, prev_accum,
                     prev_motion, skin_bundle, joint_matrices, atlas_bands)

    return jax.jit(step)


class GeometryShardedRenderer:
    """Frame driver for the gp-sharded path — the BVH-larger-than-HBM
    configuration (SURVEY.md §5.7). Mirrors `sharding.DistributedRenderer`:
    builds the equal-shape BVH shards (+ optional banded atlas) once,
    commits every repeated step input to an explicit NamedSharding
    (PERF.md round 5j: uncommitted args re-place synchronously per call),
    and exposes the same `draw()` loop.

    Mesh: ('gp',) by default, or a combined ('dp', 'gp') mesh for the
    aggregate-scaling configuration.
    """

    def __init__(self, scene, settings: T.RenderSettings, mesh: Mesh | None = None,
                 banded: bool | None = None, seed: int = 0):
        from jax.sharding import NamedSharding

        from ..core import halton as H

        if mesh is None:
            devs = np.asarray(jax.devices())
            mesh = Mesh(devs, ("gp",))
        self.mesh = mesh
        self.scene = scene
        self.settings = settings
        self.scene_data, self.statics = scene.compile()
        n_gp = mesh.shape["gp"]

        # world-space triangles for the shard builder (instance transforms
        # applied host-side once; refit re-derives per frame in-program)
        sd = self.scene_data
        idx = np.asarray(sd.indices)
        pos = np.asarray(sd.positions_obj)
        tfm = np.asarray(sd.instance_transform)[np.asarray(sd.vertex_instance)]
        pw = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
        v0, v1, v2 = pw[idx[:, 0]], pw[idx[:, 1]], pw[idx[:, 2]]
        bvhs, gids, row_gids, _ = build_sharded_bvhs(v0, v1, v2, n_gp)

        if banded is None:
            banded = getattr(sd, "atlas", None) is not None
        self.banded = banded
        bands = None
        if banded:
            from ..assets import texture as tex

            bands = tex.band_atlas(sd.atlas, n_gp)

        self.step = build_gp_render_step(settings, self.statics, mesh,
                                         banded=banded)

        gp_sh = NamedSharding(mesh, P("gp"))
        rep = NamedSharding(mesh, P())
        has_dp = "dp" in mesh.shape
        row_sh = NamedSharding(mesh, P("dp", None)) if has_dp else rep
        img_sh = NamedSharding(mesh, P("dp", None, None)) if has_dp else rep
        self._row_sharded, self._img_sharded = row_sh, img_sh
        self.bvhs = jax.device_put(bvhs, gp_sh)
        self.gids = jax.device_put(gids, gp_sh)
        self.row_gids = jax.device_put(row_gids, gp_sh)
        self.atlas_bands = (jax.device_put(bands, gp_sh)
                            if bands is not None else None)
        self.scene_data = jax.device_put(self.scene_data, rep)

        h, w = settings.height, settings.width
        key = jax.random.PRNGKey(seed)
        self.offsets = jax.device_put(H.make_pixel_offsets(key, h, w), row_sh)
        self.accum = jax.device_put(jnp.zeros((h, w, 3), jnp.float32), img_sh)
        self.motion = jax.device_put(jnp.zeros((h, w, 2), jnp.float32), img_sh)
        self.depth = jnp.full((h, w), 1.0e8, jnp.float32)
        self.frame_index = 0
        self._previous_camera = None
        self.skin_bundle = jax.device_put(
            getattr(scene, "skin_bundle", ()), rep)
        self._joint_matrices = jax.device_put(tuple(
            jnp.tile(jnp.eye(4, dtype=jnp.float32),
                     (scene.models[i].skin.rest_joints.shape[0], 1, 1))
            for i, _, _ in self.statics.skin_slices), rep)

    def set_joint_matrices(self, mats: tuple):
        from jax.sharding import NamedSharding

        self._joint_matrices = jax.device_put(
            mats, NamedSharding(self.mesh, P()))

    def draw(self):
        from jax.sharding import NamedSharding

        camera = T.orbit_camera(
            self.settings.width, self.settings.height,
            self.scene.camera_target, self.scene.camera_azimuth,
            self.scene.camera_elevation, self.scene.camera_distance,
            self.scene.camera_fov_degrees,
        )
        uniforms = jax.device_put(T.make_frame_uniforms(
            camera=camera,
            previous_camera=self._previous_camera or camera,
            frame_index=self.frame_index,
        ), NamedSharding(self.mesh, P()))
        self.accum, self.depth, self.motion, rays = self.step(
            self.scene_data, self.bvhs, uniforms, self.offsets, self.accum,
            self.motion, skin_bundle=self.skin_bundle,
            joint_matrices=self._joint_matrices, gids=self.gids,
            row_gids=self.row_gids, atlas_bands=self.atlas_bands,
        )
        self.last_rays_traced = rays
        self.frame_index += 1
        self._previous_camera = camera
        return self.accum
