"""Multi-chip rendering — ``shard_map`` over a device mesh.

The reference is single-GPU (SURVEY.md §2.3); this layer is the designed-from-
scratch TPU scaling story:

* **dp** (data parallel over pixels): the image's rows are sharded across the
  ``dp`` mesh axis — each chip traces its own row block against a replicated
  scene/BVH. This is the multi-chip analog of the 16x16 threadgroup grid
  (Renderer.swift:1446-1451). Bit-identical to single-chip rendering.
* **sp** (sample parallel): chips along ``sp`` trace the SAME pixels with
  disjoint Halton sample indices (decorrelated by the sample_base offset) and
  the radiance is combined with a ``psum`` mean over ICI. This multiplies
  effective samples/frame without touching the adaptive-sampling logic's
  semantics within each shard.

The frame is STAGED into three programs — prepare (replicated skinning +
refit + geometry pack), trace (shard_map, with the BVH/shade tables written
into in-program intermediates so MSA can pin them in VMEM), finish
(sharded accumulate) — the same structure the single-chip path adopted in
round 2b. The first monolithic one-program version measured **1.22 vs 5.90
Mrays/s at dp=1** on the real TPU (docs/PERF.md round 5d): folding
everything into one program cost the VMEM table placement and the
workload-sort hints, a 4.8x sharding overhead that staging removes.

Geometry transform + BVH refit are replicated per chip (cheap relative to
tracing); sharding the BVH itself (dist/geometry.py gp axis) is the
companion axis for BVHs larger than HBM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..bvh import wide
from ..core import types as T
from ..engine import scene as scene_mod
from ..render import accumulate as acc
from ..render import wavefront as wf


def make_mesh(n_devices: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % sp == 0, f"{n_devices} devices not divisible by sp={sp}"
    return Mesh(devices.reshape(n_devices // sp, sp), ("dp", "sp"))


def _check_settings(settings: T.RenderSettings, statics):
    if getattr(statics, "has_masks", False) and not (
            settings.two_level and settings.traversal_backend == "wide"):
        raise ValueError(
            "geometry masks require two_level=True (the flat wide BVH has "
            "no per-instance mask filtering)"
        )
    # priming caches are not threaded through the distributed step (hints are
    # per-frame state the DistributedRenderer doesn't carry); disable so the
    # candidate gather isn't wasted on always-empty caches
    return dataclasses.replace(settings, hit_priming=False)


def build_prepare_step(settings: T.RenderSettings, statics):
    """Replicated per-frame prepare: skinning -> world transforms -> geometry
    pack -> BVH refit. One jitted program, identical on every chip."""

    def prep(scene, bvh, skin_bundle, joint_matrices):
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
        if settings.two_level and settings.traversal_backend == "wide":
            from ..bvh import twolevel

            bvh = twolevel.refit(bvh, scene.positions_obj, scene.instance_transform)
        else:
            bvh = wide.refit(bvh, geom.tri_v0, geom.tri_v1, geom.tri_v2)
        return scene, geom, bvh

    return jax.jit(prep)


# auto-threshold mirroring Renderer.VMEM_TABLES_AUTO_MAX_BYTES: patch the
# shade/motion tables only while everything comfortably co-resides in VMEM
_VMEM_TABLES_AUTO_MAX_BYTES = 48 * 1024 * 1024


def build_trace_step(settings: T.RenderSettings, statics, mesh: Mesh):
    """shard_map'd trace program: each dp shard traces its own row block;
    sp shards trace disjoint sample windows of the same block and pmean.

    The BVH table (and, under the byte budget, the shade/motion row tables)
    are written into in-program INTERMEDIATES from tiny parameter patches —
    the renderer's round-2b trick that lets XLA's memory-space assignment
    pin them in VMEM regardless of what other programs run in the process
    (see engine/renderer._trace_tile_frame)."""
    settings = _check_settings(settings, statics)
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    h = settings.height
    assert h % dp == 0, f"height {h} not divisible by dp={dp}"
    local_h = h // dp
    sample_stride = settings.sample_stride

    def shard_fn(scene, bvh, geom, uniforms, offsets_blk, prev_motion_blk,
                 hint_blk, table_patch, geom_patch):
        dp_rank = jax.lax.axis_index("dp")
        sp_rank = jax.lax.axis_index("sp")
        y0 = dp_rank * local_h

        if table_patch is not None and hasattr(bvh, "table"):
            bvh = bvh._replace(
                table=bvh.table.at[: table_patch.shape[0]].set(table_patch))
        if geom_patch is not None:
            from ..engine.renderer import _patch_geom_rows

            geom = _patch_geom_rows(geom, geom_patch)

        # Each sp shard uses a disjoint Halton index window.
        sample_base = (uniforms.frame_index * sp + sp_rank) * sample_stride

        out = wf.trace_block(
            settings, statics, scene, bvh, geom, uniforms,
            offsets_blk, prev_motion_blk, y0=y0, sample_base=sample_base,
            step_hint=hint_blk,
        )

        # Combine samples across the sp axis (ICI collective).
        color = jax.lax.pmean(out.color, "sp")
        depth = jax.lax.pmean(out.depth, "sp")
        motion = jax.lax.pmean(out.motion, "sp")
        # workload hints: camera-ray step counts; pmax over sp is the
        # conservative (slowest-sample) prediction and the identity at sp=1
        hint = jax.lax.pmax(out.step_hint, "sp")

        # Aggregate instrumented traversal launches across the whole mesh so
        # scripts/bench_multichip.py reports the same honest ray count the
        # single-chip bench does (closest-hit + any-hit shadow actually run).
        # Per-chip totals stay < 2^24 (exact in f32); the cross-chip psum is
        # f32 because int64 silently truncates to int32 under the default
        # x64-disabled config and would overflow past ~140 chips.
        rays = jnp.sum(out.rays_traced.astype(jnp.int32))
        rays = jax.lax.psum(jax.lax.psum(rays.astype(jnp.float32), "dp"), "sp")
        return color, depth, motion, hint, rays

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("dp", None), P("dp", None, None),
                  P("dp", None), P(), P()),
        out_specs=(P("dp", None, None), P("dp", None), P("dp", None, None),
                   P("dp", None), P()),
        check_vma=False,
    )
    return jax.jit(shard)


def build_finish_step(settings: T.RenderSettings, statics, mesh: Mesh):
    """Sharded accumulate: per-pixel EMA + motion-adaptive reset, elementwise
    over the dp row blocks."""
    settings = _check_settings(settings, statics)

    def fin(uniforms, color, motion, prev_motion_blk, prev_accum_blk):
        return acc.accumulate(settings, uniforms, color, motion,
                              prev_motion_blk, prev_accum_blk)

    shard = jax.shard_map(
        fin,
        mesh=mesh,
        in_specs=(P(), P("dp", None, None), P("dp", None, None),
                  P("dp", None, None), P("dp", None, None)),
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    return jax.jit(shard)


class DistributedRenderer:
    """Multi-chip driver mirroring the single-chip Renderer's STAGED draw
    loop (prepare / trace / finish as separate programs — PERF.md round 5d).

    Keeps accumulation + workload-hint state sharded across the dp axis.
    """

    def __init__(self, scene: scene_mod.Scene, settings: T.RenderSettings, mesh: Mesh | None = None, sp: int = 1, seed: int = 0):
        from ..core import halton as H
        from ..engine.renderer import Renderer

        self.mesh = mesh if mesh is not None else make_mesh(sp=sp)
        self.scene = scene
        self.settings = settings
        self.scene_data, self.statics = scene.compile()

        # host-side initial BVH topology (shared with single-chip path)
        tmp = Renderer.__new__(Renderer)
        object.__setattr__(tmp, "_initialized", False)
        tmp.scene = scene
        tmp.scene_data = self.scene_data
        tmp.statics = self.statics
        tmp.traversal_backend = settings.traversal_backend
        tmp.two_level = settings.two_level
        Renderer._build_bvh(tmp)
        self.bvh = tmp.bvh

        self._prep = build_prepare_step(settings, self.statics)
        self._trace = build_trace_step(settings, self.statics, self.mesh)
        self._finish = build_finish_step(settings, self.statics, self.mesh)
        # Explicit shardings, committed ONCE: without them the shard_map
        # jit re-places every argument synchronously on EVERY call — the
        # dp=1 xplane showed device busy at single-chip parity (148 ns/ray)
        # under a 4.6x wall-clock stall that was pure per-call argument
        # handling (PERF.md round 5j).
        from jax.sharding import NamedSharding

        self._rep = NamedSharding(self.mesh, P())
        self._row_sharded = NamedSharding(self.mesh, P("dp", None))
        self._img_sharded = NamedSharding(self.mesh, P("dp", None, None))
        h, w = settings.height, settings.width
        key = jax.random.PRNGKey(seed)
        self.offsets = jax.device_put(
            H.make_pixel_offsets(key, h, w), self._row_sharded)
        self.accum = jax.device_put(
            jnp.zeros((h, w, 3), jnp.float32), self._img_sharded)
        self.motion = jax.device_put(
            jnp.zeros((h, w, 2), jnp.float32), self._img_sharded)
        self.depth = jnp.full((h, w), 1.0e8, jnp.float32)
        self.step_hint = jax.device_put(
            jnp.zeros((h, w), jnp.int32), self._row_sharded)
        self.frame_index = 0
        self._previous_camera: T.Camera | None = None
        self._prepare_cache = None
        self.skin_bundle = getattr(scene, "skin_bundle", ())
        # identity pose until set_joint_matrices / animation drives it
        self._joint_matrices = tuple(
            jnp.tile(jnp.eye(4, dtype=jnp.float32), (scene.models[i].skin.rest_joints.shape[0], 1, 1))
            for i, _, _ in self.statics.skin_slices
        )

    def set_joint_matrices(self, mats: tuple):
        self._joint_matrices = mats

    def draw(self):
        camera = T.orbit_camera(
            self.settings.width,
            self.settings.height,
            self.scene.camera_target,
            self.scene.camera_azimuth,
            self.scene.camera_elevation,
            self.scene.camera_distance,
            self.scene.camera_fov_degrees,
        )
        uniforms = T.make_frame_uniforms(
            camera=camera,
            previous_camera=self._previous_camera or camera,
            frame_index=self.frame_index,
        )
        # clean-frame prepare skip, keyed by input identity (same idiom as
        # Renderer._draw_staged; skinned scenes churn identity and miss)
        leaves = tuple(jax.tree_util.tree_leaves(
            (self.scene_data, self.bvh, self.skin_bundle, self._joint_matrices)))
        cache = self._prepare_cache
        if (cache is not None and len(cache[0]) == len(leaves)
                and all(a is b for a, b in zip(cache[0], leaves))):
            scene2, geom, bvh2 = cache[1]
        else:
            scene2, geom, bvh2 = self._prep(
                self.scene_data, self.bvh, self.skin_bundle,
                self._joint_matrices)
            # commit the replicated trace inputs to an explicit sharding so
            # repeated _trace calls never re-place them
            scene2, geom, bvh2 = jax.device_put(
                (scene2, geom, bvh2), self._rep)
            self._prepare_cache = (leaves, (scene2, geom, bvh2))

        table_patch = bvh2.table[:8] if hasattr(bvh2, "table") else None
        geom_patch = None
        if hasattr(bvh2, "table"):
            total = (bvh2.table.size + geom.shade_rows.size
                     + geom.motion_rows.size) * 4
            if total <= _VMEM_TABLES_AUTO_MAX_BYTES:
                geom_patch = (geom.shade_rows[:1], geom.motion_rows[:1])

        uniforms = jax.device_put(uniforms, self._rep)
        color, depth, motion, hint, rays = self._trace(
            scene2, bvh2, geom, uniforms, self.offsets, self.motion,
            self.step_hint, table_patch, geom_patch,
        )
        self.accum = self._finish(uniforms, color, motion, self.motion,
                                  self.accum)
        self.depth = depth
        self.motion = motion
        self.step_hint = hint
        self.last_rays_traced = rays
        if self.statics.skin_slices:
            self.scene_data = self.scene_data._replace(
                positions_obj=scene2.positions_obj,
                prev_positions_obj=scene2.positions_obj,
            )
        self.frame_index += 1
        self._previous_camera = camera
        return self.accum
