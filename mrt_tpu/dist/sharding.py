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

Geometry transform + BVH refit are replicated per chip (cheap relative to
tracing); sharding the BVH itself (ray-queue ring exchange for BVHs larger
than HBM, SURVEY.md §5.7) is the planned extension.
"""

from __future__ import annotations


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


def build_render_step(settings: T.RenderSettings, statics, mesh: Mesh):
    """Returns a jitted distributed frame step:

    step(scene, bvh, uniforms, offsets (H,W), prev_accum (H,W,3),
         prev_motion (H,W,2)) -> (accum, depth, motion)

    Row dimension must be divisible by the dp axis size.
    """
    if getattr(statics, "has_masks", False) and not (
            settings.two_level and settings.traversal_backend == "wide"):
        raise ValueError(
            "geometry masks require two_level=True (the flat wide BVH has "
            "no per-instance mask filtering)"
        )
    import dataclasses

    # priming caches are not threaded through the distributed step (hints are
    # per-frame state the DistributedRenderer doesn't carry); disable so the
    # candidate gather isn't wasted on always-empty caches
    settings = dataclasses.replace(settings, hit_priming=False)
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    h = settings.height
    assert h % dp == 0, f"height {h} not divisible by dp={dp}"
    local_h = h // dp
    sample_stride = settings.sample_stride

    def shard_fn(scene, bvh, uniforms, offsets_blk, prev_accum_blk, prev_motion_blk,
                 skin_bundle, joint_matrices):
        dp_rank = jax.lax.axis_index("dp")
        sp_rank = jax.lax.axis_index("sp")
        y0 = dp_rank * local_h

        # Replicated per chip: skinning (MXU matmul) + transforms + BVH refit.
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

        # Each sp shard uses a disjoint Halton index window.
        sample_base = (uniforms.frame_index * sp + sp_rank) * sample_stride

        out = wf.trace_block(
            settings, statics, scene, bvh, geom, uniforms,
            offsets_blk, prev_motion_blk, y0=y0, sample_base=sample_base,
        )

        # Combine samples across the sp axis (ICI collective).
        color = jax.lax.pmean(out.color, "sp")
        depth = jax.lax.pmean(out.depth, "sp")
        motion = jax.lax.pmean(out.motion, "sp")

        # Aggregate instrumented traversal launches across the whole mesh so
        # scripts/bench_multichip.py reports the same honest ray count the
        # single-chip bench does (closest-hit + any-hit shadow actually run).
        rays = jnp.sum(out.rays_traced.astype(jnp.int64))
        rays = jax.lax.psum(jax.lax.psum(rays, "dp"), "sp")

        accum = acc.accumulate(settings, uniforms, color, motion, prev_motion_blk, prev_accum_blk)
        return accum, depth, motion, scene.positions_obj, rays

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp", None), P("dp", None, None), P("dp", None, None), P(), P()),
        out_specs=(P("dp", None, None), P("dp", None), P("dp", None, None), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)


class DistributedRenderer:
    """Thin multi-chip driver mirroring the single-chip Renderer's draw loop.

    Wraps a compiled scene + mesh; keeps accumulation state sharded across
    the dp axis.
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

        self.step = build_render_step(settings, self.statics, self.mesh)
        h, w = settings.height, settings.width
        key = jax.random.PRNGKey(seed)
        self.offsets = H.make_pixel_offsets(key, h, w)
        self.accum = jnp.zeros((h, w, 3), jnp.float32)
        self.motion = jnp.zeros((h, w, 2), jnp.float32)
        self.depth = jnp.full((h, w), 1.0e8, jnp.float32)
        self.frame_index = 0
        self._previous_camera: T.Camera | None = None
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
        self.accum, self.depth, self.motion, skinned_pos, rays = self.step(
            self.scene_data, self.bvh, uniforms, self.offsets, self.accum, self.motion,
            self.skin_bundle, self._joint_matrices,
        )
        self.last_rays_traced = rays
        if self.statics.skin_slices:
            self.scene_data = self.scene_data._replace(
                positions_obj=skinned_pos, prev_positions_obj=skinned_pos
            )
        self.frame_index += 1
        self._previous_camera = camera
        return self.accum
