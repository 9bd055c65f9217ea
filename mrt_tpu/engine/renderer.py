"""Renderer — the frame-loop orchestrator, TPU analog of ``Renderer.swift``.

Owns the compiled scene, the BVH, the accumulation state, and ~25 tunable
properties mirroring Renderer.swift:52-197. Every quality-affecting property
assignment restarts temporal accumulation (``frame_index = 0``) — the
reference's universal cache-invalidation idiom (``didSet { frameIndex = 0 }``,
SURVEY.md §3.5).

The per-frame hot path is ONE jitted function (``_render_frame``): instance
transform application (batched matmul) -> BVH refit -> wavefront trace over
pixel tiles -> temporal accumulation. The reference's 3-frames-in-flight
pipelining (Renderer.swift:207,1406-1409) maps to JAX async dispatch: draw()
returns device arrays without blocking; only image readback syncs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh import wide
from ..core import halton as H
from ..core import types as T
from ..render import accumulate as acc
from ..render import wavefront as wf
from . import scene as scene_mod

# Properties whose change invalidates accumulated history
# (Renderer.swift:52-197 didSet { frameIndex = 0 }).
_RESET_PROPS = {
    "samples_per_pixel",
    "max_bounces",
    "use_mipmaps",
    "light_sampling",
    "accumulation_weight",
    "use_motion_adaptive_accumulation",
    "motion_accumulation_min_weight",
    "motion_accumulation_low_threshold_pixels",
    "motion_accumulation_high_threshold_pixels",
    "use_motion_adaptive_sampling",
    "motion_sampling_max_extra_samples",
    "motion_sampling_low_threshold_pixels",
    "motion_sampling_high_threshold_pixels",
    "shading_mode",
    "debug_texture_mode",
    "render_scale",
    "upscaler_mode",
    "camera_fov_degrees",
    "view_mode",  # Renderer.swift:928-932
}

UPSCALER_OFF = "off"
UPSCALER_SPATIAL = "spatial"  # default on (Renderer.swift:52-60 + SURVEY §5.6)
UPSCALER_TEMPORAL = "temporal"
UPSCALER_DENOISED = "denoised"

VIEW_MODE_WORLD = "world"
VIEW_MODE_TPS = "tps"


def _prepare(settings, statics, scene, bvh, skin_bundle=(), joint_matrices=()):
    """Skinning -> world transforms -> packed geometry -> BVH refit: the
    per-frame geometry stage shared by the monolithic and staged paths."""
    # --- skinning: dense-weights matmul per skinned model (skinningKernel
    # analog, Skinning.metal:7-49) + scatter into the vertex pool ------------
    if statics.skin_slices:
        from ..skinning import lbs

        pos_obj = scene.positions_obj
        nrm_obj = scene.normals_obj
        for k, (_, start, _count) in enumerate(statics.skin_slices):
            sp, sn = lbs.skin(
                skin_bundle[k].weights_dense,
                joint_matrices[k],
                skin_bundle[k].rest_positions,
                skin_bundle[k].rest_normals,
            )
            pos_obj = jax.lax.dynamic_update_slice(pos_obj, sp, (start, 0))
            nrm_obj = jax.lax.dynamic_update_slice(nrm_obj, sn, (start, 0))
        scene = scene._replace(positions_obj=pos_obj, normals_obj=nrm_obj)

    # named scopes show up in jax.profiler traces — the analog of the
    # reference labeling every encoder for Xcode GPU capture (SURVEY.md §5.1)
    with jax.named_scope("world_transform"):
        pos_w, prev_w, nrm_w = scene_mod.world_geometry(scene)
        geom = wf.build_geometry(scene, pos_w, prev_w, nrm_w)
    with jax.named_scope("bvh_refit"):
        if settings.two_level and settings.traversal_backend == "wide":
            # per-frame update touches only skinned BLASes + instance/TLAS
            # rows; static geometry is never re-refit (Renderer.swift:1084-1202)
            from ..bvh import twolevel

            bvh = twolevel.refit(bvh, scene.positions_obj, scene.instance_transform)
        else:
            bvh = wide.refit(bvh, geom.tri_v0, geom.tri_v1, geom.tri_v2)
    return scene, geom, bvh


@partial(jax.jit, static_argnums=(0, 1))
def _prepare_frame(settings, statics, scene, bvh, skin_bundle=(), joint_matrices=()):
    """Staged-path stage 1 as its own program (see Renderer.draw)."""
    return _prepare(settings, statics, scene, bvh, skin_bundle, joint_matrices)


@partial(jax.jit, static_argnums=(0, 1))
def _trace_tile_frame(settings, statics, scene, bvh, geom, uniforms,
                      px, py, offs, pmot, pp, ps, hint, table_patch=None):
    """Staged-path stage 2: trace ONE fixed-size pixel tile as its own
    program, with the BVH table forced to be an in-program INTERMEDIATE.

    Rationale (docs/PERF.md round 2b): XLA serves gathers from a VMEM-placed
    table at ~0.03-0.13 ns/row vs ~18 ns from HBM. A table passed as a plain
    program *parameter* only gets VMEM via cross-program prefetch, which any
    other executable in the process evicts permanently (and a frame runs
    prepare/accumulate/upscale programs too). Memory-space assignment of an
    in-program intermediate is compile-time static and immune — so we write
    ``table_patch`` (== table[:8], computed by the caller) back into the
    table inside the program. XLA cannot fold the write (the patch is a
    separate parameter), so the traversal consumes a fresh intermediate that
    MSA may pin in VMEM."""
    if table_patch is not None:
        bvh = bvh._replace(table=bvh.table.at[: table_patch.shape[0]].set(table_patch))
    with jax.named_scope("trace"):
        return wf.trace_tile(settings, statics, scene, bvh, geom, uniforms,
                             px, py, offs, pmot, prime_primary=pp, prime_shadow=ps,
                             step_hint=hint)


def _patch_geom_rows(geom, geom_patch):
    """Rewrite the shade/motion tables into in-program INTERMEDIATES (same
    mechanism as the BVH table_patch): without this, XLA re-stages the full
    shade table into VMEM as 4 async slices EVERY BOUNCE to serve the
    per-hit gathers (341 ms of DMA per 3-frame capture, 45%-busy engines —
    docs/PERF.md round 2i); an MSA-placed intermediate is staged once per
    program."""
    if geom_patch is None:
        return geom
    s_head, m_head = geom_patch
    return geom._replace(
        shade_rows=geom.shade_rows.at[: s_head.shape[0]].set(s_head),
        motion_rows=geom.motion_rows.at[: m_head.shape[0]].set(m_head),
    )


@partial(jax.jit, static_argnums=(0, 1))
def _trace_all_tiles_frame(settings, statics, scene, bvh, geom, uniforms,
                           offsets, prev_motion, pp, ps, hint, table_patch=None,
                           geom_patch=None):
    """Staged-path stage 2 (tile-loop variant): trace EVERY tile inside ONE
    program (``trace_block``'s lax.map over fixed-size tiles), with the same
    in-program table-intermediate trick as ``_trace_tile_frame``.

    Why: each program launch costs ~60-70 ms wall on the axon tunnel
    regardless of device work (docs/PERF.md round 2e: 512^2 device-busy
    ~9 ms/tile vs 78 ms/tile wall) — the per-tile host loop made the 1080p
    flagship frame (63 tiles) dispatch-latency-bound. Keeping the program
    trace-only preserves the VMEM table placement the monolithic frame
    program lost."""
    if table_patch is not None and hasattr(bvh, "table"):
        bvh = bvh._replace(table=bvh.table.at[: table_patch.shape[0]].set(table_patch))
    geom = _patch_geom_rows(geom, geom_patch)
    with jax.named_scope("trace"):
        out = wf.trace_block(settings, statics, scene, bvh, geom, uniforms,
                             offsets, prev_motion,
                             prime_primary=pp, prime_shadow=ps, step_hint=hint)
    # ray-counter reduction INSIDE the program: an eager jnp.sum after the
    # launch is its own ~60-70 ms dispatch on the axon tunnel
    return out, jnp.sum(out.rays_traced.astype(jnp.int64))


@partial(jax.jit, static_argnums=(0,))
def _finish_frame(settings, uniforms, color, motion, prev_motion, prev_accum):
    """Staged-path stage 3: temporal accumulation."""
    with jax.named_scope("accumulate"):
        return acc.accumulate(settings, uniforms, color, motion, prev_motion, prev_accum)


@partial(jax.jit, static_argnums=(0, 1))
def _render_frame(settings, statics, scene, bvh, uniforms, offsets, prev_accum, prev_motion,
                  skin_bundle=(), joint_matrices=(), prime_primary=None, prime_shadow=None,
                  step_hint=None):
    """One frame: skinning -> transforms -> refit -> trace tiles -> accumulate.

    offsets: (H,W) int32; prev_accum: (H,W,3); prev_motion: (H,W,2).
    skin_bundle/joint_matrices: per-skinned-model SkinModelData and (J,4,4)
    final matrices (statics.skin_slices gives their vertex slices).
    Returns (accum, depth, motion, gbuffer dict, skinned positions_obj).
    """
    scene, geom, bvh = _prepare(settings, statics, scene, bvh, skin_bundle, joint_matrices)

    with jax.named_scope("trace"):
        out = wf.trace_block(
            settings, statics, scene, bvh, geom, uniforms, offsets, prev_motion,
            prime_primary=prime_primary, prime_shadow=prime_shadow,
            step_hint=step_hint,
        )

    with jax.named_scope("accumulate"):
        accum = acc.accumulate(settings, uniforms, out.color, out.motion, prev_motion, prev_accum)
    rays_traced = jnp.sum(out.rays_traced.astype(jnp.int64))

    gbuffer = None
    if settings.enable_gbuffer:
        gbuffer = dict(
            diffuse_albedo=out.diffuse_albedo,
            specular_albedo=out.specular_albedo,
            normal=out.normal,
            roughness=out.roughness,
        )
    return (accum, out.depth, out.motion, gbuffer, scene.positions_obj, rays_traced,
            out.prime_primary, out.prime_shadow, out.step_hint)


class FrameStats:
    """Per-stage timing / throughput report (SURVEY.md §5.1: the framework's
    replacement for Xcode GPU capture — rays/s, frame times, EMA fps).

    Timing is wall-clock between draw() calls; JAX dispatch is async, so
    blocking=True in report() syncs the device first.
    """

    def __init__(self, ema: float = 0.9):
        import time as _time

        self._time = _time
        self.ema = ema
        self.frame_ms = None
        self.frames = 0
        self._last = None
        self._pending_rays = None
        self._deferred = []  # pending per-frame device scalars
        self._deferred_vecs = []  # collapsed fixed-shape (1024,) vectors
        self.total_rays = 0

    def record(self, rays_traced):
        now = self._time.perf_counter()
        # defer the int() readback to report(): ONE device->host transfer
        # permanently poisons axon dispatch ~300x (docs/PERF.md round 2j),
        # so the frame loop must never read device scalars back
        if self._pending_rays is not None:
            self._deferred.append(self._pending_rays)
            if len(self._deferred) >= 1024:
                # bound the live-buffer count for long interactive sessions:
                # one FIXED-SHAPE (1024,) stack per 1024 frames (cached
                # executable), still zero D2H. Keep the counters as vectors —
                # no device jnp.sum: a device-side int32 total wraps after
                # ~60 1080p frames (x64 is never enabled); report() sums
                # exactly on host in int64.
                import jax.numpy as _jnp

                self._deferred_vecs.append(_jnp.stack(self._deferred))
                self._deferred = []
        self._pending_rays = rays_traced
        if self._last is not None:
            dt_ms = (now - self._last) * 1e3
            self.frame_ms = dt_ms if self.frame_ms is None else self.ema * self.frame_ms + (1 - self.ema) * dt_ms
        self._last = now
        self.frames += 1

    def report(self) -> dict:
        if self._pending_rays is not None:
            self._deferred.append(self._pending_rays)
            self._pending_rays = None
        if self._deferred or self._deferred_vecs:
            # D2H the counter vectors, then an exact int64 host sum — a
            # device-side int32 total wraps after ~2^31 rays (~60 frames at
            # 1080p 2spp; jax x64 is never enabled here)
            import numpy as _np

            total = 0
            for v in self._deferred_vecs:
                total += int(_np.asarray(v).astype(_np.int64).sum())
            if self._deferred:
                # one stacked D2H for the residual scalars, not one each
                import jax.numpy as _jnp

                tail = _np.asarray(_jnp.stack(self._deferred))
                total += int(tail.astype(_np.int64).sum())
            self.total_rays += total
            self._deferred.clear()
            self._deferred_vecs.clear()
        fps = 1000.0 / self.frame_ms if self.frame_ms else 0.0
        mrays = (self.total_rays / max(self.frames - 1, 1)) * fps / 1e6 if fps else 0.0
        return dict(
            frames=self.frames,
            frame_ms=round(self.frame_ms, 3) if self.frame_ms else None,
            fps=round(fps, 2),
            total_rays=self.total_rays,
            mrays_per_s=round(mrays, 3),
        )


class Renderer:
    """Interactive progressive renderer over a compiled scene."""

    def __init__(
        self,
        scene: scene_mod.Scene,
        output_width: int = 512,
        output_height: int = 512,
        seed: int = 0,
    ):
        object.__setattr__(self, "_initialized", False)
        self.scene = scene
        self.output_width = output_width
        self.output_height = output_height

        # --- tunables (defaults from Renderer.swift:52-197) -------------------
        self.render_scale = 0.67
        self.upscaler_mode = UPSCALER_SPATIAL
        self.samples_per_pixel = 2
        self.max_bounces = 2
        self.accumulation_weight = 0.9
        self.use_motion_adaptive_accumulation = True
        self.motion_accumulation_min_weight = 0.1
        self.motion_accumulation_low_threshold_pixels = 0.5
        self.motion_accumulation_high_threshold_pixels = 4.0
        self.use_motion_adaptive_sampling = True
        self.motion_sampling_max_extra_samples = 2
        self.motion_sampling_low_threshold_pixels = 1.0
        self.motion_sampling_high_threshold_pixels = 6.0
        self.shading_mode = T.SHADING_MODE_PBR
        self.debug_texture_mode = T.DEBUG_MODE_NONE
        # execution-strategy knobs (defaults from core.types.RenderSettings)
        self.tile_pixels = T.RenderSettings.tile_pixels
        self.traversal_chunks = T.RenderSettings.traversal_chunks
        self.traversal_unroll = T.RenderSettings.traversal_unroll
        self.persistent_samples = T.RenderSettings.persistent_samples
        self.sort_shadow_rays = T.RenderSettings.sort_shadow_rays
        self.sort_rays = T.RenderSettings.sort_rays
        self.workload_sort = T.RenderSettings.workload_sort
        self.traversal_backend = T.RenderSettings.traversal_backend
        self.hit_priming = T.RenderSettings.hit_priming
        self.two_level = T.RenderSettings.two_level
        self.traversal_stream = T.RenderSettings.traversal_stream
        self.stream_refill = T.RenderSettings.stream_refill
        # None = auto: fuse only while the BVH stays comfortably VMEM-
        # placeable alongside the fused batch's doubled lane state. Measured
        # (docs/PERF.md round 2e): fused wins at the 8 MB flagship table
        # (3.84 vs 3.58 Mrays/s) but LOSES 2.4x at the 65 MB dragon_1m table
        # (1.12 vs 2.74) — the wider batch evicts the table from VMEM.
        self.fuse_shadow_rays = None
        self.use_mipmaps = T.RenderSettings.use_mipmaps
        self.light_sampling = T.RenderSettings.light_sampling
        # staged execution: prepare / per-tile trace / accumulate as separate
        # programs (VMEM table placement; docs/PERF.md round 2b). The
        # monolithic _render_frame path remains for dist wrappers + fallback.
        self.staged_frame = True
        # staged stage-2 as ONE program looping all tiles in-program
        # (lax.map) instead of a host loop of per-tile launches — each
        # launch costs ~60-70 ms wall on the axon tunnel (PERF.md round 2e)
        self.tile_program_loop = True
        # rewrite the table into an in-program intermediate in the staged
        # trace program so MSA can pin it in VMEM (docs/PERF.md round 2b)
        self.vmem_table = True
        # pin the shade/motion tables in VMEM the same way (None = auto by
        # total table bytes; see _patch_geom_rows)
        self.vmem_shade_tables = None

        # camera state (Renderer.swift orbit params; seeded from the scene)
        self.view_mode = VIEW_MODE_WORLD
        self.player_model_index = 0
        self.camera_target = np.asarray(scene.camera_target, np.float32)
        self.camera_azimuth = scene.camera_azimuth
        self.camera_elevation = scene.camera_elevation
        self.camera_distance = scene.camera_distance
        self.camera_fov_degrees = scene.camera_fov_degrees
        self.min_camera_distance = 1.5  # Renderer.swift:224
        self.max_camera_distance = 50.0  # Renderer.swift:225
        self.camera_elevation_limit = np.pi / 2 - 0.01  # Renderer.swift:226

        self.frame_index = 0
        self._previous_camera: T.Camera | None = None
        self._key = jax.random.PRNGKey(seed)

        # animation / skinning clock (60 Hz throttle with catch-up,
        # SkinningPass.swift:288-312)
        self.skinning_delta_time = 1.0 / 60.0
        self._scene_time = 0.0
        self._last_skinning_update = None
        self._joint_matrices: tuple = ()
        self.stats = FrameStats()

        # --- compile scene -----------------------------------------------------
        self.scene_data, self.statics = scene.compile()
        self._build_bvh()
        self._allocate_state()
        object.__setattr__(self, "_initialized", True)

    # -- accumulation-reset idiom ----------------------------------------------
    def __setattr__(self, name, value):
        old = getattr(self, name, None)
        changed = old is not value
        object.__setattr__(self, name, value)
        if getattr(self, "_initialized", False):
            if name in _RESET_PROPS:
                object.__setattr__(self, "frame_index", 0)
                self._clear_presenter_history()
            if name == "frame_index" and value == 0:
                # direct resets (orbit/zoom/presets) also invalidate the
                # presenter's output-res history — stale history ghosts
                self._clear_presenter_history()
            if name in ("traversal_backend", "two_level") and changed:
                try:
                    self._build_bvh()
                except Exception:
                    # invalid backend switch (unknown backend, masked scene on
                    # a mask-less backend): restore the old value so the
                    # renderer stays consistent (bvh still matches settings)
                    object.__setattr__(self, name, old)
                    raise
                object.__setattr__(self, "frame_index", 0)
                self._clear_presenter_history()

    def _clear_presenter_history(self):
        """Drop output-res upscale history + denoiser temporal state; they
        are rebuilt from scratch on the next present()."""
        object.__setattr__(self, "_upscale_history", None)
        object.__setattr__(self, "_denoise_state", None)

    # -- sizes -------------------------------------------------------------------
    @property
    def render_width(self) -> int:
        scale = self.render_scale if self.upscaler_mode != UPSCALER_OFF else 1.0
        return max(1, int(round(self.output_width * scale)))

    @property
    def render_height(self) -> int:
        scale = self.render_scale if self.upscaler_mode != UPSCALER_OFF else 1.0
        return max(1, int(round(self.output_height * scale)))

    # Auto-fuse threshold: total BVH bytes above which the fused 2P mixed
    # batch costs the table its VMEM placement (capability-probe seam, the
    # analog of the reference's Metal4-vs-legacy probe, Renderer.swift:299).
    FUSE_AUTO_MAX_BVH_BYTES = 24 << 20

    # Auto threshold for pinning the shade+motion tables in VMEM alongside
    # the BVH table (combined bytes; v5e VMEM is 128 MB and the tile/lane
    # state needs headroom).
    VMEM_TABLES_AUTO_MAX_BYTES = 64 << 20

    def _resolve_fuse(self) -> bool:
        if self.fuse_shadow_rays is not None:
            return bool(self.fuse_shadow_rays)
        if self.hit_priming:
            # the fused mixed batch has no priming seed path; an explicit
            # priming request wins over auto-fuse
            return False
        bvh = getattr(self, "bvh", None)
        if bvh is None:
            return True
        nbytes = sum(
            getattr(x, "nbytes", 0) for x in jax.tree_util.tree_leaves(bvh)
        )
        return nbytes <= self.FUSE_AUTO_MAX_BVH_BYTES

    def settings(self) -> T.RenderSettings:
        return T.RenderSettings(
            width=self.render_width,
            height=self.render_height,
            samples_per_pixel=self.samples_per_pixel,
            max_bounces=self.max_bounces,
            shading_mode=self.shading_mode,
            debug_mode=self.debug_texture_mode,
            enable_gbuffer=self.upscaler_mode == UPSCALER_DENOISED,
            enable_motion_adaptive_sampling=self.use_motion_adaptive_sampling,
            motion_sampling_max_extra_samples=self.motion_sampling_max_extra_samples,
            enable_motion_adaptive_accumulation=self.use_motion_adaptive_accumulation,
            tile_pixels=self.tile_pixels,
            traversal_chunks=self.traversal_chunks,
            traversal_unroll=self.traversal_unroll,
            persistent_samples=self.persistent_samples,
            sort_shadow_rays=self.sort_shadow_rays,
            sort_rays=self.sort_rays,
            workload_sort=self.workload_sort,
            traversal_backend=self.traversal_backend,
            hit_priming=self.hit_priming,
            two_level=self.two_level,
            traversal_stream=self.traversal_stream,
            stream_refill=self.stream_refill,
            fuse_shadow_rays=self._resolve_fuse(),
            use_mipmaps=self.use_mipmaps,
            light_sampling=self.light_sampling,
        )

    # -- state -------------------------------------------------------------------
    def _allocate_state(self):
        """createTextures analog (Renderer.swift:676-804): accumulation pair,
        random offsets, depth/motion at render scale."""
        h, w = self.render_height, self.render_width
        self._key, sub = jax.random.split(self._key)
        self.offsets = H.make_pixel_offsets(sub, h, w)
        self.accum = jnp.zeros((h, w, 3), jnp.float32)
        self.motion = jnp.zeros((h, w, 2), jnp.float32)
        self.depth = jnp.full((h, w), 1.0e8, jnp.float32)
        self.gbuffer = None
        # hit/occluder priming caches: hints, not history — they are
        # re-verified every frame, so they survive accumulation resets
        self.prime_primary = jnp.full((h, w), -1, jnp.int32)
        self.prime_shadow = jnp.full((h, w), -1, jnp.int32)
        # workload-predictive sort hint: previous frame's per-pixel camera
        # traversal step counts (a hint, not history — survives resets)
        self.step_hint = jnp.zeros((h, w), jnp.int32)
        self._state_size = (h, w)
        self.frame_index = 0

    def _build_bvh(self):
        """Initial world-space BVH topology (host Karras build). Refit runs in
        the jitted step every frame; call this again after large moves
        (rebuild fallback, Renderer.swift:1141-1167)."""
        if self.traversal_backend != "wide":
            raise ValueError(
                f"unknown traversal_backend {self.traversal_backend!r}: only "
                "'wide' exists (the cluster/packet alternates were retired in "
                "round 3 — docs/PERF.md)"
            )
        nondefault_masks = any(
            getattr(m, "geometry_mask", T.GEOMETRY_MASK_GEOMETRY) != T.GEOMETRY_MASK_GEOMETRY
            for m in getattr(self.scene, "models", [])
        )
        if nondefault_masks and not (self.two_level and self.traversal_backend == "wide"):
            raise ValueError(
                "geometry masks require the two-level traversal backend "
                "(two_level=True, traversal_backend='wide'); the flat/cluster "
                "backends have no per-instance mask filtering"
            )
        scene = self.scene_data
        # host mirrors from Scene.compile — np.asarray on the SceneData
        # device arrays would be device->host readbacks, and ONE readback
        # permanently poisons axon dispatch ~300x (docs/PERF.md round 2j)
        host = getattr(self.scene, "host_mirror", None)
        if self.two_level:
            from ..bvh import twolevel

            self.bvh = twolevel.build(
                self.scene.models, self.scene_data, self.statics.skin_slices,
                host_mirror=host,
            )
            return
        # flat wide path: world-space triangles on host (the two-level path
        # never needs this per-vertex einsum — keep it off the default rebuild)
        if host is not None:
            pos = host["positions"]
            vinst, idx = host["vertex_instance"], host["indices"]
            # transforms come from the LIVE Model objects, not the compile-
            # time mirror: rebuild_bvh's whole purpose is repairing tree
            # quality after large moves, so it must see the CURRENT pose
            # (host-side numpy — still no D2H)
            transforms = np.asarray(self.scene.instance_transforms())
        else:  # dist/test wrappers that hand-build SceneData
            transforms = np.asarray(scene.instance_transform)
            pos = np.asarray(scene.positions_obj)
            vinst = np.asarray(scene.vertex_instance)
            idx = np.asarray(scene.indices)
        M = transforms[vinst]
        pos_w = np.einsum("vij,vj->vi", M[:, :3, :3], pos) + M[:, :3, 3]
        self.bvh = wide.build(pos_w[idx[:, 0]], pos_w[idx[:, 1]], pos_w[idx[:, 2]])

    def rebuild_bvh(self):
        """Rebuild BVH topology from the CURRENT instance transforms.

        Rest-pose topology assumption: with a ``host_mirror`` the vertex
        positions are the compile-time rest pose — skinned deformation is
        NOT applied host-side (that would need a host LBS pass; per-frame
        device refit keeps the bounds correct regardless). For heavily
        deformed skinned scenes the tree SHAPE can therefore be stale,
        degrading traversal quality but never correctness. The reference
        has the same split: compacted static BLAS vs refit-only skinned
        BLAS (Renderer.swift:464-606, 1141-1167)."""
        self._build_bvh()

    # -- camera controls (Renderer.swift:1327-1371) -------------------------------
    def orbit(self, delta_x: float, delta_y: float):
        if self.view_mode == VIEW_MODE_TPS:
            return
        sensitivity = 0.005
        self.camera_azimuth += delta_x * sensitivity
        self.camera_elevation = self._clamp_elevation(self.camera_elevation + delta_y * sensitivity)
        self.frame_index = 0

    def zoom(self, delta: float):
        scale = max(0.1, 1.0 - delta)
        self.camera_distance = float(
            np.clip(self.camera_distance * scale, self.min_camera_distance, self.max_camera_distance)
        )
        self.frame_index = 0

    def apply_view_preset(self, preset: str):
        iso_elevation = float(np.arcsin(1.0 / np.sqrt(3.0)))
        if preset == "free":
            return
        elif preset == "front":
            self.camera_azimuth = 0.0
        elif preset == "back":
            self.camera_azimuth = np.pi
        elif preset == "left":
            self.camera_azimuth = -np.pi / 2
        elif preset == "right":
            self.camera_azimuth = np.pi / 2
        elif preset == "top":
            self.camera_elevation = self.camera_elevation_limit
        elif preset == "bottom":
            self.camera_elevation = -self.camera_elevation_limit
        elif preset == "isometric":
            self.camera_azimuth = np.pi / 4
            self.camera_elevation = iso_elevation
        self.camera_elevation = self._clamp_elevation(self.camera_elevation)
        self.frame_index = 0

    def _clamp_elevation(self, v: float) -> float:
        return float(np.clip(v, -self.camera_elevation_limit, self.camera_elevation_limit))

    def current_camera(self) -> T.Camera:
        if self.view_mode == VIEW_MODE_TPS and self.player_model_index < len(self.scene.models):
            player = self.scene.models[self.player_model_index]
            target = player.position + np.array([0, 1.0, 0], np.float32)
        else:
            target = np.zeros(3, np.float32)
        self.camera_target = target
        return T.orbit_camera(
            self.render_width,
            self.render_height,
            target,
            self.camera_azimuth,
            self.camera_elevation,
            self.camera_distance,
            self.camera_fov_degrees,
        )

    # -- scene sync ----------------------------------------------------------------
    def _sync_scene(self):
        """Propagate host-side scene changes (moveModel etc.) into device
        transforms, keeping the previous frame's for motion vectors
        (updateInstanceDescriptors, Renderer.swift:937-973)."""
        prev = self.scene_data.instance_transform
        if self.scene.is_dirty:
            new = jnp.asarray(self.scene.instance_transforms())
            self.scene_data = self.scene_data._replace(
                instance_transform=new,
                prev_instance_transform=prev,
                lights=self.scene.lights,
            )
            self.scene.is_dirty = False
        else:
            self.scene_data = self.scene_data._replace(prev_instance_transform=prev)

    # -- frame loop ------------------------------------------------------------------
    def draw(self, delta_time: float | None = None):
        """Render one frame (draw(in:) analog, Renderer.swift:1405-1503).
        Returns the accumulation buffer (pre-tonemap, render scale).

        delta_time: wall-clock seconds since last draw for animation stepping;
        defaults to 1/60 (the display-link cadence)."""
        if self._state_size != (self.render_height, self.render_width):
            self._allocate_state()

        self._sync_scene()
        self._update_animation(delta_time)

        camera = self.current_camera()
        previous_camera = self._previous_camera or camera
        uniforms = T.make_frame_uniforms(
            camera=camera,
            previous_camera=previous_camera,
            frame_index=self.frame_index,
            accumulation_weight=self.accumulation_weight,
            motion_accum_min_weight=self.motion_accumulation_min_weight,
            motion_accum_low_px=self.motion_accumulation_low_threshold_pixels,
            motion_accum_high_px=self.motion_accumulation_high_threshold_pixels,
            motion_sampling_low_px=self.motion_sampling_low_threshold_pixels,
            motion_sampling_high_px=self.motion_sampling_high_threshold_pixels,
        )

        if self.staged_frame:
            (accum, depth, motion, gbuffer, skinned_pos, rays_traced,
             prime_primary, prime_shadow, step_hint) = self._draw_staged(uniforms)
        else:
            (accum, depth, motion, gbuffer, skinned_pos, rays_traced,
             prime_primary, prime_shadow, step_hint) = _render_frame(
                self.settings(),
                self.statics,
                self.scene_data,
                self.bvh,
                uniforms,
                self.offsets,
                self.accum,
                self.motion,
                getattr(self.scene, "skin_bundle", ()),
                self._joint_matrices,
                self.prime_primary,
                self.prime_shadow,
                self.step_hint,
            )
        self.accum, self.depth, self.motion, self.gbuffer = accum, depth, motion, gbuffer
        self.prime_primary, self.prime_shadow = prime_primary, prime_shadow
        self.step_hint = step_hint
        self.last_rays_traced = rays_traced  # device scalar; int() to read
        self.stats.record(rays_traced)
        if self.statics.skin_slices:
            # this frame's skinned pose becomes next frame's previous pose
            # (prev-position copy, Renderer.swift:1289-1303)
            self.scene_data = self.scene_data._replace(
                positions_obj=skinned_pos, prev_positions_obj=skinned_pos
            )
        object.__setattr__(self, "frame_index", self.frame_index + 1)
        self._previous_camera = camera
        return accum

    def _draw_staged(self, uniforms):
        """Staged frame: prepare / per-tile trace / accumulate as SEPARATE
        programs with a host loop over tiles. Same semantics as
        ``_render_frame``; measured ~2x faster because XLA's memory-space
        assignment keeps the BVH table VMEM-resident in the isolated trace
        program (docs/PERF.md round 2b). Dispatch overhead is ~n_tiles
        async launches per frame."""
        settings = self.settings()
        statics = self.statics
        skin_bundle = getattr(self.scene, "skin_bundle", ())
        # Clean-frame skip: prepare (skinning -> transforms -> refit ->
        # geometry pack) is a pure function of the arrays below; when none
        # changed since last frame, reuse its outputs instead of re-running
        # the program (the reference likewise skips skinning/refit when the
        # scene is not dirty, SkinningPass.swift:288-312). Keyed by object
        # IDENTITY of every input leaf; the cache holds strong references to
        # the keyed objects so identity cannot be recycled. Skinned scenes
        # churn positions_obj identity each frame and simply miss (= status
        # quo behavior).
        leaves = tuple(jax.tree_util.tree_leaves(
            (self.scene_data, self.bvh, skin_bundle, self._joint_matrices)))
        cache = getattr(self, "_prepare_cache", None)
        if (cache is not None and cache[0] == (settings, statics)
                and len(cache[1]) == len(leaves)
                and all(a is b for a, b in zip(cache[1], leaves))):
            scene2, geom, bvh2 = cache[2]
        else:
            scene2, geom, bvh2 = _prepare_frame(
                settings, statics, self.scene_data, self.bvh,
                skin_bundle, self._joint_matrices,
            )
            object.__setattr__(self, "_prepare_cache",
                               ((settings, statics), leaves, (scene2, geom, bvh2)))

        h, w = self.render_height, self.render_width

        # force the traversal table to be an in-program intermediate so MSA
        # can place it in VMEM (see _trace_tile_frame docstring)
        patch = None
        if self.vmem_table and hasattr(bvh2, "table"):
            patch = bvh2.table[:8]

        # same trick for the per-triangle shade/motion tables (auto by total
        # resident bytes — oversubscribing VMEM would evict the BVH table,
        # the costlier placement; see _patch_geom_rows)
        gpatch = None
        if self.vmem_shade_tables is not False and hasattr(bvh2, "table"):
            total = (bvh2.table.size + geom.shade_rows.size
                     + geom.motion_rows.size) * 4
            if self.vmem_shade_tables or total <= self.VMEM_TABLES_AUTO_MAX_BYTES:
                gpatch = (geom.shade_rows[:1], geom.motion_rows[:1])

        if self.tile_program_loop:
            # all tiles in ONE program: one launch/frame instead of n_tiles
            # (each launch costs ~60-70 ms wall on the axon tunnel)
            out, rays_total = _trace_all_tiles_frame(
                settings, statics, scene2, bvh2, geom, uniforms,
                self.offsets, self.motion, self.prime_primary,
                self.prime_shadow, self.step_hint, patch, gpatch,
            )
            gbuffer = None
            if settings.enable_gbuffer:
                gbuffer = dict(
                    diffuse_albedo=out.diffuse_albedo,
                    specular_albedo=out.specular_albedo,
                    normal=out.normal,
                    roughness=out.roughness,
                )
            accum = _finish_frame(settings, uniforms, out.color, out.motion,
                                  self.motion, self.accum)
            return (accum, out.depth, out.motion, gbuffer, scene2.positions_obj,
                    rays_total, out.prime_primary, out.prime_shadow,
                    out.step_hint)

        n_pix = h * w
        tile = min(self.tile_pixels, n_pix)
        n_tiles = -(-n_pix // tile)
        padded = n_tiles * tile
        key = (h, w, tile)
        if getattr(self, "_tile_index_key", None) != key:
            flat_idx = np.arange(padded, dtype=np.int32)
            px = (flat_idx % w).reshape(n_tiles, tile)
            py = np.minimum(flat_idx // w, h - 1).reshape(n_tiles, tile)
            object.__setattr__(self, "_tile_px", [jnp.asarray(p) for p in px])
            object.__setattr__(self, "_tile_py", [jnp.asarray(p) for p in py])
            object.__setattr__(self, "_tile_index_key", key)

        pad = padded - n_pix

        def flat_pad(a, fill=0):
            a = a.reshape((n_pix,) + a.shape[2:])
            if pad:
                widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
                a = jnp.pad(a, widths, constant_values=fill)
            return a

        offs = flat_pad(self.offsets)
        pmot = flat_pad(self.motion)
        pp = flat_pad(self.prime_primary, -1)
        ps = flat_pad(self.prime_shadow, -1)
        hint = flat_pad(self.step_hint)

        outs = []
        for t in range(n_tiles):
            sl = slice(t * tile, (t + 1) * tile)
            outs.append(_trace_tile_frame(
                settings, statics, scene2, bvh2, geom, uniforms,
                self._tile_px[t], self._tile_py[t],
                offs[sl], pmot[sl], pp[sl], ps[sl], hint[sl], patch,
            ))

        def cat(field):
            a = jnp.concatenate([getattr(o, field) for o in outs])[:n_pix]
            return a.reshape((h, w) + a.shape[1:])

        color = cat("color")
        motion = cat("motion")
        depth = cat("depth")
        # pad lanes trace (fixed shapes) but must not count (the honest
        # counter matches trace_block's unpadded sum)
        rays_total = jnp.sum(cat("rays_traced").astype(jnp.int64))
        prime_primary = cat("prime_primary")
        prime_shadow = cat("prime_shadow")
        step_hint = cat("step_hint")
        gbuffer = None
        if settings.enable_gbuffer:
            gbuffer = dict(
                diffuse_albedo=cat("diffuse_albedo"),
                specular_albedo=cat("specular_albedo"),
                normal=cat("normal"),
                roughness=cat("roughness"),
            )
        accum = _finish_frame(settings, uniforms, color, motion, self.motion, self.accum)
        return (accum, depth, motion, gbuffer, scene2.positions_obj, rays_total,
                prime_primary, prime_shadow, step_hint)

    def _update_animation(self, delta_time: float | None):
        """60 Hz-throttled animation stepping with catch-up
        (updateSceneTimeAndAnimation, SkinningPass.swift:288-312). Computes
        host-side joint matrices (Model.update analog, Model.swift:207-261)."""
        if not self.statics.skin_slices:
            return
        from ..skinning import animation as anim
        from ..skinning import lbs

        dt = self.skinning_delta_time if delta_time is None else delta_time
        self._scene_time += dt
        if self._last_skinning_update is None:
            self._last_skinning_update = self._scene_time - self.skinning_delta_time
        elapsed = self._scene_time - self._last_skinning_update
        if elapsed < self.skinning_delta_time and self._joint_matrices:
            return  # skip this frame (throttle)
        steps = int(elapsed / self.skinning_delta_time)
        step_dt = self.skinning_delta_time * steps
        if steps > 0:
            self._last_skinning_update += step_dt

        mats = []
        for inst, _start, _count in self.statics.skin_slices:
            model = self.scene.models[inst]
            sk = model.skin
            if sk.animation is not None:
                dur = sk.animation.duration
                sk.current_time = anim.advance_time(sk.current_time, step_dt, dur)
            if sk.skeleton is not None:
                m = anim.compute_joint_matrices(sk.skeleton, sk.animation, sk.current_time)
            else:
                m = np.tile(np.eye(4, dtype=np.float32), (sk.rest_joints.shape[0], 1, 1))
            m = lbs.compose_final_matrices(m, sk.geometry_bind)
            mats.append(jnp.asarray(m))
        self._joint_matrices = tuple(mats)

    # -- present ------------------------------------------------------------------
    def output_image(self) -> np.ndarray:
        """Tonemapped uint8 image at OUTPUT resolution (upscaled when enabled) —
        the FramePresenter + blit analog."""
        from ..upscale import presenter

        return presenter.present(self)
