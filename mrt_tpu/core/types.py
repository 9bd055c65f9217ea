"""Core shared types — the TPU-native analog of the reference's shared ABI header.

Mirrors the host/shader struct vocabulary of the reference
(``MetalRaytracing/ShaderTypes.h:26-170``): ``Camera``, ``Light`` (+ the four
light types), ``Material`` (+ texture-flag bits), and ``Uniforms``.

TPU-first redesign notes
------------------------
* Device-resident state is SoA (structure-of-arrays) pytrees built from
  ``NamedTuple`` so they flow through ``jax.jit`` / ``shard_map`` untouched.
* The reference's single ``Uniforms`` struct (ShaderTypes.h:108-130) splits in
  two here: values that change *shapes or trace structure* live in the
  hashable ``RenderSettings`` (static argument to ``jax.jit`` — the analog of
  Metal function constants, Renderer.swift:308-315), while per-frame scalars
  live in the ``FrameUniforms`` pytree so knob changes never recompile.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# --- geometry / ray masks (ShaderTypes.h:26-33) --------------------------------
GEOMETRY_MASK_TRIANGLE = 1
GEOMETRY_MASK_LIGHT = 2
GEOMETRY_MASK_GEOMETRY = GEOMETRY_MASK_TRIANGLE
RAY_MASK_PRIMARY = GEOMETRY_MASK_GEOMETRY | GEOMETRY_MASK_LIGHT
RAY_MASK_SHADOW = GEOMETRY_MASK_GEOMETRY
RAY_MASK_SECONDARY = GEOMETRY_MASK_GEOMETRY

# --- light types (ShaderTypes.h:87-93) ------------------------------------------
LIGHT_TYPE_UNUSED = 0
LIGHT_TYPE_SUNLIGHT = 1
LIGHT_TYPE_SPOTLIGHT = 2
LIGHT_TYPE_POINTLIGHT = 3
LIGHT_TYPE_AREA = 4

# --- shading modes (ShaderTypes.h:132-135) ---------------------------------------
SHADING_MODE_PBR = 0
SHADING_MODE_LEGACY = 1

# --- material texture-flag bits (ShaderTypes.h:147-153) --------------------------
MATERIAL_TEXTURE_BASECOLOR = 1 << 0
MATERIAL_TEXTURE_NORMAL = 1 << 1
MATERIAL_TEXTURE_ROUGHNESS = 1 << 2
MATERIAL_TEXTURE_METALLIC = 1 << 3
MATERIAL_TEXTURE_AO = 1 << 4
MATERIAL_TEXTURE_EMISSION = 1 << 5
MATERIAL_TEXTURE_OPACITY = 1 << 6

# --- debug texture modes (ShaderTypes.h:159-168) ---------------------------------
DEBUG_MODE_NONE = 0
DEBUG_MODE_BASECOLOR = 1
DEBUG_MODE_NORMAL = 2
DEBUG_MODE_ROUGHNESS = 3
DEBUG_MODE_METALLIC = 4
DEBUG_MODE_AO = 5
DEBUG_MODE_EMISSION = 6
DEBUG_MODE_MOTION = 7

# Compile-time AO gate, default off (ShaderTypes.h:155-157).
# AO is compile-gated like the reference's function constant (off in the
# shipped app); MRT_ENABLE_AO=1 compiles the AO-map path in
ENABLE_AO = _os.environ.get("MRT_ENABLE_AO", "0") == "1"


class Camera(NamedTuple):
    """Pinhole camera (ShaderTypes.h:80-85).

    ``right``/``up`` are pre-scaled by the image-plane half extents exactly as
    in ``Scene.makeOrbitCamera`` (Scene.swift:126-159), so ray generation is
    ``normalize(u*right + v*up + forward)`` with u,v in [-1, 1].
    """

    position: jnp.ndarray  # (3,) f32
    right: jnp.ndarray  # (3,) f32, scaled by image-plane half width
    up: jnp.ndarray  # (3,) f32, scaled by image-plane half height
    forward: jnp.ndarray  # (3,) f32, unit


class Lights(NamedTuple):
    """SoA light array (ShaderTypes.h:95-106). Leading dim = light count."""

    type: jnp.ndarray  # (L,) int32
    position: jnp.ndarray  # (L,3) f32
    color: jnp.ndarray  # (L,3) f32
    forward: jnp.ndarray  # (L,3) f32 (area)
    right: jnp.ndarray  # (L,3) f32 (area)
    up: jnp.ndarray  # (L,3) f32 (area)
    cone_angle: jnp.ndarray  # (L,) f32 (spot)
    direction: jnp.ndarray  # (L,3) f32 (spot/sun)

    @property
    def count(self) -> int:
        return self.type.shape[0]


def make_light(
    type: int,
    position=(0.0, 0.0, 0.0),
    color=(0.0, 0.0, 0.0),
    forward=(0.0, 0.0, 0.0),
    right=(0.0, 0.0, 0.0),
    up=(0.0, 0.0, 0.0),
    cone_angle: float = 0.0,
    direction=(0.0, 0.0, 0.0),
) -> "Lights":
    """Single light as an SoA batch of one (cf. Light factory helpers, Scene.swift:172-209)."""
    f3 = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 3)
    return Lights(
        type=jnp.asarray([type], jnp.int32),
        position=f3(position),
        color=f3(color),
        forward=f3(forward),
        right=f3(right),
        up=f3(up),
        cone_angle=jnp.asarray([cone_angle], jnp.float32),
        direction=f3(direction),
    )


def area_light(position, forward, right, up, color) -> Lights:
    """Scene.swift:173-182."""
    return make_light(LIGHT_TYPE_AREA, position=position, color=color, forward=forward, right=right, up=up)


def sun_light(direction, color) -> Lights:
    """Scene.swift:184-190."""
    return make_light(LIGHT_TYPE_SUNLIGHT, direction=direction, color=color)


def point_light(position, color) -> Lights:
    """Scene.swift:192-198."""
    return make_light(LIGHT_TYPE_POINTLIGHT, position=position, color=color)


def spot_light(position, direction, cone_angle, color) -> Lights:
    """Scene.swift:200-208."""
    return make_light(
        LIGHT_TYPE_SPOTLIGHT, position=position, direction=direction, cone_angle=cone_angle, color=color
    )


def concat_lights(*lights: Lights) -> Lights:
    return Lights(*(jnp.concatenate(parts, axis=0) for parts in zip(*lights)))


class Materials(NamedTuple):
    """SoA per-resource materials (ShaderTypes.h:137-145). Leading dim = resource count."""

    base_color: jnp.ndarray  # (R,3) f32
    specular: jnp.ndarray  # (R,3) f32
    emission: jnp.ndarray  # (R,3) f32
    specular_exponent: jnp.ndarray  # (R,) f32
    refraction_index: jnp.ndarray  # (R,) f32
    opacity: jnp.ndarray  # (R,) f32
    texture_flags: jnp.ndarray  # (R,) uint32


def default_materials(count: int) -> Materials:
    """Material defaults as in SubMesh.swift:291-299 (ior=1, opacity=1, flags=0)."""
    return Materials(
        base_color=jnp.ones((count, 3), jnp.float32),
        specular=jnp.zeros((count, 3), jnp.float32),
        emission=jnp.zeros((count, 3), jnp.float32),
        specular_exponent=jnp.zeros((count,), jnp.float32),
        refraction_index=jnp.ones((count,), jnp.float32),
        opacity=jnp.ones((count,), jnp.float32),
        texture_flags=jnp.zeros((count,), jnp.uint32),
    )


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) render configuration.

    The analog of Metal function constants + the loop-bound fields of
    ``Uniforms`` (ShaderTypes.h:108-130). Hashable: passed as a static arg to
    ``jax.jit``. Defaults mirror Renderer.swift:52-197.
    """

    width: int = 512
    height: int = 512
    samples_per_pixel: int = 2  # Renderer.swift:117
    max_bounces: int = 2  # Renderer.swift:176
    shading_mode: int = SHADING_MODE_PBR  # Renderer.swift:169
    debug_mode: int = DEBUG_MODE_NONE
    enable_gbuffer: bool = False  # denoiser G-buffer outputs
    enable_motion_adaptive_sampling: bool = True  # Renderer.swift:151
    motion_sampling_max_extra_samples: int = 2  # Renderer.swift:158
    enable_motion_adaptive_accumulation: bool = True  # Renderer.swift:129
    # Ray-batch tile size for the wavefront pipeline (pixels per tile).
    # Measured sweep (512^2 app scene, v5e): 65536/16/sort-on = 0.92 Mrays/s;
    # /8 = 0.81, 16384/2 = 0.62, no-sort = 0.50, tile 131072 = 0.81.
    tile_pixels: int = 32768
    # Traversal chunking: each tile's rays are sorted for coherence and
    # traversed in this many independent while_loops (tail isolation).
    traversal_chunks: int = 16
    # Steps per traversal while-loop iteration: the loop condition is a
    # cross-lane reduce + scalar sync, so checking it every N steps amortizes
    # that overhead; sp==0 lanes step as no-ops, keeping semantics exact.
    # Swept on v5e (512² quick, round 2h): 2 → 3.56, 4 → 3.71, 6 → 3.51
    # Mrays/s — 4 balances sync amortization against wasted tail steps.
    traversal_unroll: int = 4
    # Persistent-lane sample driver: one bounce loop for the whole sample
    # budget; a lane whose path dies respawns into its next sample (kills the
    # per-sample occupancy ramp-down). Bit-equal to the sample-loop driver;
    # auto-falls back when motion-adaptive sampling / fused shadows /
    # motion-debug need the per-sample structure.
    persistent_samples: bool = False
    sort_rays: bool = True
    # Workload-predictive lane sort: group lanes by expected traversal step
    # count (camera rays: previous frame's per-pixel count; bounce/shadow
    # rays: the lane's previous traversal this sample) so each chunk's
    # while-loop trip count approaches its MEAN instead of the global tail.
    # Oracle-sorted lanes measured paid-steps waste 5.3x -> 1.4x
    # (docs/PERF.md round 2g). Results are bit-exact (sorting is undone).
    workload_sort: bool = True
    # Extend the hint to bounce/shadow rays using each lane's previous
    # traversal's step count ("rolling"). Measured SLOWER at the quick
    # config (3.10 vs 3.35: bounce-step correlation is too weak and the
    # mixed closest/shadow batch mispredicts) — camera-only is the default.
    workload_sort_rolling: bool = False
    # Shadow rays start at coherent hit points toward a light -- often
    # coherent enough without the per-traversal sort+permute round trip.
    sort_shadow_rays: bool = True
    # Streaming wavefront traversal (bvh/wide._traverse_stream): >0 = window
    # size; retired lanes refill from the sorted pool every stream_refill
    # steps, paying ~mean steps per ray instead of the chunk's max (measured
    # 3.4-9x tail waste in the chunked mode, docs/PERF.md round 2). 0 = use
    # the chunked mode.
    traversal_stream: int = 0
    stream_refill: int = 8
    # Traversal engine: "wide" = packed-row wide BVH. (A dense cluster-packet
    # tracer and a Pallas packet kernel were built and measured slower on
    # every scene class — docs/PERF.md; removed in round 3.)
    traversal_backend: str = "wide"
    # Fuse each bounce's next-ray (closest-hit) and the previous bounce's
    # shadow rays (any-hit) into ONE mixed traversal call. Round-1 measured
    # it SLOWER (0.88 vs 1.07: pend-flush iteration + longer live ranges),
    # but after the shift-stack + VMEM-table + wide-permutation rewrites the
    # per-call overheads it amortizes dominate instead: round-2 sweep has
    # fused 3.43 vs unfused 3.31 Mrays/s at the 512^2 quick config — now the
    # default; see docs/PERF.md.
    fuse_shadow_rays: bool = True
    # Geometry sharding (SURVEY §5.7): when set to a mesh axis name, each
    # chip's bvh argument is its LOCAL shard of the scene's BVH; per-bounce
    # hits are combined across the axis with min-t collectives. For BVHs
    # larger than one chip's HBM.
    geometry_axis: str | None = None
    # Two-level BLAS/TLAS instancing (bvh/twolevel.py): per unique mesh one
    # object-space BLAS (shared between instances), per-frame refit touches
    # only skinned BLASes + instance/TLAS rows. Applies to the "wide"
    # backend; gp-sharded and fused-shadow configurations use the flattened
    # single-level path.
    two_level: bool = True
    # Hit/occluder priming (bvh/wide._prime_hits): primary rays seed best-t
    # from the previous frame/sample's hit triangle; shadow rays test their
    # cached occluder first and retire on one row gather. Semantics-exact
    # (candidates are re-tested). Default OFF: measured -6..-10% e2e on the
    # app scene (the per-call candidate gather outweighs the step savings;
    # chunked tails don't shrink with mean steps) — see docs/PERF.md round 2.
    hit_priming: bool = False
    # Trilinear mipmap sampling with ray-cone LODs (assets/texture.py).
    # Beyond-reference: the Metal compute kernel reads LOD 0
    # (Raytracing.metal:421) — OFF keeps reference-exact texture output.
    use_mipmaps: bool = False
    # Light selection strategy. "uniform" = reference parity (1-of-N pick,
    # xN compensation, Raytracing.metal:587-647). "power" = importance-sample
    # by luminance x area with 1/pmf compensation — beyond-reference; lower
    # variance on scenes with strongly unequal lights; unbiased either way.
    light_sampling: str = "uniform"

    @property
    def base_samples(self) -> int:
        return max(self.samples_per_pixel, 1)

    @property
    def max_extra_samples(self) -> int:
        if self.enable_motion_adaptive_sampling:
            return max(self.motion_sampling_max_extra_samples, 0)
        return 0

    @property
    def sample_stride(self) -> int:
        """baseSamples + maxExtraSamples (Raytracing.metal:263-265)."""
        return self.base_samples + self.max_extra_samples


class FrameUniforms(NamedTuple):
    """Per-frame traced scalars (the rest of ShaderTypes.h:108-130).

    Changing any of these does NOT recompile the render step.
    """

    camera: Camera
    previous_camera: Camera
    frame_index: jnp.ndarray  # () int32
    accumulation_weight: jnp.ndarray  # () f32, Renderer.swift:124
    motion_accum_min_weight: jnp.ndarray  # () f32, default 0.1
    motion_accum_low_px: jnp.ndarray  # () f32, default 0.5
    motion_accum_high_px: jnp.ndarray  # () f32, default 4.0
    motion_sampling_low_px: jnp.ndarray  # () f32, default 1.0
    motion_sampling_high_px: jnp.ndarray  # () f32, default 6.0


def make_frame_uniforms(
    camera: Camera,
    previous_camera: Camera | None = None,
    frame_index: int = 0,
    accumulation_weight: float = 0.9,
    motion_accum_min_weight: float = 0.1,
    motion_accum_low_px: float = 0.5,
    motion_accum_high_px: float = 4.0,
    motion_sampling_low_px: float = 1.0,
    motion_sampling_high_px: float = 6.0,
) -> FrameUniforms:
    """Defaults from Renderer.swift:117-165."""
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return FrameUniforms(
        camera=camera,
        previous_camera=camera if previous_camera is None else previous_camera,
        frame_index=jnp.asarray(frame_index, jnp.int32),
        accumulation_weight=f32(accumulation_weight),
        motion_accum_min_weight=f32(motion_accum_min_weight),
        motion_accum_low_px=f32(motion_accum_low_px),
        motion_accum_high_px=f32(motion_accum_high_px),
        motion_sampling_low_px=f32(motion_sampling_low_px),
        motion_sampling_high_px=f32(motion_sampling_high_px),
    )


class Rays(NamedTuple):
    """SoA ray batch — the wavefront replacement for the megakernel's
    per-thread ray state (Raytracing.metal:283-310)."""

    origin: jnp.ndarray  # (R,3) f32
    direction: jnp.ndarray  # (R,3) f32
    max_distance: jnp.ndarray  # (R,) f32


class Hits(NamedTuple):
    """SoA closest-hit results (the intersector result, Raytracing.metal:306)."""

    t: jnp.ndarray  # (R,) f32; inf = miss
    triangle: jnp.ndarray  # (R,) int32 global triangle id; -1 = miss
    u: jnp.ndarray  # (R,) f32 barycentric for vertex 1
    v: jnp.ndarray  # (R,) f32 barycentric for vertex 2

    @property
    def hit(self) -> jnp.ndarray:
        return self.triangle >= 0


def orbit_camera(
    width: int,
    height: int,
    target,
    azimuth: float,
    elevation: float,
    distance: float,
    fov_degrees: float = 45.0,
) -> Camera:
    """Orbit camera parameterization — exact port of the *math* of
    ``Scene.makeOrbitCamera`` (Scene.swift:126-159)."""
    target = np.asarray(target, np.float32)
    safe_distance = max(0.001, float(distance))
    limit = np.pi / 2.0 - 0.001
    el = float(np.clip(elevation, -limit, limit))
    x = safe_distance * np.cos(el) * np.sin(azimuth)
    y = safe_distance * np.sin(el)
    z = safe_distance * np.cos(el) * np.cos(azimuth)
    position = target + np.array([x, y, z], np.float32)

    fwd = target - position
    forward = fwd / np.linalg.norm(fwd)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(forward, world_up)
    n = np.linalg.norm(right)
    right = right / n if n >= 1e-4 else np.array([1.0, 0.0, 0.0], np.float32)
    up = np.cross(right, forward)
    up = up / np.linalg.norm(up)

    fov = fov_degrees * np.pi / 180.0
    image_plane_height = np.tan(fov / 2.0)
    image_plane_width = (width / height) * image_plane_height

    return Camera(
        position=jnp.asarray(position, jnp.float32),
        right=jnp.asarray(right * image_plane_width, jnp.float32),
        up=jnp.asarray(up * image_plane_height, jnp.float32),
        forward=jnp.asarray(forward, jnp.float32),
    )
