"""Wavefront path tracer — the TPU-native decomposition of the reference
megakernel ``raytracingKernel`` (Raytracing.metal:221-831).

The megakernel's per-thread control flow (spp loop -> bounce loop with
miss / debug / glass / legacy / early-exit branches) becomes a vectorized
pipeline over an SoA pixel batch: a ``fori_loop`` over samples, and inside it
a ``while_loop`` over bounces where every divergent branch is a lane mask.
Per iteration the whole batch does one closest-hit traversal and one any-hit
shadow traversal — wide, regular VPU work instead of divergent threads.

Faithfully ported semantics (each cited):
* camera ray gen + Halton AA jitter            Raytracing.metal:269-291
* primary depth / motion vectors               Raytracing.metal:342-389
* degenerate-normal fallback                   Raytracing.metal:394-397
* texture set + UV y-flip                      Raytracing.metal:399-456
* debug visualization modes                    Raytracing.metal:459-490
* tangent-basis normal mapping                 Raytracing.metal:492-504
* G-buffer outputs                             Raytracing.metal:506-515
* glass/transparency stochastic branch
  (refraction does NOT consume a bounce;
  transparencyPasses caps at maxBounces)       Raytracing.metal:517-576
* emission, 1-of-N light sampling x lightCount Raytracing.metal:584-647
* legacy shading mode                          Raytracing.metal:649-690
* GGX+Lambert direct + any-hit shadow ray      Raytracing.metal:692-744
* diffuse-only throughput, ||color||<1e-3 exit Raytracing.metal:746-753
* cosine-hemisphere bounce                     Raytracing.metal:755-774
* motion-adaptive extra samples                Raytracing.metal:779-789
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..assets import texture as tex
from ..bvh import twolevel
from ..bvh import wide
from ..core import halton as H
from ..core import types as T
from ..engine.scene import SceneData, SceneStatics
from . import shade as S


class Geometry(NamedTuple):
    """Per-frame world-space geometry (output of the transform/skin/refit
    stage), consumed by trace.

    The shade stage is gather-bound like the BVH (docs/PERF.md), so everything
    a hit needs is packed into per-TRIANGLE rows built once per frame: one
    (P,) row gather per bounce replaces ~12 per-attribute gathers.
    """

    positions_w: jnp.ndarray  # (V,3)
    prev_positions_w: jnp.ndarray  # (V,3)
    normals_w: jnp.ndarray  # (V,3)
    tri_v0: jnp.ndarray  # (T,3) world-space triangle verts (original order)
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    # packed per-triangle shade row (T,16):
    # [n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) resource(1)]
    shade_rows: jnp.ndarray
    # packed per-triangle motion row (T,18): cur verts (9) + prev verts (9)
    motion_rows: jnp.ndarray
    # packed per-resource material row (R,16):
    # [base(3) specular(3) emission(3) spec_exp ior opacity flags pad(3)]
    mat_rows: jnp.ndarray
    # geometry sharding (dist/geometry.py): global-tri -> shard-local row
    # index (-1 = not mine). When set, shade/motion rows are SHARD-LOCAL and
    # per-hit rows are reconstructed with a masked local gather + psum.
    g2l: jnp.ndarray | None = None


def _tri_rows(table, tri, geom: "Geometry", settings):
    """Per-hit row fetch; under geometry sharding the owner chip gathers its
    local row and a psum reconstructs it everywhere (rays are replicated
    across gp, so every lane's value is identical after the reduce)."""
    if settings.geometry_axis and geom.g2l is not None:
        loc = jnp.take(geom.g2l, tri)
        mine = loc >= 0
        rows = jnp.take(table, jnp.maximum(loc, 0), axis=0)
        rows = jnp.where(mine[:, None], rows, 0.0)
        return jax.lax.psum(rows, settings.geometry_axis)
    return jnp.take(table, tri, axis=0)


def pack_mat_rows(m) -> jnp.ndarray:
    """(R,16) packed material rows:
    [base(3) specular(3) emission(3) spec_exp ior opacity flags pad(3)]."""
    return jnp.concatenate(
        [
            m.base_color,
            m.specular,
            m.emission,
            m.specular_exponent[:, None],
            m.refraction_index[:, None],
            m.opacity[:, None],
            m.texture_flags.astype(jnp.float32)[:, None],  # bits <= 127: exact
            jnp.zeros((m.base_color.shape[0], 3), jnp.float32),
        ],
        axis=1,
    )


def build_geometry(scene: SceneData, positions_w, prev_positions_w, normals_w) -> Geometry:
    idx = scene.indices
    v0 = jnp.take(positions_w, idx[:, 0], axis=0)
    v1 = jnp.take(positions_w, idx[:, 1], axis=0)
    v2 = jnp.take(positions_w, idx[:, 2], axis=0)

    n0 = jnp.take(normals_w, idx[:, 0], axis=0)
    n1 = jnp.take(normals_w, idx[:, 1], axis=0)
    n2 = jnp.take(normals_w, idx[:, 2], axis=0)
    uv0 = jnp.take(scene.uvs, idx[:, 0], axis=0)
    uv1 = jnp.take(scene.uvs, idx[:, 1], axis=0)
    uv2 = jnp.take(scene.uvs, idx[:, 2], axis=0)
    res_f = scene.tri_resource.astype(jnp.float32)  # resource counts are small
    shade_rows = jnp.concatenate([n0, n1, n2, uv0, uv1, uv2, res_f[:, None]], axis=1)

    p0 = jnp.take(prev_positions_w, idx[:, 0], axis=0)
    p1 = jnp.take(prev_positions_w, idx[:, 1], axis=0)
    p2 = jnp.take(prev_positions_w, idx[:, 2], axis=0)
    motion_rows = jnp.concatenate([v0, v1, v2, p0, p1, p2], axis=1)

    mat_rows = pack_mat_rows(scene.materials)
    return Geometry(
        positions_w, prev_positions_w, normals_w, v0, v1, v2,
        shade_rows, motion_rows, mat_rows,
    )


class TileOutputs(NamedTuple):
    """Per-pixel outputs of one traced tile (pre-accumulation)."""

    color: jnp.ndarray  # (P,3) averaged over samples
    depth: jnp.ndarray  # (P,)
    motion: jnp.ndarray  # (P,2) pixel units, +Y down
    diffuse_albedo: jnp.ndarray  # (P,3)
    specular_albedo: jnp.ndarray  # (P,3)
    normal: jnp.ndarray  # (P,3) encoded *0.5+0.5
    roughness: jnp.ndarray  # (P,)
    rays_traced: jnp.ndarray  # (P,) int32 actual traversals launched (closest
    # + any-hit) — the honest numerator for Mrays/s
    prime_primary: jnp.ndarray  # (P,) int32 this frame's primary hit tri
    prime_shadow: jnp.ndarray  # (P,) int32 this frame's bounce-0 occluder tri
    # (both feed the next frame's hit/occluder priming, bvh/wide._prime_hits)
    step_hint: jnp.ndarray  # (P,) int32 camera-ray traversal step counts —
    # next frame's workload-predictive sort key (docs/PERF.md round 2g)


def sample_environment(env_map: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect (lat-long) environment lookup. direction (R,3) unit;
    returns (R,3) linear radiance."""
    d = direction
    u = 0.5 + jnp.arctan2(d[:, 2], d[:, 0]) / (2.0 * jnp.pi)
    v = jnp.clip(0.5 - jnp.arcsin(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi, 0.0, 1.0)
    he, we = env_map.shape[0], env_map.shape[1]
    x = u * we - 0.5
    y = v * he - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    xi0 = jnp.mod(x0.astype(jnp.int32), we)
    xi1 = jnp.mod(x0.astype(jnp.int32) + 1, we)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, he - 1)
    yi1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, he - 1)
    flat = env_map.reshape(-1, 3)
    c00 = jnp.take(flat, yi0 * we + xi0, axis=0)
    c10 = jnp.take(flat, yi0 * we + xi1, axis=0)
    c01 = jnp.take(flat, yi1 * we + xi0, axis=0)
    c11 = jnp.take(flat, yi1 * we + xi1, axis=0)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def combine_hits_across(hits, axis: str):
    """Min-t hit reduction across a geometry-sharded mesh axis: every chip
    traced the same rays against its own BVH shard; the winner is the
    globally closest hit (ties broken by lowest rank)."""
    t_min = jax.lax.pmin(hits.t, axis)
    rank = jax.lax.axis_index(axis)
    mine = (hits.t == t_min) & (hits.triangle >= 0)
    winner_rank = jax.lax.pmin(jnp.where(mine, rank, jnp.int32(1 << 30)), axis)
    winner = mine & (rank == winner_rank)

    def pick(v, fill):
        return jax.lax.psum(jnp.where(winner, v, fill), axis)

    return T.Hits(
        t=t_min,
        triangle=pick(hits.triangle, 0) - (1 - jax.lax.psum(winner.astype(jnp.int32), axis)),
        u=pick(hits.u, 0.0),
        v=pick(hits.v, 0.0),
    )


def _project(camera: T.Camera, world_pos: jnp.ndarray):
    """Screen projection used for motion vectors (Raytracing.metal:360-376)."""
    view = world_pos - camera.position
    sx = S.dot3(view, camera.right)
    sy = S.dot3(view, camera.up)
    depth = S.dot3(view, camera.forward)
    denom = jnp.maximum(depth, 0.001)
    return sx / denom, sy / denom, depth


def trace_tile(
    settings: T.RenderSettings,
    statics: SceneStatics,
    scene: SceneData,
    bvh,  # WideBVH or ClusterSet, per settings.traversal_backend
    geom: Geometry,
    uniforms: T.FrameUniforms,
    pixel_x: jnp.ndarray,  # (P,) int32
    pixel_y: jnp.ndarray,  # (P,) int32
    offsets: jnp.ndarray,  # (P,) int32 halton decorrelation offsets
    prev_motion: jnp.ndarray,  # (P,2) previous-frame motion at these pixels
    sample_base: jnp.ndarray | None = None,  # () int32 Halton index base;
    # defaults to frame_index * sample_stride (Raytracing.metal:270). Sample-
    # parallel shards pass (frame_index * sp_size + sp_rank) * sample_stride.
    prime_primary: jnp.ndarray | None = None,  # (P,) int32 cached primary tri
    prime_shadow: jnp.ndarray | None = None,  # (P,) int32 cached occluder tri
    step_hint: jnp.ndarray | None = None,  # (P,) int32 prev-frame camera step
    # counts (workload-predictive traversal sort; 0 = no prediction)
) -> TileOutputs:
    P = pixel_x.shape[0]
    f32 = jnp.float32
    zero3 = jnp.zeros((P, 3), f32)
    if prime_primary is None:
        prime_primary = jnp.full((P,), -1, jnp.int32)
    if prime_shadow is None:
        prime_shadow = jnp.full((P,), -1, jnp.int32)
    if step_hint is None:
        step_hint = jnp.zeros((P,), jnp.int32)

    base_samples = settings.base_samples
    max_extra = settings.max_extra_samples
    sample_stride = settings.sample_stride

    width_f = f32(settings.width)
    height_f = f32(settings.height)

    base = (
        uniforms.frame_index * sample_stride if sample_base is None else sample_base
    )

    two_level = (
        settings.two_level
        and settings.traversal_backend == "wide"
        and not settings.geometry_axis
    )
    fused = (
        settings.fuse_shadow_rays
        and settings.traversal_backend == "wide"
        and not settings.geometry_axis
    )
    # hit/occluder priming (wide backend, unfused): one candidate-tri
    # gather replaces most of a traversal under temporal/sample coherence
    priming = (
        settings.hit_priming
        and settings.traversal_backend == "wide"
        and not fused
        and not settings.geometry_axis
    )
    # Workload-predictive lane sort (docs/PERF.md round 2g): sort lanes by
    # their expected traversal step count (camera rays: previous frame's
    # count for the pixel; bounce/shadow rays: the lane's previous traversal
    # this sample) so chunk while-trip counts approach the chunk MEAN
    # instead of the global tail. Results are bit-exact (sorting is undone).
    worksort = (
        settings.workload_sort
        and settings.sort_rays
        and settings.traversal_backend == "wide"
        and settings.traversal_stream == 0
        and not settings.geometry_axis
    )
    # chunked (stream_window=0) measured best after the shift-stack fix
    stream_w2 = settings.traversal_stream

    # Upper bound on loop trips PER SAMPLE: each iteration either consumes a
    # bounce or a transparencyPass, and passes cap at maxBounces
    # (Raytracing.metal:570); fused mode adds one trip to flush deferred
    # shadow rays.
    max_iters = settings.max_bounces * (settings.max_bounces + 2) + (3 if fused else 2)

    def camera_rays(sidx):
        """Per-lane camera ray for sample index ``sidx`` ((P,) int32) —
        Halton AA jitter (Raytracing.metal:272-291)."""
        hidx0 = offsets + base + sidx
        rx = H.halton(hidx0, jnp.zeros((), jnp.int32))
        ry = H.halton(hidx0, jnp.ones((), jnp.int32))
        sample_pix_x = pixel_x.astype(f32) + rx
        sample_pix_y = pixel_y.astype(f32) + ry
        u = sample_pix_x / width_f * 2.0 - 1.0
        v = sample_pix_y / height_f * 2.0 - 1.0
        cam = uniforms.camera
        ray_d = S.normalize(u[:, None] * cam.right + v[:, None] * cam.up + cam.forward)
        ray_o = jnp.broadcast_to(cam.position, (P, 3))
        return ray_o, ray_d

    def init_state(sidx, prime_p, prime_s, had0, motion0, hint0=None):
        """Bounce-loop lane state for lanes starting sample ``sidx``."""
        ray_o, ray_d = camera_rays(sidx)
        state = dict(
            sidx=sidx,
            ray_o=ray_o,
            ray_d=ray_d,
            color=jnp.ones((P, 3), f32),
            accumulated=zero3,
            bounce=jnp.zeros((P,), jnp.int32),
            step=jnp.zeros((P,), jnp.int32),
            tpasses=jnp.zeros((P,), jnp.int32),
            active=jnp.ones((P,), bool),
            had_primary=jnp.zeros((P,), bool),
            depth=jnp.full((P,), 1.0e8, f32),  # "far" init, Raytracing.metal:252
            motion=jnp.zeros((P, 2), f32),
            # last bounce-0 hit record; depth/motion projected post-loop
            prim_tri=jnp.full((P,), -1, jnp.int32),
            prim_u=jnp.zeros((P,), f32),
            prim_v=jnp.zeros((P,), f32),
            gb_diff=zero3,
            gb_spec=zero3,
            gb_norm=zero3,
            gb_rough=jnp.zeros((P,), f32),
            wrote_gb=jnp.zeros((P,), bool),
            rays=jnp.zeros((P,), jnp.int32),
            iter=jnp.zeros((), jnp.int32),
            # accumulated path length driving the ray-cone mip LOD
            # (use_mipmaps; beyond-reference — Metal samples LOD 0)
            cone_t=jnp.zeros((P,), f32),
        )
        if settings.debug_mode == T.DEBUG_MODE_MOTION:
            # sample-0 display context for the motion debug view
            state.update(had0_in=had0, motion0_in=motion0)
        if priming:
            state.update(
                occ_prime=prime_s,  # rolling occluder hint (bounce to bounce)
                prim_out=jnp.full((P,), -1, jnp.int32),
                ps_out=prime_s,  # bounce-0 occluder cache for next frame
                pp_cur=prime_p,  # camera-ray closest-hit candidate
            )
        if fused:
            # deferred shadow rays: traced together with the NEXT bounce's
            # closest-hit batch
            state.update(
                pend_mask=jnp.zeros((P,), bool),
                pend_o=zero3,
                pend_d=zero3,
                pend_dist=jnp.zeros((P,), f32),
                pend_contrib=zero3,
            )
        if worksort:
            h0 = step_hint if hint0 is None else hint0
            state.update(
                last_pops=h0,  # rolling per-lane expected-work hint
                cam_pops=h0,  # camera-ray step counts -> next frame's hint
            )
        return state

    def cond(st):
        live = jnp.any(st["active"])
        if fused:
            live = live | jnp.any(st["pend_mask"])
        return live & (st["iter"] < max_iters)

    if True:  # keep the historical indentation of the bounce body below

        def body(st):
            sidx = st["sidx"]
            hidx = offsets + base + sidx
            is_sample0 = sidx == 0
            # lanes about to trace their sample's camera ray (every lane that
            # has advanced carries bounce+step >= 1) — the per-lane
            # generalization of the old "iter == 0" camera-ray marker
            is_cam = (st["bounce"] == 0) & (st["step"] == 0)
            active = st["active"]
            if worksort:
                # camera lanes use the per-pixel hint; bounce lanes only
                # carry a hint in rolling mode (measured slower — see
                # RenderSettings.workload_sort_rolling)
                rolling = settings.workload_sort_rolling
                # -1 = unknown cost -> the traversal sort's top band
                # (bounce lanes must not share chunks with any-hit shadow
                # lanes or hinted camera lanes; docs/PERF.md round 3g)
                # cam_pops, not last_pops: for sample >= 2 camera rays the
                # lane's LAST traversal was a bounce/shadow one; cam_pops is
                # the same pixel's sample-1 camera count (init: frame hint)
                hint_closest = (st["last_pops"] if rolling
                                else jnp.where(is_cam, st["cam_pops"], -1))
                hint_shadow = (st["last_pops"] if rolling
                               else jnp.zeros((P,), jnp.int32))
            st["rays"] = st["rays"] + active.astype(jnp.int32)
            rays = T.Rays(st["ray_o"], st["ray_d"], jnp.full((P,), jnp.inf, f32))
            n_chunks = settings.traversal_chunks if P % max(settings.traversal_chunks, 1) == 0 else 1
            # geometry-mask filtering (Raytracing.metal:317,733-735): closest
            # rays carry bounce==0 ? RAY_MASK_PRIMARY : RAY_MASK_SECONDARY,
            # shadow rays RAY_MASK_SHADOW. Compiled in only when some instance
            # deviates from the default mask (two-level backend).
            masked = two_level and getattr(bvh, "has_masks", False)
            rm_closest = rm_shadow = None
            if masked:
                rm_closest = jnp.where(
                    st["bounce"] == 0, T.RAY_MASK_PRIMARY, T.RAY_MASK_SECONDARY
                ).astype(jnp.int32)
                rm_shadow = jnp.full((P,), T.RAY_MASK_SHADOW, jnp.int32)
            if fused:
                # one mixed 2P batch: [next-bounce closest | deferred shadow]
                batch = T.Rays(
                    origin=jnp.concatenate([st["ray_o"], st["pend_o"]]),
                    direction=jnp.concatenate([st["ray_d"], st["pend_d"]]),
                    max_distance=jnp.concatenate(
                        [jnp.full((P,), jnp.inf, f32), st["pend_dist"]]
                    ),
                )
                shadow_lane = jnp.concatenate([jnp.zeros((P,), bool), jnp.ones((P,), bool)])
                both_mask = jnp.concatenate([active, st["pend_mask"]])
                n_chunks2 = 2 * n_chunks if (2 * P) % max(2 * n_chunks, 1) == 0 else 1
                _tm = twolevel.trace_mixed if two_level else wide.trace_mixed
                if worksort:
                    hint2 = jnp.concatenate([hint_closest, hint_shadow])
                    hits2, occ2, pops2 = _tm(
                        bvh, batch, shadow_lane, mask=both_mask,
                        chunks=n_chunks2, sort_rays=settings.sort_rays,
                        stream_window=2 * settings.traversal_stream,
                        refill_every=settings.stream_refill,
                        unroll=settings.traversal_unroll,
                        sort_hint=hint2, count_pops=True,
                        **({"ray_mask": jnp.concatenate([rm_closest, rm_shadow])}
                           if masked else {}),
                    )
                    pc = pops2[:P]
                    st["last_pops"] = jnp.where(active, pc, st["last_pops"])
                    st["cam_pops"] = jnp.where(
                        is_cam & active, pc, st["cam_pops"])
                else:
                    hits2, occ2 = _tm(
                        bvh, batch, shadow_lane, mask=both_mask,
                        chunks=n_chunks2, sort_rays=settings.sort_rays,
                        stream_window=2 * settings.traversal_stream,
                        refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                        **({"ray_mask": jnp.concatenate([rm_closest, rm_shadow])}
                           if masked else {}),
                    )
                hits = T.Hits(
                    t=hits2.t[:P], triangle=hits2.triangle[:P],
                    u=hits2.u[:P], v=hits2.v[:P],
                )
                occluded_prev = occ2[P:]
                # settle the deferred shadow contributions
                st["accumulated"] = st["accumulated"] + jnp.where(
                    (st["pend_mask"] & ~occluded_prev)[:, None], st["pend_contrib"], 0.0
                )
                st["pend_mask"] = jnp.zeros((P,), bool)
            elif two_level:
                hits = twolevel.closest_hit(
                    bvh, rays, mask=active, sort_rays=settings.sort_rays,
                    stream_window=stream_w2, refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                    chunks=n_chunks,
                    prime_tri=(jnp.where(is_cam, st["pp_cur"], -1) if priming else None),
                    tri_rows=(geom.motion_rows if priming else None),
                    sort_hint=(hint_closest if worksort else None),
                    count_pops=worksort, ray_mask=rm_closest,
                )
                if worksort:
                    hits, pops_c = hits
                    st["last_pops"] = jnp.where(active, pops_c, st["last_pops"])
                    st["cam_pops"] = jnp.where(
                        is_cam & active, pops_c, st["cam_pops"])
                if priming:
                    st["prim_out"] = jnp.where(
                        is_cam & active, hits.triangle, st["prim_out"]
                    )
            elif priming:
                # camera rays (iteration 0) seed best-t from the cached tri;
                # bounce rays have no useful candidate
                hits = wide.closest_hit(
                    bvh, rays, mask=active, chunks=n_chunks, sort_rays=settings.sort_rays,
                    prime_tri=jnp.where(is_cam, st["pp_cur"], -1),
                    tri_rows=geom.motion_rows,
                    stream_window=settings.traversal_stream,
                    refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                    sort_hint=(hint_closest if worksort else None),
                    count_pops=worksort,
                )
                if worksort:
                    hits, pops_c = hits
                    st["last_pops"] = jnp.where(active, pops_c, st["last_pops"])
                    st["cam_pops"] = jnp.where(
                        is_cam & active, pops_c, st["cam_pops"])
                st["prim_out"] = jnp.where(
                    is_cam & active, hits.triangle, st["prim_out"]
                )
            else:
                hits = wide.closest_hit(
                    bvh, rays, mask=active, chunks=n_chunks, sort_rays=settings.sort_rays,
                    stream_window=settings.traversal_stream,
                    refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                    sort_hint=(hint_closest if worksort else None),
                    count_pops=worksort,
                )
                if worksort:
                    hits, pops_c = hits
                    st["last_pops"] = jnp.where(active, pops_c, st["last_pops"])
                    st["cam_pops"] = jnp.where(
                        is_cam & active, pops_c, st["cam_pops"])
            if settings.geometry_axis:
                hits = combine_hits_across(hits, settings.geometry_axis)
            hit = hits.hit & active
            # miss -> bounced out of the scene (Raytracing.metal:320-322).
            # With an environment attached, miss rays pick up its radiance
            # instead of terminating black (new-build feature, BASELINE cfg 2).
            if statics.has_environment:
                missed = active & ~hit
                env = sample_environment(scene.env_map, st["ray_d"]) * scene.env_intensity
                st["accumulated"] = st["accumulated"] + jnp.where(
                    missed[:, None], st["color"] * env, 0.0
                )
            st["active"] = active & hit

            tri = jnp.maximum(hits.triangle, 0)
            # ONE packed-row gather per stage (shade-row, motion-row, mat-row)
            # replaces ~12 per-attribute gathers — see docs/PERF.md.
            srow = _tri_rows(geom.shade_rows, tri, geom, settings)  # (P,16)
            res = srow[:, 15].astype(jnp.int32)
            world_point = st["ray_o"] + st["ray_d"] * hits.t[:, None]

            u_b1 = hits.u[:, None]
            v_b1 = hits.v[:, None]
            w_b1 = 1.0 - u_b1 - v_b1

            # --- primary depth + motion (bounce 0, sample 0) -----------------
            # (Raytracing.metal:342-389). The motion-row gather + projection
            # math only matter for the LAST bounce-0 hit, so the loop records
            # (tri, u, v) and the projection runs ONCE after the loop — the
            # per-iteration gather was a measured ~0.45 ms/iter fusion at 65k
            # lanes (docs/PERF.md round 2b). The in-loop path is kept only
            # for the motion debug view, which displays motion mid-loop.
            primary = hit & (st["bounce"] == 0) & is_sample0
            need_mrow_inloop = (
                settings.use_mipmaps or settings.debug_mode == T.DEBUG_MODE_MOTION
            )
            if need_mrow_inloop:
                mrow = _tri_rows(geom.motion_rows, tri, geom, settings)  # (P,18)
            if settings.debug_mode == T.DEBUG_MODE_MOTION:
                obj_pos_w = u_b1 * mrow[:, 3:6] + v_b1 * mrow[:, 6:9] + w_b1 * mrow[:, 0:3]
                prev_pos_w = u_b1 * mrow[:, 12:15] + v_b1 * mrow[:, 15:18] + w_b1 * mrow[:, 9:12]
                sx, sy, pdepth = _project(uniforms.camera, obj_pos_w)
                psx, psy, _ = _project(uniforms.previous_camera, prev_pos_w)
                right_scale = jnp.maximum(S.length(uniforms.camera.right), 1e-5)
                up_scale = jnp.maximum(S.length(uniforms.camera.up), 1e-5)
                motion_px_x = (sx - psx) * (width_f / (2.0 * right_scale))
                motion_px_y = -((sy - psy) * (height_f / (2.0 * up_scale)))  # +Y down
                st["depth"] = jnp.where(primary, jnp.maximum(pdepth, 1.0e-3), st["depth"])
                st["motion"] = jnp.where(
                    primary[:, None], jnp.stack([motion_px_x, motion_px_y], -1), st["motion"]
                )
            else:
                st["prim_tri"] = jnp.where(primary, hits.triangle, st["prim_tri"])
                st["prim_u"] = jnp.where(primary, hits.u, st["prim_u"])
                st["prim_v"] = jnp.where(primary, hits.v, st["prim_v"])
            st["had_primary"] = st["had_primary"] | primary

            # --- surface normal (Raytracing.metal:391-397) -------------------
            nrm_raw = u_b1 * srow[:, 3:6] + v_b1 * srow[:, 6:9] + w_b1 * srow[:, 0:3]
            degenerate = S.length(nrm_raw) < 1e-10
            nrm = jnp.where(degenerate[:, None], -st["ray_d"], S.normalize(nrm_raw))

            # --- ray-cone mip LOD (use_mipmaps; beyond-reference) ------------
            # Cone radius grows linearly with path length at the pixel's
            # angular size; the footprint is converted to UV units via the
            # hit triangle's uv-area/world-area ratio (isotropic approx).
            if settings.use_mipmaps:
                dist = st["cone_t"] + jnp.where(hit, hits.t, 0.0)
                up_len = jnp.sqrt(jnp.sum(uniforms.camera.up ** 2))
                fwd_len = jnp.sqrt(jnp.sum(uniforms.camera.forward ** 2))
                pixel_angle = 2.0 * up_len / (height_f * jnp.maximum(fwd_len, 1e-5))
                e1w = mrow[:, 3:6] - mrow[:, 0:3]
                e2w = mrow[:, 6:9] - mrow[:, 0:3]
                world_area = 0.5 * S.length(jnp.cross(e1w, e2w))
                du1 = srow[:, 11:13] - srow[:, 9:11]
                du2 = srow[:, 13:15] - srow[:, 9:11]
                uv_area = 0.5 * jnp.abs(du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0])
                cos_inc = jnp.maximum(jnp.abs(S.dot3(st["ray_d"], nrm)), 0.25)
                footprint_w = dist * pixel_angle / cos_inc
                footprint_uv = footprint_w * jnp.sqrt(
                    uv_area / jnp.maximum(world_area, 1e-12)
                )
                lod_base = jnp.log2(jnp.maximum(footprint_uv, 1e-8))
                st["cone_t"] = st["cone_t"] + jnp.where(hit, hits.t, 0.0)

                def tex_sample(map_type):
                    return tex.sample_trilinear(
                        scene.atlas, res, map_type, tex_coord, lod_base)
            else:
                # channel-packed atlas: ONE (1 rect + 4 wide-row taps) sample
                # yields every map of the hit's resource, vs (1+4) narrow
                # gathers per map type. Memoized so the sample is traced once
                # per bounce regardless of how many maps the scene uses.
                _packed_memo = []

                def tex_sample(map_type):
                    if not _packed_memo:
                        if (settings.geometry_axis
                                and scene.atlas.band_lo is not None):
                            # gp-banded atlas: local taps + one psum
                            # (dist/geometry.band_atlas)
                            _packed_memo.append(tex.sample_packed_banded(
                                scene.atlas, res, tex_coord,
                                settings.geometry_axis))
                        else:
                            _packed_memo.append(
                                tex.sample_packed(scene.atlas, res, tex_coord))
                    return tex.packed_map(_packed_memo[0], map_type)

            # --- material + textures (Raytracing.metal:399-456) --------------
            matrow = S.take_rows_onehot(geom.mat_rows, res)  # (P,16)
            albedo = matrow[:, 0:3]
            flags = matrow[:, 12].astype(jnp.uint32)
            tex_coord = u_b1 * srow[:, 11:13] + v_b1 * srow[:, 13:15] + w_b1 * srow[:, 9:11]
            tex_coord = tex_coord.at[:, 1].set(1.0 - tex_coord[:, 1])  # UV y-flip, :417

            def has(bit):
                return (flags & jnp.uint32(bit)) != 0

            base_sample = jnp.ones((P, 3), f32)
            if statics.any_map[tex.MAP_BASECOLOR]:
                s = tex_sample(tex.MAP_BASECOLOR)
                m = has(T.MATERIAL_TEXTURE_BASECOLOR)[:, None]
                base_sample = jnp.where(m, s, base_sample)
                albedo = jnp.where(m, albedo * s, albedo)

            roughness = jnp.ones((P,), f32)
            if statics.any_map[tex.MAP_ROUGHNESS]:
                s = tex_sample(tex.MAP_ROUGHNESS)[:, 0]
                roughness = jnp.where(has(T.MATERIAL_TEXTURE_ROUGHNESS), s, roughness)

            metallic = jnp.zeros((P,), f32)
            if statics.any_map[tex.MAP_METALLIC]:
                s = tex_sample(tex.MAP_METALLIC)[:, 0]
                metallic = jnp.where(has(T.MATERIAL_TEXTURE_METALLIC), s, metallic)

            ao = jnp.ones((P,), f32)
            if T.ENABLE_AO and statics.any_map[tex.MAP_AO]:
                s = tex_sample(tex.MAP_AO)[:, 0]
                ao = jnp.where(has(T.MATERIAL_TEXTURE_AO), s, ao)

            opacity = jnp.clip(matrow[:, 11], 0.0, 1.0)
            if statics.any_map[tex.MAP_OPACITY]:
                s = tex_sample(tex.MAP_OPACITY)[:, 0]
                opacity = jnp.where(has(T.MATERIAL_TEXTURE_OPACITY), opacity * s, opacity)

            emission = matrow[:, 6:9]
            if statics.any_map[tex.MAP_EMISSION]:
                s = tex_sample(tex.MAP_EMISSION)
                emission = jnp.where(has(T.MATERIAL_TEXTURE_EMISSION)[:, None], s, emission)

            # --- debug visualization (Raytracing.metal:459-490) --------------
            if settings.debug_mode != T.DEBUG_MODE_NONE:
                dm = settings.debug_mode
                magenta = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 1.0], f32), (P, 3))
                if dm == T.DEBUG_MODE_BASECOLOR:
                    debug = jnp.where(has(T.MATERIAL_TEXTURE_BASECOLOR)[:, None], base_sample, magenta)
                elif dm == T.DEBUG_MODE_NORMAL:
                    if statics.any_map[tex.MAP_NORMAL]:
                        nmap = tex_sample(tex.MAP_NORMAL)
                        debug = jnp.where(has(T.MATERIAL_TEXTURE_NORMAL)[:, None], nmap, nrm * 0.5 + 0.5)
                    else:
                        debug = nrm * 0.5 + 0.5
                elif dm == T.DEBUG_MODE_ROUGHNESS:
                    debug = jnp.repeat(roughness[:, None], 3, axis=1)
                elif dm == T.DEBUG_MODE_METALLIC:
                    debug = jnp.repeat(metallic[:, None], 3, axis=1)
                elif dm == T.DEBUG_MODE_AO:
                    debug = jnp.repeat(ao[:, None], 3, axis=1) if T.ENABLE_AO else magenta
                elif dm == T.DEBUG_MODE_EMISSION:
                    debug = emission
                else:  # DEBUG_MODE_MOTION (Raytracing.metal:482-487)
                    # hadPrimaryHit/motionVector are written only at sample 0
                    # (Raytracing.metal:342); later samples reuse sample 0's.
                    eff_had = jnp.where(is_sample0, st["had_primary"], st["had0_in"])
                    eff_motion = jnp.where(is_sample0, st["motion"], st["motion0_in"])
                    mp = jnp.where(eff_had[:, None], eff_motion, prev_motion)
                    scaled = jnp.clip(mp * 0.05, -1.0, 1.0)
                    mag = jnp.clip(S.length(mp) * 0.1, 0.0, 1.0)
                    debug = jnp.stack([scaled[:, 0] * 0.5 + 0.5, scaled[:, 1] * 0.5 + 0.5, mag], -1)
                st["accumulated"] = jnp.where(hit[:, None], debug, st["accumulated"])
                st["active"] = jnp.zeros((P,), bool)
                st["iter"] = st["iter"] + 1
                return st

            # --- normal mapping (Raytracing.metal:492-504) -------------------
            shading_nrm = nrm
            if statics.any_map[tex.MAP_NORMAL]:
                # verts come from the motion row (cur verts = take(positions_w,
                # idx), bit-identical), uvs from the shade row already in hand:
                # one wide gather instead of seven narrow ones
                mrow_t = mrow if need_mrow_inloop else _tri_rows(
                    geom.motion_rows, tri, geom, settings)
                valid_tb, tangent, bitangent = S.tangent_basis_rows(
                    mrow_t[:, 0:3], mrow_t[:, 3:6], mrow_t[:, 6:9],
                    srow[:, 9:11], srow[:, 11:13], srow[:, 13:15],
                )
                world_t = S.normalize(tangent - nrm * S.dot3(tangent, nrm)[:, None])
                world_b = S.normalize(jnp.cross(nrm, world_t))
                nmap = tex_sample(tex.MAP_NORMAL) * 2.0 - 1.0
                mapped = S.normalize(
                    nmap[:, 0:1] * world_t + nmap[:, 1:2] * world_b + nmap[:, 2:3] * nrm
                )
                use = (has(T.MATERIAL_TEXTURE_NORMAL) & valid_tb)[:, None]
                shading_nrm = jnp.where(use, mapped, nrm)

            # --- G-buffer (Raytracing.metal:506-515) -------------------------
            if settings.enable_gbuffer:
                write_gb = hit & ~st["wrote_gb"] & is_sample0
                r_out = jnp.clip(roughness, 0.0, 1.0)
                diff_alb = albedo * (1.0 - metallic)[:, None]
                spec_alb = 0.04 + (albedo - 0.04) * metallic[:, None]
                st["gb_diff"] = jnp.where(write_gb[:, None], diff_alb, st["gb_diff"])
                st["gb_spec"] = jnp.where(write_gb[:, None], spec_alb, st["gb_spec"])
                st["gb_norm"] = jnp.where(write_gb[:, None], shading_nrm * 0.5 + 0.5, st["gb_norm"])
                st["gb_rough"] = jnp.where(write_gb, r_out, st["gb_rough"])
                st["wrote_gb"] = st["wrote_gb"] | write_gb

            # --- glass / transparency branch (Raytracing.metal:517-576) ------
            # ONE packed gather fetches the six per-step QMC bases for this
            # step AND the next (glass advances step mid-iteration); six
            # separate per-lane prime-table gathers profiled at ~0.5 ms each
            # (docs/PERF.md round 2b).
            _qmc_step0 = st["step"]
            _qmc_cur, _qmc_nxt = H.step_bases_pair(_qmc_step0)

            def _qmc_base(name):
                adv = st["step"] > _qmc_step0  # glass lanes advanced by one
                return jnp.where(adv, _qmc_nxt[name], _qmc_cur[name])

            skip_lighting = jnp.zeros((P,), bool)
            consume_bounce = jnp.ones((P,), bool)
            if statics.has_refraction:
                ior = jnp.maximum(matrow[:, 10], 1.0)
                clamped_op = jnp.clip(opacity, 0.0, 1.0)
                glass = hit & ((clamped_op < 0.999) | (ior > 1.01))

                N = shading_nrm
                I = st["ray_d"]
                cosi = jnp.clip(S.dot3(-I, N), -1.0, 1.0)
                inside = cosi < 0.0
                cosi = jnp.abs(cosi)
                N = jnp.where(inside[:, None], -N, N)
                eta_i = jnp.where(inside, ior, 1.0)
                eta_t = jnp.where(inside, 1.0, ior)
                eta = eta_i / eta_t
                k = 1.0 - eta * eta * (1.0 - cosi * cosi)
                f0 = ((eta_t - eta_i) / (eta_t + eta_i)) ** 2
                F = f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cosi, 0.0, 1.0), 5.0)
                transmission = 1.0 - clamped_op
                reflect_w = F
                refract_w = (1.0 - F) * transmission
                total_w = jnp.maximum(reflect_w + refract_w, 1e-4)
                reflect_prob = reflect_w / total_w

                choice = H.halton_base(hidx, _qmc_cur["transparency"],
                                       H.STEP_MAX_DIGITS)
                do_reflect = (k < 0.0) | (choice < reflect_prob)

                reflect_dir = S.normalize(I - 2.0 * S.dot3(I, N)[:, None] * N)
                cos_t = jnp.sqrt(jnp.maximum(k, 0.0))
                refract_dir = S.normalize(eta[:, None] * I + (eta * cosi - cos_t)[:, None] * N)

                new_dir = jnp.where(do_reflect[:, None], reflect_dir, refract_dir)
                new_origin = world_point + new_dir * 1e-3
                new_color = jnp.where(
                    do_reflect[:, None],
                    st["color"] * total_w[:, None],
                    st["color"] * total_w[:, None] * albedo,
                )
                st["ray_d"] = jnp.where(glass[:, None], new_dir, st["ray_d"])
                st["ray_o"] = jnp.where(glass[:, None], new_origin, st["ray_o"])
                st["color"] = jnp.where(glass[:, None], new_color, st["color"])
                consume_bounce = jnp.where(glass & ~do_reflect, False, consume_bounce)
                skip_lighting = glass

                # bookkeeping for skip-lighting lanes (Raytracing.metal:563-576)
                g_step = st["step"] + 1
                g_bounce = jnp.where(consume_bounce, st["bounce"] + 1, st["bounce"])
                g_tp = jnp.where(consume_bounce, 0, st["tpasses"] + 1)
                overflow = ~consume_bounce & (g_tp > settings.max_bounces)
                g_bounce = jnp.where(overflow, g_bounce + 1, g_bounce)
                g_tp = jnp.where(overflow, 0, g_tp)
                st["step"] = jnp.where(glass, g_step, st["step"])
                st["bounce"] = jnp.where(glass, g_bounce, st["bounce"])
                st["tpasses"] = jnp.where(glass, g_tp, st["tpasses"])

            lit = st["active"] & ~skip_lighting

            # --- emission (Raytracing.metal:584-585) -------------------------
            st["accumulated"] = st["accumulated"] + jnp.where(
                lit[:, None], st["color"] * emission, 0.0
            )

            # --- five post-glass QMC dims, one (P,) digit loop each. The
            # "batch into one (5, P) loop" variant was tried and MEASURED
            # SLOWER on TPU: 4.05-4.07 vs 4.27 Mrays/s quick, reproduced
            # twice (docs/PERF.md round 3f) — the (5, P) layout adds
            # relayouts that outweigh the saved loop overhead, and the
            # separate per-dim loops fuse into their consumers. Keep scalar.
            _qmc_v5 = [
                H.halton_base(hidx, _qmc_base(n), H.STEP_MAX_DIGITS)
                for n in ("light_pick", "area_a", "area_b",
                          "bounce_x", "bounce_y")]

            # --- pick 1 of N lights (Raytracing.metal:587-647) ---------------
            n_lights = statics.n_lights
            light_sample = _qmc_v5[0]
            if settings.light_sampling == "power" and n_lights > 1:
                # power-proportional pick (beyond-reference): pmf ~ luminance
                # x (area for area lights); 1/pmf compensation keeps the
                # estimator unbiased while uniform is the reference default.
                lum = jnp.maximum(jnp.sum(jnp.abs(scene.lights.color), axis=1), 1e-6)
                area = jnp.linalg.norm(
                    jnp.cross(scene.lights.right, scene.lights.up), axis=1
                )
                wgt = jnp.where(
                    scene.lights.type == T.LIGHT_TYPE_AREA,
                    lum * jnp.maximum(area, 1e-6), lum,
                )
                pmf = wgt / jnp.sum(wgt)
                cdf = jnp.cumsum(pmf)
                light_index = jnp.clip(
                    jnp.searchsorted(cdf, light_sample), 0, n_lights - 1
                ).astype(jnp.int32)
                light_weight = (1.0 / jnp.maximum(jnp.take(pmf, light_index), 1e-8))[:, None]
            else:
                light_index = jnp.minimum(
                    (light_sample * n_lights).astype(jnp.int32), n_lights - 1
                )
                light_weight = f32(n_lights)  # 1-of-N compensation, :647
            u_area = jnp.stack([_qmc_v5[1], _qmc_v5[2]], -1)
            l_dir, l_col, l_dist = S.evaluate_light(scene.lights, light_index, u_area, world_point)
            l_col = l_col * light_weight

            # --- shading -----------------------------------------------------
            if settings.shading_mode == T.SHADING_MODE_LEGACY:
                # (Raytracing.metal:649-690)
                L = S.normalize(l_dir)
                n_dot_l = S.saturate(S.dot3(shading_nrm, L))
                legacy_color = st["color"] * albedo
                dead_before = S.length(legacy_color) < 0.001
                st["active"] = st["active"] & ~(lit & dead_before)
                lit = lit & ~dead_before

                need_shadow = lit & (S.length(l_col) > 0.0001) & (n_dot_l > 0.0)
                shadow_rays = T.Rays(
                    origin=world_point + nrm * 1e-3,
                    direction=l_dir,
                    max_distance=l_dist - 1e-3,
                )
                st["rays"] = st["rays"] + need_shadow.astype(jnp.int32)
                contrib = legacy_color * l_col * n_dot_l[:, None]
                if fused:
                    # defer: traced with the next iteration's mixed batch
                    st["pend_mask"] = need_shadow
                    st["pend_o"] = shadow_rays.origin
                    st["pend_d"] = shadow_rays.direction
                    st["pend_dist"] = shadow_rays.max_distance
                    st["pend_contrib"] = contrib
                else:
                    if two_level:
                        occluded, occ_tri = twolevel.any_hit(
                            bvh, shadow_rays, mask=need_shadow,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays, stream_window=stream_w2,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll, chunks=n_chunks,
                            prime_tri=(st["occ_prime"] if priming else None),
                            tri_rows=(geom.motion_rows if priming else None),
                            return_tri=True,
                            sort_hint=(hint_shadow if worksort else None),
                            ray_mask=rm_shadow,
                        )
                        if priming:
                            st["occ_prime"] = jnp.where(need_shadow, occ_tri, st["occ_prime"])
                            st["ps_out"] = jnp.where(
                                need_shadow & (st["bounce"] == 0), occ_tri, st["ps_out"]
                            )
                    elif priming:
                        occluded, occ_tri = wide.any_hit(
                            bvh, shadow_rays, mask=need_shadow, chunks=n_chunks,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays, prime_tri=st["occ_prime"],
                            tri_rows=geom.motion_rows, return_tri=True,
                            stream_window=settings.traversal_stream,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                            sort_hint=(hint_shadow if worksort else None),
                        )
                        st["occ_prime"] = jnp.where(need_shadow, occ_tri, st["occ_prime"])
                        st["ps_out"] = jnp.where(
                            need_shadow & (st["bounce"] == 0), occ_tri, st["ps_out"]
                        )
                    else:
                        occluded = wide.any_hit(
                            bvh, shadow_rays, mask=need_shadow, chunks=n_chunks,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays,
                            stream_window=settings.traversal_stream,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                            sort_hint=(hint_shadow if worksort else None),
                        )
                    if settings.geometry_axis:
                        occluded = jax.lax.pmax(occluded.astype(jnp.int32), settings.geometry_axis) > 0
                    st["accumulated"] = st["accumulated"] + jnp.where(
                        (need_shadow & ~occluded)[:, None], contrib, 0.0
                    )

                new_color = legacy_color * ao[:, None]
                st["color"] = jnp.where(lit[:, None], new_color, st["color"])
                dead_after = S.length(st["color"]) < 0.001
                st["active"] = st["active"] & ~(lit & dead_after)
                lit = lit & ~dead_after
            else:
                # PBR (Raytracing.metal:692-744)
                perceptual_roughness = jnp.clip(roughness, 0.04, 1.0)
                alpha = perceptual_roughness * perceptual_roughness
                diffuse_color = albedo
                F0 = 0.04 + (albedo - 0.04) * metallic[:, None]
                V = S.normalize(-st["ray_d"])

                has_light = S.length(l_col) > 0.0001
                L = S.normalize(l_dir)
                Hv = S.normalize(V + L)
                n_dot_l = S.saturate(S.dot3(shading_nrm, L))
                n_dot_v = S.saturate(S.dot3(shading_nrm, V))
                n_dot_h = S.saturate(S.dot3(shading_nrm, Hv))
                v_dot_h = S.saturate(S.dot3(V, Hv))

                Fr = S.fresnel_schlick(v_dot_h, F0)
                D = S.distribution_ggx(n_dot_h, alpha)
                kk = (perceptual_roughness + 1.0)
                kk = (kk * kk) / 8.0
                G = S.geometry_smith(n_dot_v, n_dot_l, kk)
                specular = (D * G)[:, None] * Fr / jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-4)[:, None]
                kS = Fr
                kD = (1.0 - kS) * (1.0 - metallic)[:, None]
                diffuse = kD * diffuse_color / S.PI
                direct = (diffuse + specular) * l_col * n_dot_l[:, None]

                need_shadow = lit & has_light
                shadow_rays = T.Rays(
                    origin=world_point + nrm * 1e-3,
                    direction=l_dir,
                    max_distance=l_dist - 1e-3,
                )
                st["rays"] = st["rays"] + need_shadow.astype(jnp.int32)
                if fused:
                    st["pend_mask"] = need_shadow
                    st["pend_o"] = shadow_rays.origin
                    st["pend_d"] = shadow_rays.direction
                    st["pend_dist"] = shadow_rays.max_distance
                    st["pend_contrib"] = st["color"] * direct
                else:
                    if two_level:
                        occluded, occ_tri = twolevel.any_hit(
                            bvh, shadow_rays, mask=need_shadow,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays, stream_window=stream_w2,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll, chunks=n_chunks,
                            prime_tri=(st["occ_prime"] if priming else None),
                            tri_rows=(geom.motion_rows if priming else None),
                            return_tri=True,
                            sort_hint=(hint_shadow if worksort else None),
                            ray_mask=rm_shadow,
                        )
                        if priming:
                            st["occ_prime"] = jnp.where(need_shadow, occ_tri, st["occ_prime"])
                            st["ps_out"] = jnp.where(
                                need_shadow & (st["bounce"] == 0), occ_tri, st["ps_out"]
                            )
                    elif priming:
                        occluded, occ_tri = wide.any_hit(
                            bvh, shadow_rays, mask=need_shadow, chunks=n_chunks,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays, prime_tri=st["occ_prime"],
                            tri_rows=geom.motion_rows, return_tri=True,
                            stream_window=settings.traversal_stream,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                            sort_hint=(hint_shadow if worksort else None),
                        )
                        st["occ_prime"] = jnp.where(need_shadow, occ_tri, st["occ_prime"])
                        st["ps_out"] = jnp.where(
                            need_shadow & (st["bounce"] == 0), occ_tri, st["ps_out"]
                        )
                    else:
                        occluded = wide.any_hit(
                            bvh, shadow_rays, mask=need_shadow, chunks=n_chunks,
                            sort_rays=settings.sort_rays and settings.sort_shadow_rays,
                            stream_window=settings.traversal_stream,
                            refill_every=settings.stream_refill, unroll=settings.traversal_unroll,
                            sort_hint=(hint_shadow if worksort else None),
                        )
                    if settings.geometry_axis:
                        occluded = jax.lax.pmax(occluded.astype(jnp.int32), settings.geometry_axis) > 0
                    st["accumulated"] = st["accumulated"] + jnp.where(
                        (need_shadow & ~occluded)[:, None], st["color"] * direct, 0.0
                    )

                # throughput: diffuse-only, AO on indirect (Raytracing.metal:746-748)
                new_color = st["color"] * diffuse_color * ((1.0 - metallic) * ao)[:, None]
                st["color"] = jnp.where(lit[:, None], new_color, st["color"])
                dead = S.length(st["color"]) < 0.001
                st["active"] = st["active"] & ~(lit & dead)
                lit = lit & ~dead

            # --- cosine-hemisphere bounce (Raytracing.metal:755-774) ---------
            u_b = jnp.stack([_qmc_v5[3], _qmc_v5[4]], -1)
            local_dir = S.sample_cosine_hemisphere(u_b)
            bounce_dir = S.align_hemisphere_with_normal(local_dir, shading_nrm)
            st["ray_o"] = jnp.where(lit[:, None], world_point + nrm * 1e-3, st["ray_o"])
            st["ray_d"] = jnp.where(lit[:, None], bounce_dir, st["ray_d"])
            st["step"] = jnp.where(lit, st["step"] + 1, st["step"])
            st["bounce"] = jnp.where(lit, st["bounce"] + 1, st["bounce"])
            st["tpasses"] = jnp.where(lit, 0, st["tpasses"])

            st["active"] = st["active"] & (st["bounce"] < settings.max_bounces)
            st["iter"] = st["iter"] + 1
            return st

    def project_primary(st):
        """Post-loop primary depth/motion from the recorded bounce-0 hit."""
        if settings.debug_mode != T.DEBUG_MODE_MOTION:
            # post-loop primary depth/motion from the recorded bounce-0 hit:
            # identical expressions to the reference path (Raytracing.metal:
            # 342-389), evaluated once per sample instead of per iteration
            tri_p = jnp.maximum(st["prim_tri"], 0)
            u_p = st["prim_u"][:, None]
            v_p = st["prim_v"][:, None]
            w_p = 1.0 - u_p - v_p
            mrow_p = _tri_rows(geom.motion_rows, tri_p, geom, settings)
            obj_pos_w = u_p * mrow_p[:, 3:6] + v_p * mrow_p[:, 6:9] + w_p * mrow_p[:, 0:3]
            prev_pos_w = u_p * mrow_p[:, 12:15] + v_p * mrow_p[:, 15:18] + w_p * mrow_p[:, 9:12]
            sx, sy, pdepth = _project(uniforms.camera, obj_pos_w)
            psx, psy, _ = _project(uniforms.previous_camera, prev_pos_w)
            right_scale = jnp.maximum(S.length(uniforms.camera.right), 1e-5)
            up_scale = jnp.maximum(S.length(uniforms.camera.up), 1e-5)
            motion_px_x = (sx - psx) * (width_f / (2.0 * right_scale))
            motion_px_y = -((sy - psy) * (height_f / (2.0 * up_scale)))  # +Y down
            prim_ok = st["prim_tri"] >= 0
            st["depth"] = jnp.where(prim_ok, jnp.maximum(pdepth, 1.0e-3), st["depth"])
            st["motion"] = jnp.where(
                prim_ok[:, None], jnp.stack([motion_px_x, motion_px_y], -1), st["motion"]
            )
        return st

    def trace_one_sample(sample_index, total_color, had0, depth0, motion0, g0,
                         prime_p, prime_s, hint):
        """Body of the spp loop (Raytracing.metal:269-790). Returns the
        sample radiance and (on sample 0) primary depth/motion/G-buffer."""
        state = init_state(jnp.full((P,), sample_index, jnp.int32),
                           prime_p, prime_s, had0, motion0, hint0=hint)
        st = jax.lax.while_loop(cond, body, state)
        st = project_primary(st)
        new_pp = st["prim_out"] if priming else prime_p
        new_ps = st["ps_out"] if priming else prime_s
        new_hint = st["cam_pops"] if worksort else hint
        return (
            st["accumulated"],
            st["had_primary"],
            st["depth"],
            st["motion"],
            (st["gb_diff"], st["gb_spec"], st["gb_norm"], st["gb_rough"]),
            st["rays"],
            new_pp,
            new_ps,
            new_hint,
        )

    # --- persistent-lane driver ----------------------------------------------
    # One loop for the whole sample budget: a lane whose path dies respawns
    # straight into its next sample, so the tile rides a single while loop at
    # high occupancy instead of per-sample loops that each ramp down to a few
    # live lanes. Sample order, per-lane QMC streams, per-sample radiance
    # flush order, and the honest ray counter are identical to the sample-loop
    # driver, so results are bit-equal (test_persistent.py). Requires a fixed
    # per-lane sample count (no motion-adaptive extras: their sample-0 motion
    # input is only projected post-loop) and the undeferred shadow path.
    persistent = (
        settings.persistent_samples
        and max_extra == 0
        and not fused
        and settings.debug_mode != T.DEBUG_MODE_MOTION
    )

    def _run_persistent():
        st = init_state(jnp.zeros((P,), jnp.int32), prime_primary, prime_shadow,
                        jnp.zeros((P,), bool), jnp.zeros((P, 2), f32))
        st["total_color"] = zero3

        def pcond(st):
            return jnp.any(st["active"]) & (st["iter"] < max_iters * base_samples + 1)

        def pbody(st):
            st = body(st)
            respawn = ~st["active"] & (st["sidx"] + 1 < base_samples)
            # flush the finished sample's radiance exactly once, in sample
            # order per lane (matches the sample-loop driver's addition order)
            r3 = respawn[:, None]
            st["total_color"] = st["total_color"] + jnp.where(
                r3, st["accumulated"], 0.0)
            st["sidx"] = jnp.where(respawn, st["sidx"] + 1, st["sidx"])
            ro, rd = camera_rays(st["sidx"])
            st["ray_o"] = jnp.where(r3, ro, st["ray_o"])
            st["ray_d"] = jnp.where(r3, rd, st["ray_d"])
            st["color"] = jnp.where(r3, 1.0, st["color"])
            st["accumulated"] = jnp.where(r3, 0.0, st["accumulated"])
            st["bounce"] = jnp.where(respawn, 0, st["bounce"])
            st["step"] = jnp.where(respawn, 0, st["step"])
            st["tpasses"] = jnp.where(respawn, 0, st["tpasses"])
            st["active"] = st["active"] | respawn
            if priming:
                st["pp_cur"] = jnp.where(respawn, st["prim_out"], st["pp_cur"])
                st["occ_prime"] = jnp.where(respawn, st["ps_out"], st["occ_prime"])
            return st

        st = jax.lax.while_loop(pcond, pbody, st)
        st = project_primary(st)
        total_color = st["total_color"] + st["accumulated"]  # last sample's flush
        total_samples = jnp.full((P,), base_samples, jnp.int32)
        g0 = (st["gb_diff"], st["gb_spec"], st["gb_norm"], st["gb_rough"])
        pp_out = st["prim_out"] if priming else prime_primary
        ps_out = st["ps_out"] if priming else prime_shadow
        return (total_color, total_samples, st["had_primary"], st["depth"],
                st["motion"], g0, st["rays"], pp_out, ps_out)

    # --- sample loop with motion-adaptive extra samples ----------------------
    # (Raytracing.metal:263-293,779-789)
    def sample_body(carry):
        (sample_index, total_color, total_samples, had0, depth0, motion0, g0,
         rays_total, pp, ps, hint) = carry
        (radiance, had, depth, motion, g, rays_n, pp_new, ps_new,
         hint_new) = trace_one_sample(
            sample_index, total_color, had0, depth0, motion0, g0, pp, ps, hint
        )
        counted = sample_index < total_samples
        total_color = total_color + jnp.where(counted[:, None], radiance, 0.0)
        rays_total = rays_total + jnp.where(counted, rays_n, 0)
        # later samples of this pixel prime with THIS sample's primary hit /
        # occluder / camera step count (sub-pixel jitter rarely changes them)
        pp = jnp.where(counted, pp_new, pp)
        ps = jnp.where(counted, ps_new, ps)
        hint = jnp.where(counted, hint_new, hint)

        is0 = sample_index == 0
        had0 = jnp.where(is0, had, had0)
        depth0 = jnp.where(is0, depth, depth0)
        motion0 = jnp.where(is0, motion, motion0)
        g0 = tuple(jnp.where(is0, gi, g0i) for gi, g0i in zip(g, g0))

        if max_extra > 0:
            # decided once, after sample 0 (Raytracing.metal:779-789)
            motion_mag = jnp.maximum(S.length(motion), S.length(prev_motion))
            low = jnp.maximum(uniforms.motion_sampling_low_px, 0.0)
            high = jnp.maximum(uniforms.motion_sampling_high_px, low + 1e-3)
            t = jnp.clip((motion_mag - low) / (high - low), 0.0, 1.0)
            extra = jnp.clip(jnp.round(t * max_extra).astype(jnp.int32), 0, max_extra)
            total_samples = jnp.where(is0, base_samples + extra, total_samples)
        return (sample_index + 1, total_color, total_samples, had0, depth0, motion0,
                g0, rays_total, pp, ps, hint)

    # (the round-2j MRT_BISECT_STAGE stage-truncation hook lived here; removed
    # after the speculator diagnosis — see docs/PERF.md round 3a and git history)

    P3 = jnp.zeros((P, 3), jnp.float32)
    carry0 = (
        jnp.zeros((), jnp.int32),
        P3,
        jnp.full((P,), base_samples, jnp.int32),
        jnp.zeros((P,), bool),
        jnp.full((P,), 1.0e8, jnp.float32),
        jnp.zeros((P, 2), jnp.float32),
        (P3, P3, P3, jnp.zeros((P,), jnp.float32)),
        jnp.zeros((P,), jnp.int32),
        jnp.asarray(prime_primary, jnp.int32),
        jnp.asarray(prime_shadow, jnp.int32),
        jnp.asarray(step_hint, jnp.int32),
    )

    def sample_cond(carry):
        # run until every pixel's totalSamples is reached (the reference's
        # per-thread loop bound, Raytracing.metal:269); tiles where no pixel
        # earned extra samples stop at base_samples.
        sample_index, _, total_samples = carry[0], carry[1], carry[2]
        return (sample_index < sample_stride) & (sample_index < jnp.max(total_samples))

    if persistent:
        (total_color, total_samples, had0, depth0, motion0, g0, rays_total,
         prime_p_out, prime_s_out) = _run_persistent()
        hint_out = jnp.asarray(step_hint, jnp.int32)
    else:
        (_, total_color, total_samples, had0, depth0, motion0, g0, rays_total,
         prime_p_out, prime_s_out, hint_out) = jax.lax.while_loop(
            sample_cond, sample_body, carry0)

    # average all samples (Raytracing.metal:793)
    total_color = total_color / jnp.maximum(total_samples, 1).astype(jnp.float32)[:, None]

    return TileOutputs(
        color=total_color,
        depth=depth0,
        motion=motion0,
        diffuse_albedo=g0[0],
        specular_albedo=g0[1],
        normal=g0[2],
        roughness=g0[3],
        rays_traced=rays_total,
        prime_primary=prime_p_out,
        prime_shadow=prime_s_out,
        step_hint=hint_out,
    )


def trace_block(
    settings: T.RenderSettings,
    statics: SceneStatics,
    scene: SceneData,
    bvh,  # WideBVH or ClusterSet, per settings.traversal_backend
    geom: Geometry,
    uniforms: T.FrameUniforms,
    offsets: jnp.ndarray,  # (h_blk, W) int32
    prev_motion: jnp.ndarray,  # (h_blk, W, 2)
    y0: jnp.ndarray | int = 0,  # global row of the block's first row
    sample_base: jnp.ndarray | None = None,
    prime_primary: jnp.ndarray | None = None,  # (h_blk, W) int32
    prime_shadow: jnp.ndarray | None = None,  # (h_blk, W) int32
    step_hint: jnp.ndarray | None = None,  # (h_blk, W) int32
):
    """Trace a contiguous row block of the image, tiled into fixed-size ray
    batches via ``lax.map`` (the 16x16-threadgroup-grid analog,
    Renderer.swift:1446-1451). Returns TileOutputs with (h_blk, W) leading dims.

    ``y0`` offsets pixel_y so data-parallel shards each trace their own rows
    of the global image.
    """
    h_blk, w = offsets.shape
    n_pix = h_blk * w
    tile = min(settings.tile_pixels, n_pix)
    n_tiles = -(-n_pix // tile)
    padded = n_tiles * tile

    flat_idx = jnp.arange(padded, dtype=jnp.int32)
    px = (flat_idx % w).reshape(n_tiles, tile)
    py = (jnp.minimum(flat_idx // w, h_blk - 1) + y0).reshape(n_tiles, tile)
    offs = jnp.pad(offsets.reshape(-1), (0, padded - n_pix)).reshape(n_tiles, tile)
    pmot = jnp.pad(prev_motion.reshape(-1, 2), ((0, padded - n_pix), (0, 0))).reshape(
        n_tiles, tile, 2
    )

    def pad_prime(p):
        if p is None:
            p = jnp.full((h_blk, w), -1, jnp.int32)
        return jnp.pad(p.reshape(-1), (0, padded - n_pix), constant_values=-1).reshape(
            n_tiles, tile
        )

    pprim = pad_prime(prime_primary)
    pshad = pad_prime(prime_shadow)
    if step_hint is None:
        step_hint = jnp.zeros((h_blk, w), jnp.int32)
    phint = jnp.pad(step_hint.reshape(-1), (0, padded - n_pix)).reshape(
        n_tiles, tile
    )

    def do_tile(args):
        tpx, tpy, toffs, tpmot, tpp, tps, thint = args
        return trace_tile(
            settings, statics, scene, bvh, geom, uniforms, tpx, tpy, toffs, tpmot,
            sample_base=sample_base, prime_primary=tpp, prime_shadow=tps,
            step_hint=thint,
        )

    out = jax.lax.map(do_tile, (px, py, offs, pmot, pprim, pshad, phint))

    def unpad(a):
        a = a.reshape((padded,) + a.shape[2:])[:n_pix]
        return a.reshape((h_blk, w) + a.shape[1:])

    return TileOutputs(*(unpad(x) for x in out))
