"""Shading math — vectorized ports of the megakernel's helper functions
(Raytracing.metal:59-218). Everything operates on (R, ...) ray batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import types as T

PI = 3.14159265358979323846


def take_rows_onehot(table, idx, max_rows: int = 128):
    """Row lookup that lowers to a one-hot MXU matmul for TINY tables.

    XLA TPU gather costs ~10-20 ns per output ROW nearly independent of
    table size (docs/PERF.md round 1), so a 32k-lane lookup into the 13-row
    material table profiled the SAME ~50 us as one into the 95k-row shade
    table (round 2h xplane: fusion.325 / fusion.336 = 47 ms of a 1553 ms
    frame). A (N,L)@(L,W) one-hot matmul is MXU noise instead. HIGHEST
    precision keeps f32 rows bit-exact (a one-hot row SELECTS a value,
    never mixes two). Falls back to gather above ``max_rows`` where the
    one-hot itself would dominate."""
    n_rows = table.shape[0]
    if n_rows > max_rows:
        return jnp.take(table, idx, axis=0)
    onehot = (idx[:, None] == jnp.arange(n_rows, dtype=idx.dtype)[None, :])
    return jnp.dot(onehot.astype(table.dtype), table,
                   precision=jax.lax.Precision.HIGHEST)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def normalize(v, eps=0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def length(v):
    return jnp.linalg.norm(v, axis=-1)


def interpolate_attribute(attr: jnp.ndarray, indices: jnp.ndarray, tri: jnp.ndarray, u, v):
    """``interpolateVertexAttribute`` (Raytracing.metal:61-74): barycentric
    (u, v) weight vertices 1 and 2, vertex 0 gets 1-u-v (after the reference's
    rotated index fetch this is the standard formula).

    attr: (V, C); indices: (T, 3); tri: (R,) int32; u/v: (R,).
    """
    idx = jnp.take(indices, jnp.maximum(tri, 0), axis=0)  # (R,3)
    a0 = jnp.take(attr, idx[:, 0], axis=0)
    a1 = jnp.take(attr, idx[:, 1], axis=0)
    a2 = jnp.take(attr, idx[:, 2], axis=0)
    w = (1.0 - u - v)[:, None]
    return u[:, None] * a1 + v[:, None] * a2 + w * a0


def sample_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Raytracing.metal:79-89. u: (R,2) -> (R,3) with +Y up."""
    phi = 2.0 * PI * u[:, 0]
    cos_phi = jnp.cos(phi)
    sin_phi = jnp.sin(phi)
    cos_theta = jnp.sqrt(u[:, 1])
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack([sin_theta * cos_phi, cos_theta, sin_theta * sin_phi], axis=-1)


def align_hemisphere_with_normal(sample: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Raytracing.metal:133-148 (incl. the magic not-quite-up vector)."""
    up = normal
    right = normalize(jnp.cross(normal, jnp.asarray([0.0072, 1.0, 0.0034], jnp.float32)))
    forward = jnp.cross(right, up)
    return sample[:, 0:1] * right + sample[:, 1:2] * up + sample[:, 2:3] * forward


def distribution_ggx(n_dot_h, alpha):
    """Raytracing.metal:150-154."""
    a2 = alpha * alpha
    denom = (n_dot_h * n_dot_h) * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * denom * denom, 1e-7)


def geometry_schlick_ggx(n_dot_v, k):
    """Raytracing.metal:156-158."""
    return n_dot_v / jnp.maximum(n_dot_v * (1.0 - k) + k, 1e-7)


def geometry_smith(n_dot_v, n_dot_l, k):
    """Raytracing.metal:160-162."""
    return geometry_schlick_ggx(n_dot_v, k) * geometry_schlick_ggx(n_dot_l, k)


def fresnel_schlick(cos_theta, f0):
    """Raytracing.metal:164-166. f0: (R,3); cos_theta: (R,)."""
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)[..., None]


def sample_area_light(light_pos, light_fwd, light_right, light_up, light_color, u, position):
    """``sampleAreaLight`` (Raytracing.metal:95-129). All args (R, ...) batched.
    Returns (direction, color, distance)."""
    uu = u * 2.0 - 1.0
    sample_pos = light_pos + light_right * uu[:, 0:1] + light_up * uu[:, 1:2]
    direction = sample_pos - position
    distance = length(direction)
    inv_d = 1.0 / jnp.maximum(distance, 1e-3)
    direction = direction * inv_d[:, None]
    color = light_color * (inv_d * inv_d)[:, None]
    color = color * saturate(dot3(-direction, light_fwd))[:, None]
    return direction, color, distance


def evaluate_light(lights: T.Lights, light_index: jnp.ndarray, u_area: jnp.ndarray, position: jnp.ndarray):
    """One-of-N light evaluation (Raytracing.metal:591-643): gathers the picked
    light per ray, evaluates all 4 light-type formulas, selects by type.

    Returns (direction (R,3), color (R,3), distance (R,)).

    The eight per-field lookups are packed into ONE wide-row gather (gather
    cost is per row, ~width-free to 128 f32; docs/PERF.md). The pack itself
    is loop-invariant, so XLA hoists it out of the bounce loop; light types
    are small enums, exact through the f32 round trip."""
    packed = jnp.concatenate(
        [
            lights.type.astype(jnp.float32)[:, None],
            lights.position, lights.color, lights.forward,
            lights.right, lights.up, lights.direction,
            lights.cone_angle[:, None],
        ],
        axis=1,
    )  # (L, 20)
    row = take_rows_onehot(packed, light_index)
    ltype = row[:, 0].astype(jnp.int32)
    lpos = row[:, 1:4]
    lcol = row[:, 4:7]

    # Area (Raytracing.metal:597-607)
    a_dir, a_col, a_dist = sample_area_light(
        lpos, row[:, 7:10], row[:, 10:13], row[:, 13:16], lcol, u_area, position)

    # Spot (Raytracing.metal:608-632): color zero outside cone.
    s_vec = lpos - position
    s_dist = length(s_vec)
    s_inv = 1.0 / jnp.maximum(s_dist, 1e-3)
    s_dir = s_vec * s_inv[:, None]
    cone_dir = normalize(row[:, 16:19])
    spot_result = dot3(-s_dir, cone_dir)
    in_cone = spot_result > jnp.cos(row[:, 19])
    s_col = jnp.where(in_cone[:, None], lcol * (s_inv * s_inv)[:, None], 0.0)

    # Point (Raytracing.metal:633-638)
    p_col = lcol * (s_inv * s_inv)[:, None]

    # Sun (Raytracing.metal:639-643)
    sun_dir = -normalize(row[:, 16:19])
    inf = jnp.full_like(s_dist, jnp.inf)

    is_area = (ltype == T.LIGHT_TYPE_AREA)[:, None]
    is_spot = (ltype == T.LIGHT_TYPE_SPOTLIGHT)[:, None]
    is_point = (ltype == T.LIGHT_TYPE_POINTLIGHT)[:, None]

    direction = jnp.where(is_area, a_dir, jnp.where(is_spot | is_point, s_dir, sun_dir))
    color = jnp.where(is_area, a_col, jnp.where(is_spot, s_col, jnp.where(is_point, p_col, lcol)))
    distance = jnp.where(
        is_area[:, 0], a_dist, jnp.where(is_spot[:, 0] | is_point[:, 0], s_dist, inf)
    )
    return direction, color, distance


def compute_tangent_basis(positions_w, uvs, indices, tri, eps=1e-8):
    """``computeTangentBasis`` (Raytracing.metal:185-218) in world space.

    Returns (valid (R,), tangent (R,3), bitangent (R,3)). The reference
    computes tangents from object-space positions then transforms; we compute
    from world-space positions directly (same span for affine transforms)."""
    idx = jnp.take(indices, jnp.maximum(tri, 0), axis=0)
    p0 = jnp.take(positions_w, idx[:, 0], axis=0)
    p1 = jnp.take(positions_w, idx[:, 1], axis=0)
    p2 = jnp.take(positions_w, idx[:, 2], axis=0)
    uv0 = jnp.take(uvs, idx[:, 0], axis=0)
    uv1 = jnp.take(uvs, idx[:, 1], axis=0)
    uv2 = jnp.take(uvs, idx[:, 2], axis=0)
    return tangent_basis_rows(p0, p1, p2, uv0, uv1, uv2, eps)


def tangent_basis_rows(p0, p1, p2, uv0, uv1, uv2, eps=1e-8):
    """Tangent-basis math on pre-gathered per-hit verts/uvs. The wavefront
    feeds this from the already-gathered motion/shade rows — ONE wide row
    gather instead of compute_tangent_basis's seven narrow ones (same
    values: motion rows hold take(positions_w, idx), shade rows hold
    take(uvs, idx))."""
    e1 = p1 - p0
    e2 = p2 - p0
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    denom = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    valid = jnp.abs(denom) >= eps
    r = jnp.where(valid, 1.0 / jnp.where(valid, denom, 1.0), 0.0)[:, None]
    tangent = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r
    bitangent = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * r
    valid = valid & (length(tangent) > eps) & (length(bitangent) > eps)
    return valid, tangent, bitangent


def reinhard_tonemap(color: jnp.ndarray) -> jnp.ndarray:
    """c / (1 + c) (Shaders.metal:49)."""
    return color / (1.0 + color)
