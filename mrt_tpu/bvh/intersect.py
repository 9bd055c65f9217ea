"""Ray/primitive intersection primitives.

The TPU-native replacement for Metal's hardware
``intersector<triangle_data, instancing>`` (Raytracing.metal:301-318): a
vectorized Möller–Trumbore triangle test and a slab ray/AABB test, both pure
``jnp`` so they run on the VPU and fuse into the traversal loop.

Conventions match the Metal intersector:
* no backface culling, ``force_opacity(opaque)`` (Raytracing.metal:304)
* barycentric (u, v) weight vertices 1 and 2; vertex 0 gets 1-u-v — the same
  convention ``interpolateVertexAttribute`` compensates for
  (Raytracing.metal:61-74).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Hits, Rays

_EPS = 1e-9


def ray_triangle(
    origin: jnp.ndarray,  # (..., 3)
    direction: jnp.ndarray,  # (..., 3)
    v0: jnp.ndarray,  # (..., 3)
    v1: jnp.ndarray,  # (..., 3)
    v2: jnp.ndarray,  # (..., 3)
    t_min: jnp.ndarray | float = 0.0,
    t_max: jnp.ndarray | float = jnp.inf,
):
    """Möller–Trumbore. Returns (hit_mask, t, u, v); all broadcast over leading dims."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # No culling: accept both signs, reject near-degenerate.
    valid = jnp.abs(det) > _EPS
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        valid
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
    )
    return hit, t, u, v


def ray_aabb(
    origin: jnp.ndarray,  # (..., 3)
    inv_direction: jnp.ndarray,  # (..., 3) precomputed 1/d (with inf for d=0)
    bbox_min: jnp.ndarray,  # (..., 3)
    bbox_max: jnp.ndarray,  # (..., 3)
    t_max: jnp.ndarray | float = jnp.inf,
):
    """Slab test. Returns (hit_mask, t_entry). Handles rays starting inside."""
    t0 = (bbox_min - origin) * inv_direction
    t1 = (bbox_max - origin) * inv_direction
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_max)
    return hit, jnp.maximum(t_near, 0.0)


def safe_inv_dir(direction: jnp.ndarray) -> jnp.ndarray:
    """1/d with exact-zero components mapped to a huge finite value so the slab
    test stays NaN-free."""
    d = direction
    tiny = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    return 1.0 / tiny


def brute_force_closest_hit(
    rays: Rays,
    tri_v0: jnp.ndarray,  # (T,3)
    tri_v1: jnp.ndarray,
    tri_v2: jnp.ndarray,
    t_min: float = 0.0,
) -> Hits:
    """O(R*T) closest-hit oracle — stands in for the absent Metal ground truth
    in tests (SURVEY.md §4) and validates BVH traversal."""
    o = rays.origin[:, None, :]  # (R,1,3)
    d = rays.direction[:, None, :]
    hit, t, u, v = ray_triangle(
        o, d, tri_v0[None], tri_v1[None], tri_v2[None], t_min=t_min, t_max=rays.max_distance[:, None]
    )
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    best_t = t[r, best]
    found = jnp.isfinite(best_t)
    return Hits(
        t=best_t,
        triangle=jnp.where(found, best.astype(jnp.int32), -1),
        u=jnp.where(found, u[r, best], 0.0),
        v=jnp.where(found, v[r, best], 0.0),
    )


def brute_force_any_hit(
    rays: Rays,
    tri_v0: jnp.ndarray,
    tri_v1: jnp.ndarray,
    tri_v2: jnp.ndarray,
    t_min: float = 0.0,
) -> jnp.ndarray:
    """O(R*T) any-hit oracle (shadow rays). Returns (R,) bool."""
    o = rays.origin[:, None, :]
    d = rays.direction[:, None, :]
    hit, _, _, _ = ray_triangle(
        o, d, tri_v0[None], tri_v1[None], tri_v2[None], t_min=t_min, t_max=rays.max_distance[:, None]
    )
    return jnp.any(hit, axis=1)
