"""Vectorized BVH traversal — the TPU replacement for the hardware intersector
calls ``i.intersect(ray, accelerationStructure)`` (Raytracing.metal:318,737).

GPU-style per-thread stack traversal is re-shaped for the VPU: the stack is a
(R, DEPTH) array carried through a ``lax.while_loop``; every lane pops a node,
tests one triangle (leaf lanes) and two child AABBs (internal lanes) per
iteration, ordered near-child-first so the closest-hit t prunes far subtrees.
All memory access is `jnp.take` gathers over the SoA node arrays.

Two entry points mirror the intersector's two modes:
* :func:`closest_hit`  — ``accept_any_intersection(false)`` (Raytracing.metal:314)
* :func:`any_hit`      — ``accept_any_intersection(true)`` shadow rays
  (Raytracing.metal:730)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Hits, Rays
from .intersect import ray_aabb, ray_triangle, safe_inv_dir
from .lbvh import BVH

# Karras trees over <= 2^20 tris stay well under this (depth <= ~64).
STACK_DEPTH = 64


def _gather3(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(arr, idx, axis=0)


def closest_hit(
    bvh: BVH,
    tri_v0: jnp.ndarray,  # (T,3) original triangle order
    tri_v1: jnp.ndarray,
    tri_v2: jnp.ndarray,
    rays: Rays,
    t_min: float = 0.0,
    mask: jnp.ndarray | None = None,
) -> Hits:
    """Closest-hit traversal for a batch of rays. Returns original-order
    triangle ids (instance decode happens in the shade stage). ``mask``
    pre-disables lanes (retired wavefront rays report a miss)."""
    n_rays = rays.origin.shape[0]
    n_internal = bvh.n_internal
    inv_dir = safe_inv_dir(rays.direction)

    if n_internal == 0:
        # Single-triangle scene: direct test.
        tid = bvh.leaf_tri[0]
        hit, t, u, v = ray_triangle(
            rays.origin, rays.direction, tri_v0[tid], tri_v1[tid], tri_v2[tid],
            t_min=t_min, t_max=rays.max_distance,
        )
        if mask is not None:
            hit = hit & mask
        return Hits(
            t=jnp.where(hit, t, jnp.inf),
            triangle=jnp.where(hit, tid.astype(jnp.int32), -1),
            u=jnp.where(hit, u, 0.0),
            v=jnp.where(hit, v, 0.0),
        )

    lane = jnp.arange(n_rays)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_tri, best_u, best_v = state
        active = sp > 0
        sp_pop = jnp.maximum(sp - 1, 0)
        node = stack[lane, sp_pop]
        node = jnp.where(active, node, 0)
        sp = jnp.where(active, sp_pop, sp)

        is_leaf = node >= n_internal

        # ---- leaf lanes: single-triangle Möller–Trumbore --------------------
        leaf_idx = jnp.clip(node - n_internal, 0, bvh.n_tris - 1)
        tri = bvh.leaf_tri[leaf_idx]
        l_hit, l_t, l_u, l_v = ray_triangle(
            rays.origin, rays.direction,
            _gather3(tri_v0, tri), _gather3(tri_v1, tri), _gather3(tri_v2, tri),
            t_min=t_min, t_max=jnp.minimum(best_t, rays.max_distance),
        )
        take = active & is_leaf & l_hit & (l_t < best_t)
        best_t = jnp.where(take, l_t, best_t)
        best_tri = jnp.where(take, tri.astype(jnp.int32), best_tri)
        best_u = jnp.where(take, l_u, best_u)
        best_v = jnp.where(take, l_v, best_v)

        # ---- internal lanes: two child AABB tests, push far then near -------
        inode = jnp.clip(node, 0, n_internal - 1)
        lc = bvh.left[inode]
        rc = bvh.right[inode]
        t_cap = jnp.minimum(best_t, rays.max_distance)
        hit_l, t_l = ray_aabb(rays.origin, inv_dir, _gather3(bvh.bbox_min, lc), _gather3(bvh.bbox_max, lc), t_max=t_cap)
        hit_r, t_r = ray_aabb(rays.origin, inv_dir, _gather3(bvh.bbox_min, rc), _gather3(bvh.bbox_max, rc), t_max=t_cap)

        internal = active & ~is_leaf
        left_near = t_l <= t_r
        near = jnp.where(left_near, lc, rc)
        far = jnp.where(left_near, rc, lc)
        hit_near = jnp.where(left_near, hit_l, hit_r)
        hit_far = jnp.where(left_near, hit_r, hit_l)

        # push far first so near pops first
        push_far = internal & hit_far
        cur = stack[lane, jnp.minimum(sp, STACK_DEPTH - 1)]
        stack = stack.at[lane, jnp.minimum(sp, STACK_DEPTH - 1)].set(jnp.where(push_far, far, cur))
        sp = jnp.where(push_far, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        push_near = internal & hit_near
        cur = stack[lane, jnp.minimum(sp, STACK_DEPTH - 1)]
        stack = stack.at[lane, jnp.minimum(sp, STACK_DEPTH - 1)].set(jnp.where(push_near, near, cur))
        sp = jnp.where(push_near, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        return stack, sp, best_t, best_tri, best_u, best_v

    stack0 = jnp.zeros((n_rays, STACK_DEPTH), jnp.int32)  # root = node 0 pre-pushed
    sp0 = jnp.ones((n_rays,), jnp.int32)
    if mask is not None:
        sp0 = jnp.where(mask, sp0, 0)
    state = (
        stack0,
        sp0,
        jnp.full((n_rays,), jnp.inf, jnp.float32),
        jnp.full((n_rays,), -1, jnp.int32),
        jnp.zeros((n_rays,), jnp.float32),
        jnp.zeros((n_rays,), jnp.float32),
    )
    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return Hits(t=best_t, triangle=best_tri, u=best_u, v=best_v)


def any_hit(
    bvh: BVH,
    tri_v0: jnp.ndarray,
    tri_v1: jnp.ndarray,
    tri_v2: jnp.ndarray,
    rays: Rays,
    t_min: float = 0.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Any-hit (occlusion) traversal: lanes terminate on first hit. ``mask``
    pre-disables lanes (inactive shadow rays in the wavefront). Returns (R,) bool."""
    n_rays = rays.origin.shape[0]
    n_internal = bvh.n_internal
    inv_dir = safe_inv_dir(rays.direction)

    if n_internal == 0:
        tid = bvh.leaf_tri[0]
        hit, _, _, _ = ray_triangle(
            rays.origin, rays.direction, tri_v0[tid], tri_v1[tid], tri_v2[tid],
            t_min=t_min, t_max=rays.max_distance,
        )
        return hit if mask is None else hit & mask

    lane = jnp.arange(n_rays)

    def cond(state):
        _, sp, occluded = state
        return jnp.any((sp > 0) & ~occluded)

    def body(state):
        stack, sp, occluded = state
        active = (sp > 0) & ~occluded
        sp_pop = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[lane, sp_pop], 0)
        sp = jnp.where(active, sp_pop, sp)

        is_leaf = node >= n_internal
        leaf_idx = jnp.clip(node - n_internal, 0, bvh.n_tris - 1)
        tri = bvh.leaf_tri[leaf_idx]
        l_hit, _, _, _ = ray_triangle(
            rays.origin, rays.direction,
            _gather3(tri_v0, tri), _gather3(tri_v1, tri), _gather3(tri_v2, tri),
            t_min=t_min, t_max=rays.max_distance,
        )
        occluded = occluded | (active & is_leaf & l_hit)

        inode = jnp.clip(node, 0, n_internal - 1)
        lc = bvh.left[inode]
        rc = bvh.right[inode]
        hit_l, _ = ray_aabb(rays.origin, inv_dir, _gather3(bvh.bbox_min, lc), _gather3(bvh.bbox_max, lc), t_max=rays.max_distance)
        hit_r, _ = ray_aabb(rays.origin, inv_dir, _gather3(bvh.bbox_min, rc), _gather3(bvh.bbox_max, rc), t_max=rays.max_distance)

        internal = active & ~is_leaf
        push_l = internal & hit_l
        cur = stack[lane, jnp.minimum(sp, STACK_DEPTH - 1)]
        stack = stack.at[lane, jnp.minimum(sp, STACK_DEPTH - 1)].set(jnp.where(push_l, lc, cur))
        sp = jnp.where(push_l, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        push_r = internal & hit_r
        cur = stack[lane, jnp.minimum(sp, STACK_DEPTH - 1)]
        stack = stack.at[lane, jnp.minimum(sp, STACK_DEPTH - 1)].set(jnp.where(push_r, rc, cur))
        sp = jnp.where(push_r, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        return stack, sp, occluded

    stack0 = jnp.zeros((n_rays, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((n_rays,), jnp.int32)
    if mask is not None:
        sp0 = jnp.where(mask, sp0, 0)
    occluded0 = jnp.zeros((n_rays,), bool)
    _, _, occluded = jax.lax.while_loop(cond, body, (stack0, sp0, occluded0))
    return occluded
