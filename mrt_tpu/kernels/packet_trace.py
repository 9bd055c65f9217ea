"""Pallas packet-traversal kernel — BVH traversal with ZERO gathers.

The XLA wide-BVH traversal (bvh/wide.py) pays ~10-20 ns of gather latency per
ray per tree step. This kernel amortizes the memory access across a PACKET:
the packed node table lives resident in VMEM, a scalar SMEM stack drives the
descent, and each step does ONE dynamic row slice (a few cycles, not a
gather) whose AABB/triangle tests broadcast across all G rays on the VPU.

Per step:
  pop node (SMEM scalar) -> slice row (1, 128) from VMEM -> either
  * internal: (G, ARITY) slab tests, per-child any-hit reduction, push hit
    children (scalar stack ops under pl.when), or
  * leaf: (G, LEAF_K) Möller-Trumbore, masked per-ray best update.

Coherent packets visit nearly the union = per-ray node set, so the win over
the gather path scales with coherence (primary/shadow rays). Exposed as
traversal_backend="packet"; falls back to the wide path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh import wide
from ..bvh.wide import ARITY, IDS_OFF, LEAF_K, META_OFF, ROW, WideBVH, _ID_BIAS
from ..core.types import Hits, Rays

STACK = 64
DEFAULT_PACKET = 512


def _kernel(n_internal: int, any_hit_mode: bool,
            table_ref, rays_ref, out_ref, stack_ref):
    G = rays_ref.shape[1]
    ox = rays_ref[0, :, 0]
    oy = rays_ref[0, :, 1]
    oz = rays_ref[0, :, 2]
    dx = rays_ref[0, :, 3]
    dy = rays_ref[0, :, 4]
    dz = rays_ref[0, :, 5]
    tmax = rays_ref[0, :, 6]
    live = rays_ref[0, :, 7] > 0.0

    tiny = 1e-12
    ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)

    stack_ref[0] = 0  # root pre-pushed
    any_live = jnp.any(live)

    def cond(st):
        sp, best_t, best_tri, best_u, best_v = st
        more = (sp > 0) & any_live
        if any_hit_mode:
            more = more & jnp.any(live & (best_tri < 0))
        return more

    def body(st):
        sp, best_t, best_tri, best_u, best_v = st
        node = stack_ref[sp - 1]
        sp = sp - 1
        row = table_ref[node, :]  # (ROW,) single dynamic row slice
        is_leaf = node >= n_internal

        def leaf_branch(args):
            best_t, best_tri, best_u, best_v, sp = args
            K = LEAF_K
            v0x = row[0:K][None, :]
            v0y = row[K:2 * K][None, :]
            v0z = row[2 * K:3 * K][None, :]
            v1x = row[3 * K:4 * K][None, :]
            v1y = row[4 * K:5 * K][None, :]
            v1z = row[5 * K:6 * K][None, :]
            v2x = row[6 * K:7 * K][None, :]
            v2y = row[7 * K:8 * K][None, :]
            v2z = row[8 * K:9 * K][None, :]
            ids = jax.lax.bitcast_convert_type(row[IDS_OFF:IDS_OFF + K], jnp.int32) - _ID_BIAS

            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
            Dx, Dy, Dz = dx[:, None], dy[:, None], dz[:, None]
            px = Dy * e2z - Dz * e2y
            py = Dz * e2x - Dx * e2z
            pz = Dx * e2y - Dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(det) > 1e-9
            inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
            tx = ox[:, None] - v0x
            ty = oy[:, None] - v0y
            tz = oz[:, None] - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (Dx * qx + Dy * qy + Dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 0.0) & (t <= best_t[:, None]) & live[:, None]
            )
            t_m = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t_m, axis=1)
            oh = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1) == j[:, None]
            cand_t = jnp.sum(jnp.where(oh, t_m, 0.0), axis=1)
            cand_any = jnp.any(ok, axis=1)
            cand_tri = jnp.sum(jnp.where(oh, ids[None, :], 0), axis=1)
            cand_u = jnp.sum(jnp.where(oh, u, 0.0), axis=1)
            cand_v = jnp.sum(jnp.where(oh, v, 0.0), axis=1)
            take = cand_any & (cand_t < best_t)
            return (
                jnp.where(take, cand_t, best_t),
                jnp.where(take, cand_tri, best_tri),
                jnp.where(take, cand_u, best_u),
                jnp.where(take, cand_v, best_v),
                sp,
            )

        def internal_branch(args):
            best_t, best_tri, best_u, best_v, sp = args
            A = ARITY
            bminx = row[0:A][None, :]
            bminy = row[A:2 * A][None, :]
            bminz = row[2 * A:3 * A][None, :]
            bmaxx = row[3 * A:4 * A][None, :]
            bmaxy = row[4 * A:5 * A][None, :]
            bmaxz = row[5 * A:6 * A][None, :]
            Ix, Iy, Iz = ix[:, None], iy[:, None], iz[:, None]
            t0x = (bminx - ox[:, None]) * Ix
            t1x = (bmaxx - ox[:, None]) * Ix
            t0y = (bminy - oy[:, None]) * Iy
            t1y = (bmaxy - oy[:, None]) * Iy
            t0z = (bminz - oz[:, None]) * Iz
            t1z = (bmaxz - oz[:, None]) * Iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= best_t[:, None]) & live[:, None]
            hit_any = jnp.any(hit, axis=0)  # (A,)

            meta = jax.lax.bitcast_convert_type(row[META_OFF:META_OFF + A], jnp.int32) - _ID_BIAS
            # order children far-to-near by packet-min entry so near pops first.
            # Mosaic has no sort primitive: compute descending ranks by pairwise
            # comparison (A x A elementwise + reduce), then invert the ranking.
            entry = jnp.where(hit, jnp.maximum(tnear, 0.0), jnp.inf)
            entry_min = jnp.min(entry, axis=0)  # (A,)
            e = jnp.where(jnp.isfinite(entry_min), entry_min, jnp.float32(-3.0e38))
            gt = e[:, None] < e[None, :]  # e_j > e_c -> j before c (descending)
            idx_a = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
            idx_b = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
            tie = (e[:, None] == e[None, :]) & (idx_b < idx_a)
            rank = jnp.sum((gt | tie).astype(jnp.int32), axis=1)  # (A,) descending
            # Mosaic can't dynamically index vector VALUES, so materialize the
            # ordered per-slot scalars with one-hot sums, then unroll the push
            # loop with static indices.
            ranks_oh = rank[None, :] == jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
            push_c = (hit_any & (meta >= 0) & jnp.isfinite(entry_min)).astype(jnp.int32)
            ordered_meta = jnp.sum(jnp.where(ranks_oh, meta[None, :], 0), axis=1)
            ordered_push = jnp.sum(jnp.where(ranks_oh, push_c[None, :], 0), axis=1)

            for k in range(A):  # static unroll
                push = ordered_push[k] > 0
                m_k = ordered_meta[k]

                def do_push(sp, m_k=m_k):
                    stack_ref[jnp.minimum(sp, STACK - 1)] = m_k
                    return jnp.minimum(sp + 1, STACK)

                sp = jax.lax.cond(push, do_push, lambda s: s, sp)
            return best_t, best_tri, best_u, best_v, sp

        best_t, best_tri, best_u, best_v, sp = jax.lax.cond(
            is_leaf, leaf_branch, internal_branch, (best_t, best_tri, best_u, best_v, sp)
        )
        return sp, best_t, best_tri, best_u, best_v

    sp0 = jnp.int32(1)
    st = (
        sp0,
        tmax,
        jnp.full((G,), -1, jnp.int32),
        jnp.zeros((G,), jnp.float32),
        jnp.zeros((G,), jnp.float32),
    )
    sp, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, st)

    out_ref[0, :, 0] = best_t
    out_ref[0, :, 1] = jax.lax.bitcast_convert_type(best_tri + _ID_BIAS, jnp.float32)
    out_ref[0, :, 2] = best_u
    out_ref[0, :, 3] = best_v


def packet_closest_hit(
    wbvh: WideBVH, rays: Rays, mask=None, packet: int = DEFAULT_PACKET,
    interpret: bool = False,
) -> Hits:
    """Closest-hit via the Pallas packet kernel. Rays are taken in their given
    order (callers pass coherent batches; the wavefront's coherence sort
    upstream makes packets tight)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rays.origin.shape[0]
    g = packet if n % packet == 0 else n
    p = n // g
    live = jnp.ones((n,), jnp.float32) if mask is None else mask.astype(jnp.float32)

    packed = jnp.concatenate(
        [
            rays.origin,
            rays.direction,
            rays.max_distance[:, None],
            live[:, None],
        ],
        axis=1,
    ).reshape(p, g, 8)

    kernel = functools.partial(_kernel, wbvh.n_internal, False)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, g, 4), jnp.float32),
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
            pl.BlockSpec((1, g, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(wbvh.table, packed)

    out = out.reshape(n, 4)
    tri = jax.lax.bitcast_convert_type(out[:, 1], jnp.int32) - _ID_BIAS
    found = tri >= 0
    return Hits(
        t=jnp.where(found, out[:, 0], jnp.inf),
        triangle=tri,
        u=out[:, 2],
        v=out[:, 3],
    )
