"""Cluster-packet tracer — the dense, gather-free alternative traversal.

The wide-BVH traversal (wide.py) is bound by XLA gather latency (~20 ns/row;
one row per ray per tree step). TPUs are the opposite of GPUs here: random
access is the scarce resource and dense FLOPs are nearly free. This module
therefore trades pointer-chasing for arithmetic:

* The scene's triangles are grouped into CLUSTERS of <=64 (a cut of the SAH/
  Karras tree, so clusters are spatially tight). Cluster triangle data lives
  CONTIGUOUSLY: fetching cluster c is a `dynamic_slice`, not a gather.
* Rays are coherence-sorted and processed in PACKETS. Per packet:
  1. slab-test every ray against every cluster AABB — a dense (G, C) VPU
     sweep with zero memory indirection;
  2. candidate clusters (any ray hit) are compacted and walked near-to-far
     in a `while_loop`; each step dynamic-slices one 64-triangle block and
     Möller-Trumbore-tests all G rays against all 64 triangles by pure
     broadcasting.
* Early exit: the packet stops once every live ray's best-t is closer than
  the next cluster's entry distance (closest-hit) or every shadow ray is
  occluded (any-hit).

Replaces the hardware intersector the same way wide.py does; selected via
RenderSettings.traversal_backend.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Hits, Rays
from . import lbvh

CLUSTER_SIZE = 64
TRI_ROW = 16  # [v0(3) v1(3) v2(3) tri_id pad(6)]

_ID_BIAS = 1 << 30  # see wide.py: dodge TPU denormal flush on bitcast ids


class ClusterSet(NamedTuple):
    tri_rows: jnp.ndarray  # (C*64, 16) f32, NaN-padded triangles
    bmin: jnp.ndarray  # (C, 3)
    bmax: jnp.ndarray  # (C, 3)
    leaf_tri: jnp.ndarray  # (C, 64) int32 original tri ids (-1 pad)

    @property
    def n_clusters(self) -> int:
        return self.leaf_tri.shape[0]


def build_topology(tri_centroids: np.ndarray) -> np.ndarray:
    """Cut the Karras binary tree at subtrees of <=CLUSTER_SIZE triangles.
    Returns (C, 64) int32 triangle ids (-1 padded); clusters are spatially
    tight because the tree is Morton-ordered."""
    n = tri_centroids.shape[0]
    if n <= CLUSTER_SIZE:
        row = np.full((1, CLUSTER_SIZE), -1, np.int32)
        row[0, :n] = np.arange(n)
        return row
    bl, br, _, order, _ = lbvh.build_topology(tri_centroids)
    from .wide import _binary_ranges

    lo, hi = _binary_ranges(bl, br, n)
    count = hi - lo + 1
    n_int = n - 1

    clusters = []
    stack = [0]
    while stack:
        node = stack.pop()
        if node >= n_int or count[node] <= CLUSTER_SIZE:
            lo_i = lo[node] if node < n_int else node - n_int
            hi_i = hi[node] if node < n_int else node - n_int
            tris = order[lo_i : hi_i + 1]
            row = np.full(CLUSTER_SIZE, -1, np.int32)
            row[: len(tris)] = tris
            clusters.append(row)
        else:
            stack.append(int(bl[node]))
            stack.append(int(br[node]))
    return np.stack(clusters).astype(np.int32)


def refit(cs: ClusterSet, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> ClusterSet:
    """Rebuild triangle blocks + cluster AABBs from world-space vertices.
    Dense and jittable (the per-frame refit stage)."""
    c = cs.n_clusters
    tid = jnp.maximum(cs.leaf_tri, 0).reshape(-1)  # (C*64,)
    pad = (cs.leaf_tri < 0).reshape(-1)

    w0 = jnp.where(pad[:, None], jnp.nan, jnp.take(v0, tid, axis=0))
    w1 = jnp.where(pad[:, None], jnp.nan, jnp.take(v1, tid, axis=0))
    w2 = jnp.where(pad[:, None], jnp.nan, jnp.take(v2, tid, axis=0))
    ids = jax.lax.bitcast_convert_type(cs.leaf_tri.reshape(-1) + _ID_BIAS, jnp.float32)
    rows = jnp.concatenate(
        [w0, w1, w2, ids[:, None], jnp.zeros((c * CLUSTER_SIZE, TRI_ROW - 10), jnp.float32)],
        axis=1,
    )

    stacked = jnp.stack([w0, w1, w2], axis=1).reshape(c, CLUSTER_SIZE, 3, 3)
    valid = ~pad.reshape(c, CLUSTER_SIZE)
    big = jnp.where(valid[:, :, None, None], stacked, jnp.inf)
    small = jnp.where(valid[:, :, None, None], stacked, -jnp.inf)
    bmin = jnp.min(big, axis=(1, 2)) - 1e-7
    bmax = jnp.max(small, axis=(1, 2)) + 1e-7
    return cs._replace(tri_rows=rows, bmin=bmin, bmax=bmax)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> ClusterSet:
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    leaf = build_topology((v0 + v1 + v2) / 3.0)
    c = leaf.shape[0]
    cs = ClusterSet(
        tri_rows=jnp.zeros((c * CLUSTER_SIZE, TRI_ROW), jnp.float32),
        bmin=jnp.zeros((c, 3), jnp.float32),
        bmax=jnp.zeros((c, 3), jnp.float32),
        leaf_tri=jnp.asarray(leaf),
    )
    return jax.jit(refit)(cs, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))


def _packet_trace(cs: ClusterSet, o, d, tmax, live, t_min, any_hit_mode: bool):
    """Trace one packet. o/d: (G,3); tmax/live: (G,). Returns result dict."""
    G = o.shape[0]
    C = cs.n_clusters

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)

    # ---- stage 1: dense (G, C) slab sweep --------------------------------
    t0 = (cs.bmin[None, :, :] - o[:, None, :]) * inv[:, None, :]  # (G, C, 3)
    t1 = (cs.bmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= tmax[:, None]) & live[:, None]
    entry = jnp.where(hit, jnp.maximum(tnear, 0.0), jnp.inf)

    any_hit_c = jnp.any(hit, axis=0)  # (C,)
    key = jnp.where(any_hit_c, jnp.min(entry, axis=0), jnp.inf)
    order = jnp.argsort(key)  # near-to-far candidate clusters
    n_cand = jnp.sum(any_hit_c.astype(jnp.int32))
    entry_sorted = jnp.sort(key)  # per-candidate min entry t

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    state = dict(
        k=jnp.zeros((), jnp.int32),
        best_t=jnp.asarray(tmax, jnp.float32),
        best_tri=jnp.full((G,), -1, jnp.int32),
        best_u=jnp.zeros((G,), jnp.float32),
        best_v=jnp.zeros((G,), jnp.float32),
        found=jnp.zeros((G,), bool),
    )

    def cond(st):
        k = st["k"]
        more = k < n_cand
        if any_hit_mode:
            # stop when every live shadow ray is already occluded
            return more & ~jnp.all(st["found"] | ~live)
        # stop when the next cluster starts beyond every ray's best hit
        next_entry = entry_sorted[jnp.minimum(k, C - 1)]
        return more & jnp.any(st["best_t"] >= next_entry)

    def body(st):
        c = order[st["k"]]
        block = jax.lax.dynamic_slice(cs.tri_rows, (c * CLUSTER_SIZE, 0), (CLUSTER_SIZE, TRI_ROW))
        v0x, v0y, v0z = block[None, :, 0], block[None, :, 1], block[None, :, 2]
        v1x, v1y, v1z = block[None, :, 3], block[None, :, 4], block[None, :, 5]
        v2x, v2y, v2z = block[None, :, 6], block[None, :, 7], block[None, :, 8]
        ids = jax.lax.bitcast_convert_type(block[:, 9], jnp.int32) - _ID_BIAS  # (64,)

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        valid = jnp.abs(det) > 1e-9
        inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = (
            valid
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= t_min)
            & (t <= st["best_t"][:, None])
            & live[:, None]
        )  # (G, 64)

        t_m = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_m, axis=1)  # (G,)
        ohj = jnp.arange(CLUSTER_SIZE, dtype=jnp.int32)[None, :] == j[:, None]
        cand_t = jnp.sum(jnp.where(ohj, t_m, 0.0), axis=1)
        cand_any = jnp.any(ok, axis=1)
        cand_tri = jnp.sum(jnp.where(ohj, ids[None, :], 0), axis=1)
        cand_u = jnp.sum(jnp.where(ohj, u, 0.0), axis=1)
        cand_v = jnp.sum(jnp.where(ohj, v, 0.0), axis=1)

        take = cand_any & (cand_t < st["best_t"])
        st["best_t"] = jnp.where(take, cand_t, st["best_t"])
        st["best_tri"] = jnp.where(take, cand_tri, st["best_tri"])
        st["best_u"] = jnp.where(take, cand_u, st["best_u"])
        st["best_v"] = jnp.where(take, cand_v, st["best_v"])
        st["found"] = st["found"] | cand_any
        st["k"] = st["k"] + 1
        return st

    st = jax.lax.while_loop(cond, body, state)
    return {k: st[k] for k in ("best_t", "best_tri", "best_u", "best_v", "found")}


def _trace(cs: ClusterSet, rays: Rays, t_min, any_hit_mode: bool, mask, packet: int):
    n_rays = rays.origin.shape[0]
    live0 = jnp.ones((n_rays,), bool) if mask is None else mask

    from .wide import _sort_keys_generic

    keys = _sort_keys_generic(rays, live0, cs.bmin.min(axis=0), cs.bmax.max(axis=0))
    perm = jnp.argsort(keys)
    o = jnp.take(rays.origin, perm, axis=0)
    d = jnp.take(rays.direction, perm, axis=0)
    tmax = jnp.take(rays.max_distance, perm, axis=0)
    live = jnp.take(live0, perm, axis=0)

    g = packet if n_rays % packet == 0 else n_rays
    n_packets = n_rays // g

    def do_packet(args):
        po, pd, pt, pl = args
        return _packet_trace(cs, po, pd, pt, pl, t_min, any_hit_mode)

    st = jax.lax.map(
        do_packet,
        (
            o.reshape(n_packets, g, 3),
            d.reshape(n_packets, g, 3),
            tmax.reshape(n_packets, g),
            live.reshape(n_packets, g),
        ),
    )
    st = {k: v.reshape((n_rays,) + v.shape[2:]) for k, v in st.items()}
    inv_perm = jnp.argsort(perm)  # inverse permutation (microbench_inv.py)
    return {k: jnp.take(v, inv_perm, axis=0) for k, v in st.items()}


def closest_hit(cs: ClusterSet, rays: Rays, t_min: float = 0.0, mask=None, packet: int = 256) -> Hits:
    st = _trace(cs, rays, t_min, False, mask, packet)
    found = st["best_tri"] >= 0
    return Hits(
        t=jnp.where(found, st["best_t"], jnp.inf),
        triangle=st["best_tri"],
        u=st["best_u"],
        v=st["best_v"],
    )


def any_hit(cs: ClusterSet, rays: Rays, t_min: float = 0.0, mask=None, packet: int = 256) -> jnp.ndarray:
    st = _trace(cs, rays, t_min, True, mask, packet)
    return st["found"]
