"""LBVH — the TPU-native replacement for Metal's opaque hardware acceleration
structure (``MTLAccelerationStructure``, built/refit at Renderer.swift:422-606,
994-1202 via Utilities.swift:37-290).

Design (SURVEY.md §7):
* **Topology build** = Karras binary radix tree over 30-bit Morton codes,
  vectorized NumPy on the host. Topology is static data shipped to the device
  once (the analog of the compacted BLAS build, Utilities.swift:37-93).
* **Refit** = bottom-up AABB propagation in pure JAX, fixed trip count =
  tree depth, so it jits into the per-frame step (the analog of
  ``refitMTL4AccelerationStructures``, Renderer.swift:1084-1202).
* Leaves hold one triangle each; internal nodes are 0..N-2 and leaf ``i``
  (in Morton-sorted order) is node ``(N-1)+i``.

There is no TLAS object: instances are flattened into one world-space BVH —
instance/skinning transforms are applied to the vertex pool as a batched
matmul each frame (MXU work), then the BVH is refit. Far moves degrade refit
quality, so the builder is cheap enough to re-run (scene-dirty → rebuild,
matching the refit-or-rebuild fallback at Renderer.swift:1141-1167).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BVH(NamedTuple):
    """Device-resident BVH. ``n_tris`` leaves, ``n_tris - 1`` internal nodes.

    Combined node ids: internal ``[0, N-2]``, leaf ``(N-1)+i`` for sorted-leaf i.
    """

    left: jnp.ndarray  # (N-1,) int32 combined child id
    right: jnp.ndarray  # (N-1,) int32
    parent: jnp.ndarray  # (2N-1,) int32, -1 for root
    leaf_tri: jnp.ndarray  # (N,) int32: Morton-sorted order -> original triangle id
    bbox_min: jnp.ndarray  # (2N-1, 3) f32
    bbox_max: jnp.ndarray  # (2N-1, 3) f32
    depth: int  # static: max tree depth (refit trip count)

    @property
    def n_tris(self) -> int:
        return self.leaf_tri.shape[0]

    @property
    def n_internal(self) -> int:
        return self.n_tris - 1


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint32 values (frexp exponent; ints < 2^53 exact)."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int32)


def _expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton_codes(centroids: np.ndarray, scene_min: np.ndarray, scene_max: np.ndarray) -> np.ndarray:
    """30-bit Morton code per centroid, normalized to the scene AABB."""
    extent = np.maximum(scene_max - scene_min, 1e-12)
    q = np.clip((centroids - scene_min) / extent, 0.0, 1.0)
    q = np.minimum((q * 1024.0).astype(np.uint32), 1023)
    return (_expand_bits(q[:, 0]) << np.uint32(2)) | (_expand_bits(q[:, 1]) << np.uint32(1)) | _expand_bits(q[:, 2])


def _delta_fn(keys_hi: np.ndarray, keys_lo: np.ndarray, n: int):
    """delta(i, j) = common-prefix length of augmented 64-bit keys (morton<<32 | index)."""

    def delta(i: np.ndarray, j: np.ndarray) -> np.ndarray:
        valid = (j >= 0) & (j < n)
        jc = np.clip(j, 0, n - 1)
        xh = keys_hi[i] ^ keys_hi[jc]
        xl = keys_lo[i] ^ keys_lo[jc]
        bl = np.where(xh > 0, 32 + _bit_length_u32(xh), _bit_length_u32(xl))
        return np.where(valid, 64 - bl, -1)

    return delta


def build_topology(tri_centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Karras 2012 binary radix tree, fully vectorized.

    Returns (left, right, parent, leaf_tri, depth) as NumPy arrays; combined
    node ids as documented on :class:`BVH`.
    """
    n = tri_centroids.shape[0]
    if n == 1:
        # Degenerate: a single leaf; synthesize a 1-node "tree" with no internals.
        return (
            np.zeros((0,), np.int32),
            np.zeros((0,), np.int32),
            np.array([-1], np.int32),
            np.array([0], np.int32),
            1,
        )

    scene_min = tri_centroids.min(axis=0)
    scene_max = tri_centroids.max(axis=0)
    codes = morton_codes(tri_centroids, scene_min, scene_max)
    order = np.argsort(codes, kind="stable").astype(np.int32)
    sorted_codes = codes[order]

    keys_hi = sorted_codes.astype(np.uint32)
    keys_lo = np.arange(n, dtype=np.uint32)  # augmented index bits break ties
    delta = _delta_fn(keys_hi, keys_lo, n)

    i = np.arange(n - 1, dtype=np.int64)
    d = np.sign(delta(i, i + 1) - delta(i, i - 1)).astype(np.int64)
    d = np.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # Exponential search for the range length upper bound.
    lmax = np.full(n - 1, 2, np.int64)
    for _ in range(40):  # 2^40 >> any n we will see
        probe = delta(i, i + lmax * d) > delta_min
        if not probe.any():
            break
        lmax = np.where(probe, lmax * 2, lmax)

    # Binary search for the exact range length l.
    l = np.zeros(n - 1, np.int64)
    t = lmax // 2
    while (t > 0).any():
        tt = np.maximum(t, 1)
        cond = (t > 0) & (delta(i, i + (l + tt) * d) > delta_min)
        l = np.where(cond, l + tt, l)
        t = t // 2
    j = i + l * d

    # Binary search for the split position: t walks ceil(l/2), ceil(l/4), ..., 1.
    # Extra trailing t=1 passes are safe: a move is only accepted while
    # delta(i, i+(s+t)d) > delta_node, which bounds s by the true split.
    delta_node = delta(i, j)
    s = np.zeros(n - 1, np.int64)
    div = 2
    max_l = max(1, int(l.max()))
    while True:
        t = -(-l // div)  # ceil(l / div), >= 1 since l >= 1
        cond = delta(i, i + (s + t) * d) > delta_node
        s = np.where(cond, s + t, s)
        if div >= 2 * max_l:
            break
        div *= 2

    gamma = i + s * d + np.minimum(d, 0)

    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    left_is_leaf = lo == gamma
    right_is_leaf = hi == gamma + 1
    n_internal = n - 1
    left = np.where(left_is_leaf, n_internal + gamma, gamma).astype(np.int32)
    right = np.where(right_is_leaf, n_internal + gamma + 1, gamma + 1).astype(np.int32)

    parent = np.full(2 * n - 1, -1, np.int32)
    parent[left] = np.arange(n_internal, dtype=np.int32)
    parent[right] = np.arange(n_internal, dtype=np.int32)

    # Tree depth via parent pointers (vectorized pointer chase).
    depth = np.zeros(2 * n - 1, np.int32)
    cur = parent.copy()
    dmax = 1
    for _ in range(2 * n):
        active = cur >= 0
        if not active.any():
            break
        depth[active] += 1
        cur = np.where(active, parent[np.clip(cur, 0, None)], -1)
        dmax += 1
    return left, right, parent, order, int(depth.max()) + 1


def triangle_bboxes(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray, pad: float = 1e-7):
    bmin = jnp.minimum(jnp.minimum(v0, v1), v2) - pad
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2) + pad
    return bmin, bmax


def refit(bvh: BVH, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> BVH:
    """Bottom-up AABB propagation with a fixed trip count (= tree depth).

    Pure JAX; jits into the frame step. The analog of the per-frame BLAS/TLAS
    refit (Renderer.swift:1084-1202). ``v0/v1/v2`` are (T,3) world-space
    triangle vertices in ORIGINAL triangle order.
    """
    n = bvh.n_tris
    n_internal = bvh.n_internal
    leaf_min, leaf_max = triangle_bboxes(v0[bvh.leaf_tri], v1[bvh.leaf_tri], v2[bvh.leaf_tri])
    if n_internal == 0:
        return bvh._replace(bbox_min=leaf_min, bbox_max=leaf_max)

    bbox_min = jnp.concatenate([jnp.full((n_internal, 3), jnp.inf, jnp.float32), leaf_min])
    bbox_max = jnp.concatenate([jnp.full((n_internal, 3), -jnp.inf, jnp.float32), leaf_max])

    def body(_, carry):
        bmin, bmax = carry
        new_min = jnp.minimum(jnp.take(bmin, bvh.left, axis=0), jnp.take(bmin, bvh.right, axis=0))
        new_max = jnp.maximum(jnp.take(bmax, bvh.left, axis=0), jnp.take(bmax, bvh.right, axis=0))
        bmin = bmin.at[:n_internal].set(new_min)
        bmax = bmax.at[:n_internal].set(new_max)
        return bmin, bmax

    bbox_min, bbox_max = jax.lax.fori_loop(0, bvh.depth, body, (bbox_min, bbox_max))
    return bvh._replace(bbox_min=bbox_min, bbox_max=bbox_max)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> BVH:
    """Full host-side build: topology (NumPy) + initial fit (JAX refit)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    centroids = (v0 + v1 + v2) / 3.0
    left, right, parent, leaf_tri, depth = build_topology(centroids)
    n = v0.shape[0]
    bvh = BVH(
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        parent=jnp.asarray(parent),
        leaf_tri=jnp.asarray(leaf_tri),
        bbox_min=jnp.zeros((2 * n - 1, 3), jnp.float32),
        bbox_max=jnp.zeros((2 * n - 1, 3), jnp.float32),
        depth=depth,
    )
    return refit(bvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
