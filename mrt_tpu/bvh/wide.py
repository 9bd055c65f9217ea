"""Wide (ARITY-ary) BVH with packed gather rows — the performance traversal
path.

Why this shape (measured on TPU v5e, docs/PERF.md): XLA's gather costs
~10-20 ns per ROW nearly independent of row width (1..128 f32), so the whole
traversal is gather-count-bound. The design therefore packs everything a
traversal step needs into ONE ROW-float row:

* internal row: ARITY child AABBs in SoA order [bminx*A|...|bmaxz*A] + ARITY
  child entry ids (int32 bitcast)
* leaf row: LEAF_K whole triangles [v0x*K|...|v2z*K] + LEAF_K tri ids

Tuned 12/8/128. Re-measured in round 2 after the shift-stack fix: 16/12
(more tree per gather, same 128-f32 row, same pow2 sort network) still lost
slightly at 1080p (1.43 vs 1.46 flat, 1.35 vs 1.41 two-level) — the extra
VPU width costs more than the ~20% row savings buys.

One unified table (internal rows first, then leaf rows) means each loop
iteration does exactly one row gather; a lane decodes its row as internal or
leaf locally. The per-ray stack is a (R, S) SHIFT STACK with the top at slot
0: pop = conditional left-shift, push = variable right-shift (log2
conditional rolls) + overlay of the bitonic-t-sorted children, nearest
first, so the nearest child pops first and best-t prunes the rest. (The
earlier per-slot one-hot select chain compiled to a scalar-rate kLoop
fusion ~20x slower — docs/PERF.md round 2.)

Topology is collapsed host-side from the binary Karras tree (lbvh.py);
AABB refit runs on device with a fixed trip count so skinning/instance motion
stays inside the jitted frame step (the BLAS/TLAS refit analog,
Renderer.swift:1084-1202).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Hits, Rays
from . import lbvh

# 12/8 was optimal under the HBM gather-cost regime; once the table went
# VMEM-resident the step became fusion/VPU-bound and small arity won the
# sweep (docs/PERF.md round 2c). LEAF_K=12 over 8 costs the 95k-tri
# flagship ~2% but keeps a 1.3M-tri table at ~65 MB -- inside v5e's 128 MB
# VMEM so MSA still places it (dragon_1m 1.06 -> 2.40 Mrays/s); at
# LEAF_K=8 the same table is ~97 MB and loses placement. Overridable
# under the VMEM regime (scripts/sweep_knobs.py: MRT_ARITY/MRT_LEAF_K must be
# set before first import; constraints: 7*ARITY <= ROW, 10*LEAF_K <= ROW).
import os as _os

ARITY = int(_os.environ.get("MRT_ARITY", "8"))
LEAF_K = int(_os.environ.get("MRT_LEAF_K", "12"))
# Round-3 on-device A/Bs retired the layout/codegen parity knobs
# (docs/PERF.md round 3d): MRT_CHUNK_UNROLL (static chunk loop — strictly
# worse than lax.map on TPU), MRT_TRANSPOSED (lane-major state — parity;
# XLA already lanes the per-child math), MRT_DONATE and MRT_FUSE_FINISH
# (parity once dispatches pipeline). Their implementations are deleted;
# see git history if a future hardware generation reopens the question.
# Row layout (gather cost is per ROW on TPU, nearly independent of width, so
# wider rows buy more tree per gather):
#   internal: [bminx*A|bminy*A|bminz*A|bmaxx*A|bmaxy*A|bmaxz*A|meta*A] = 7A
#   leaf:     [v0x*K|v0y*K|v0z*K|v1x*K|...|v2z*K|tri_id*K] = 10K
_INT_USED = 7 * ARITY
_LEAF_USED = 10 * LEAF_K
# Row width is env-overridable for the bytes-vs-rows gather question
# (docs/PERF.md round 3): if the in-frame gather is BYTES-bound, ROW=64
# with ARITY=8/LEAF_K=6 halves gathered bytes per step; if it is
# per-ROW-issue-bound, width is free and 128 packs more tree per gather.
ROW = int(_os.environ.get("MRT_ROW", "128"))
assert max(_INT_USED, _LEAF_USED) <= ROW
META_OFF = 6 * ARITY
IDS_OFF = 9 * LEAF_K
def _stack_size(depth: int) -> int:
    """Worst-case ordered-DFS stack bound: at most (ARITY-1) pending
    siblings per level (+slack). Sized from the BUILT tree so deep trees
    cannot silently truncate (advisor round-1 medium)."""
    return int(min(max(1 + depth * (ARITY - 1), 16), 160))


def _stack_alloc(bound, depth: int) -> int:
    """Runtime stack WIDTH for a tree: the exact per-tree bound when the
    builder recorded one (else the depth heuristic), clamped to >= ARITY
    because _stack_push_sorted's shift window is ARITY candidates wide —
    a narrower stack changes the concat result width and breaks the
    while_loop carry (seen as int32[n,1] vs int32[n,ARITY] on degenerate
    single-instance-chain TLAS graphs whose exact bound is 1)."""
    return max(int(bound) if bound else _stack_size(depth), ARITY)


def exact_stack_bound(kids_of, root: int = 0) -> int:
    """EXACT adversarial-order worst-case traversal stack occupancy for a
    built topology (host-side, O(nodes)).

    At a k-child node the runtime pushes all (hit) children and pops them
    one at a time; while the i-th popped child's subtree is traversed the
    stack still holds its k-1-i remaining siblings, so
    f(node) = max_i (k-1-i + f(child)) maximized over pop orders — pair
    the largest f with the earliest pop (sort f descending). Assumes every
    child can be hit, so sizing the stack to 1+f(root) can NEVER truncate;
    vs the depth*(ARITY-1) heuristic it measured 42 vs 57 on the app scene
    (a 26% cut of per-step stack shift bandwidth for free).

    ``kids_of(node) -> list[int]`` must yield traversal successors: wide
    children for internal rows, [] for leaves, the BLAS root for two-level
    instance rows."""
    f: dict = {}
    stack = [(root, False)]
    while stack:
        n, done = stack.pop()
        kids = kids_of(n)
        if not kids:
            f[n] = 0
            continue
        if not done:
            stack.append((n, True))
            for c in kids:
                if c not in f:
                    stack.append((c, False))
        else:
            fs = sorted((f[c] for c in kids), reverse=True)
            k = len(fs)
            f[n] = max((k - 1 - i) + fs[i] for i in range(k))
    return 1 + f[root]

_EMPTY = -1  # empty child slot

# Integer ids are stored in the f32 table via bitcast. Small ints are DENORMAL
# f32 bit patterns and TPU flushes denormals to zero (which would turn child
# pointers into "root" and create traversal cycles), so ids are biased into
# the normal-float exponent range before the bitcast.
_ID_BIAS = 1 << 30


def _encode_ids(ids: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(ids + _ID_BIAS, jnp.float32)


def _decode_ids(floats: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(floats, jnp.int32) - _ID_BIAS


def _permute_state_packed(state, order, lane_axis):
    """Reorder every lane of a mid-traversal state dict with ONE wide row
    gather.

    TPU gather cost is per ROW, nearly independent of row width (docs/PERF.md
    round 3d honest microbench): the per-key formulation of the capped-pass
    alive-resort was ~20 narrow takes at ~0.47 ms each per 65k-lane resort —
    the whole 4.2x round-3d multipass regression. Int columns ride the
    _ID_BIAS bitcast (TPU denormal rule); lane-last 2D state is relaid to
    rows for the gather and back after."""
    packed, meta = _pack_state(state, lane_axis)
    return _unpack_state(jnp.take(packed, order, axis=0), meta, lane_axis)


def _pack_state(state, lane_axis):
    """Encode a state dict as one (lanes, W) f32 matrix + decode metadata
    (the packing half of _permute_state_packed)."""
    keys = sorted(state.keys())
    cols, meta = [], []
    for k in keys:
        v = state[k]
        if lane_axis(k) == 1:
            v = v.T
        v2 = v if v.ndim == 2 else v[:, None]
        if v2.dtype == jnp.float32:
            enc = v2
        elif v2.dtype == jnp.bool_:
            enc = v2.astype(jnp.float32)
        else:
            enc = _encode_ids(v2.astype(jnp.int32))
        meta.append((k, state[k].dtype, state[k].ndim, v2.shape[1]))
        cols.append(enc)
    return jnp.concatenate(cols, axis=1), meta


def _unpack_state(packed, meta, lane_axis):
    out, off = {}, 0
    for k, dt, nd, w in meta:
        sl = packed[:, off: off + w]
        off += w
        if dt == jnp.float32:
            dec = sl
        elif dt == jnp.bool_:
            dec = sl > 0.5
        else:
            dec = _decode_ids(sl)
        if nd == 1:
            dec = dec[:, 0]
        elif lane_axis(k) == 1:
            dec = dec.T
        out[k] = dec
    return out


@jax.tree_util.register_pytree_node_class
class WideBVH:
    """Pytree with static (aux) n_internal/depth so jitted code can branch on
    them (they define trace structure, not data)."""

    def __init__(self, table, node_child, leaf_tri, n_internal: int, depth: int,
                 stack_bound: int | None = None, leaf_clip=None):
        self.table = table  # (N, ROW) f32 unified gather table
        self.node_child = node_child  # (Ni, ARITY) int32 entry ids, -1 = empty
        self.leaf_tri = leaf_tri  # (Nl, LEAF_K) int32 original tri ids, -1 = pad
        self.n_internal = int(n_internal)
        self.depth = int(depth)
        # exact per-tree worst-case stack occupancy (see exact_stack_bound);
        # None falls back to the depth heuristic
        self.stack_bound = None if stack_bound is None else int(stack_bound)
        # SBVH: (Nl, 6) f32 per-leaf clip boxes [mn xyz, mx xyz] from the
        # spatial-split builder; refit intersects leaf bounds with them.
        # ONLY valid for static geometry (the verts the builder saw).
        self.leaf_clip = leaf_clip

    @property
    def n_rows(self) -> int:
        return self.table.shape[0]

    def _replace(self, **kw) -> "WideBVH":
        d = dict(
            table=self.table,
            node_child=self.node_child,
            leaf_tri=self.leaf_tri,
            n_internal=self.n_internal,
            depth=self.depth,
            stack_bound=self.stack_bound,
            leaf_clip=self.leaf_clip,
        )
        d.update(kw)
        return WideBVH(**d)

    def tree_flatten(self):
        return (self.table, self.node_child, self.leaf_tri, self.leaf_clip), (
            self.n_internal, self.depth, self.stack_bound)

    @classmethod
    def tree_unflatten(cls, aux, children):
        table, node_child, leaf_tri, leaf_clip = children
        return cls(table, node_child, leaf_tri, *aux, leaf_clip=leaf_clip)


# --------------------------------------------------------------------------
# Host-side build: binary Karras tree -> ARITY-ary, LEAF_K-tri leaves
# --------------------------------------------------------------------------

def _binary_ranges(left: np.ndarray, right: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-leaf index range [lo, hi] covered by each binary node (leaves of
    a Karras internal node are contiguous). Combined ids: internal 0..n-2,
    leaf (n-1)+i."""
    total = 2 * n - 1
    lo = np.zeros(total, np.int64)
    hi = np.zeros(total, np.int64)
    n_int = n - 1
    lo[n_int:] = np.arange(n)
    hi[n_int:] = np.arange(n)
    # bottom-up: iterate until fixed point (depth-bounded)
    lo_i = np.full(n_int, -1, np.int64)
    hi_i = np.full(n_int, -1, np.int64)
    for _ in range(2 * n):
        l_lo = np.where(left < n_int, lo_i[np.clip(left, 0, max(n_int - 1, 0))], lo[np.clip(left, 0, total - 1)])
        r_hi = np.where(right < n_int, hi_i[np.clip(right, 0, max(n_int - 1, 0))], hi[np.clip(right, 0, total - 1)])
        new_lo = l_lo
        new_hi = r_hi
        if np.array_equal(new_lo, lo_i) and np.array_equal(new_hi, hi_i):
            break
        lo_i, hi_i = new_lo, new_hi
    lo[:n_int] = lo_i
    hi[:n_int] = hi_i
    return lo, hi


def build_topology_wide(bin_left: np.ndarray, bin_right: np.ndarray, leaf_order: np.ndarray):
    """Collapse the binary radix tree into (node_child, leaf_tri, depth).

    Entry-id space: internal rows [0, Ni), leaf rows [Ni, Ni+Nl).
    """
    n = leaf_order.shape[0]
    n_int_bin = n - 1

    if n <= LEAF_K:
        leaf = np.full((1, LEAF_K), -1, np.int32)
        leaf[0, :n] = leaf_order[:n]
        return np.zeros((0, ARITY), np.int32), leaf, 1

    lo, hi = _binary_ranges(bin_left, bin_right, n)
    count = hi - lo + 1

    node_children: list = []  # list of lists of ('I', idx) / ('L', idx)
    leaves: list = []

    def make_leaf(bin_id: int) -> int:
        tris = leaf_order[lo[bin_id] : hi[bin_id] + 1]
        row = np.full(LEAF_K, -1, np.int32)
        row[: len(tris)] = tris
        leaves.append(row)
        return len(leaves) - 1

    # Iterative DFS: emit internal nodes in preorder.
    root = 0
    node_children.append(None)  # placeholder for root
    work = [(0, root)]  # (internal row idx, binary node id)
    while work:
        row_idx, bin_id = work.pop()
        # Expand to up to ARITY subtree roots, splitting the largest first.
        roots = [bin_id]
        while len(roots) < ARITY:
            best, best_count = -1, LEAF_K
            for k, r in enumerate(roots):
                c = int(count[r]) if r < n_int_bin else 1
                if r < n_int_bin and c > best_count:
                    best, best_count = k, c
            if best < 0:
                break
            r = roots.pop(best)
            roots.insert(best, int(bin_right[r]))
            roots.insert(best, int(bin_left[r]))
        children = []
        for r in roots:
            c = int(count[r]) if r < n_int_bin else 1
            if r >= n_int_bin or c <= LEAF_K:
                # binary leaf or small subtree -> wide leaf row
                if r >= n_int_bin:
                    # single binary leaf
                    tri = leaf_order[r - n_int_bin]
                    row = np.full(LEAF_K, -1, np.int32)
                    row[0] = tri
                    leaves.append(row)
                    children.append(("L", len(leaves) - 1))
                else:
                    children.append(("L", make_leaf(r)))
            else:
                node_children.append(None)
                idx = len(node_children) - 1
                children.append(("I", idx))
                work.append((idx, r))
        node_children[row_idx] = children

    n_i = len(node_children)
    child_arr = np.full((n_i, ARITY), _EMPTY, np.int32)
    for i, children in enumerate(node_children):
        for j, (kind, idx) in enumerate(children):
            child_arr[i, j] = idx if kind == "I" else n_i + idx
    leaf_arr = np.stack(leaves).astype(np.int32)

    # depth for refit trip count
    depth = np.ones(n_i, np.int32)
    for i in range(n_i - 1, -1, -1):
        for j in range(ARITY):
            c = child_arr[i, j]
            if 0 <= c < n_i:
                depth[i] = max(depth[i], depth[c] + 1)
    return child_arr, leaf_arr, int(depth[0]) + 1


def refit(wbvh: WideBVH, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
          row_ids: jnp.ndarray | None = None) -> WideBVH:
    """Rebuild the packed table's geometry (leaf verts + all child AABBs)
    from world-space triangle vertices. Jittable, fixed trip count.

    ``row_ids``: optional (Nl, LEAF_K) ids to ENCODE into the leaf rows in
    place of wbvh.leaf_tri — geometry-sharded BVHs gather verts by shard-
    LOCAL ids but must report GLOBAL triangle ids to the shade stage."""
    n_i = wbvh.n_internal
    leaf_tri = wbvh.leaf_tri  # (Nl, LEAF_K)
    n_l = leaf_tri.shape[0]
    pad = leaf_tri < 0
    tid = jnp.maximum(leaf_tri, 0)

    def g(v):
        return jnp.take(v, tid.reshape(-1), axis=0).reshape(n_l, LEAF_K, 3)

    w0, w1, w2 = g(v0), g(v1), g(v2)
    nan = jnp.nan
    w0 = jnp.where(pad[..., None], nan, w0)
    w1 = jnp.where(pad[..., None], nan, w1)
    w2 = jnp.where(pad[..., None], nan, w2)

    # leaf rows: [v0x*K v0y*K v0z*K v1x*K ... v2z*K | ids*K | pad]
    ids_out = leaf_tri if row_ids is None else jnp.where(pad, -1, row_ids)
    comps = [w0[:, :, 0], w0[:, :, 1], w0[:, :, 2],
             w1[:, :, 0], w1[:, :, 1], w1[:, :, 2],
             w2[:, :, 0], w2[:, :, 1], w2[:, :, 2]]
    leaf_rows = jnp.concatenate(comps + [_encode_ids(ids_out)], axis=1)
    leaf_rows = jnp.pad(leaf_rows, ((0, 0), (0, ROW - leaf_rows.shape[1])))

    # leaf own bboxes (ignore NaN pads)
    stacked = jnp.stack([w0, w1, w2], axis=2)  # (Nl, 4, 3, 3)
    valid = ~pad
    big = jnp.where(valid[:, :, None, None], stacked, jnp.inf)
    small = jnp.where(valid[:, :, None, None], stacked, -jnp.inf)
    leaf_bmin = jnp.min(big, axis=(1, 2)) - 1e-7  # (Nl, 3)
    leaf_bmax = jnp.max(small, axis=(1, 2)) + 1e-7
    if wbvh.leaf_clip is not None:
        # SBVH: honor the builder's clipped reference bounds — without this
        # clamp a triangle split across leaves re-expands BOTH leaf boxes to
        # its full extent and the spatial split buys nothing
        leaf_bmin = jnp.maximum(leaf_bmin, wbvh.leaf_clip[:, :3])
        leaf_bmax = jnp.minimum(leaf_bmax, wbvh.leaf_clip[:, 3:])

    if n_i == 0:
        return wbvh._replace(table=leaf_rows)

    # bottom-up: entry bboxes; internal rows from child bboxes
    entry_bmin = jnp.concatenate([jnp.full((n_i, 3), jnp.inf), leaf_bmin])
    entry_bmax = jnp.concatenate([jnp.full((n_i, 3), -jnp.inf), leaf_bmax])
    child = wbvh.node_child  # (Ni, 8)
    empty = child < 0
    cidx = jnp.maximum(child, 0)

    def body(_, carry):
        bmin, bmax = carry
        cmin = jnp.take(bmin, cidx.reshape(-1), axis=0).reshape(n_i, ARITY, 3)
        cmax = jnp.take(bmax, cidx.reshape(-1), axis=0).reshape(n_i, ARITY, 3)
        cmin = jnp.where(empty[..., None], jnp.inf, cmin)
        cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
        own_min = jnp.min(cmin, axis=1)
        own_max = jnp.max(cmax, axis=1)
        bmin = bmin.at[:n_i].set(own_min)
        bmax = bmax.at[:n_i].set(own_max)
        return bmin, bmax

    entry_bmin, entry_bmax = jax.lax.fori_loop(0, wbvh.depth, body, (entry_bmin, entry_bmax))

    cmin = jnp.take(entry_bmin, cidx.reshape(-1), axis=0).reshape(n_i, ARITY, 3)
    cmax = jnp.take(entry_bmax, cidx.reshape(-1), axis=0).reshape(n_i, ARITY, 3)
    cmin = jnp.where(empty[..., None], jnp.inf, cmin)
    cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
    node_rows = jnp.concatenate(
        [
            cmin[:, :, 0], cmin[:, :, 1], cmin[:, :, 2],
            cmax[:, :, 0], cmax[:, :, 1], cmax[:, :, 2],
            _encode_ids(child),
        ],
        axis=1,
    )  # (Ni, 56)
    node_rows = jnp.pad(node_rows, ((0, 0), (0, ROW - node_rows.shape[1])))
    table = jnp.concatenate([node_rows, leaf_rows], axis=0)
    return wbvh._replace(table=table)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, method: str = "auto",
          spatial: bool = False) -> WideBVH:
    """Host topology build -> device refit.

    method: "sah" (native binned-SAH builder, best quality), "lbvh" (Karras
    Morton tree + collapse, pure NumPy), or "auto" (SAH when the native
    library loads, else LBVH) — the capability-probe seam.

    spatial=True enables SBVH reference splitting (native builder only):
    the returned tree carries per-leaf clip boxes that refit honors. ONLY
    for geometry that will never be refit with different vertices — the
    flat renderer path refits moved/skinned verts through the same
    topology, so it must pass spatial=False (the two-level path enables it
    per non-skinned BLAS group instead).
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    child = None
    clip = None
    if method in ("auto", "sah"):
        from ..utils import native

        tri_verts = np.concatenate([v0, v1, v2], axis=1)  # (T, 9)
        out = native.build_wide_bvh_sah(tri_verts, spatial=spatial)
        if out is not None:
            child, leaf, depth, clip = out
        elif method == "sah":
            raise RuntimeError("native SAH builder unavailable")
    if child is None:
        centroids = (v0 + v1 + v2) / 3.0
        bl, br, _, order, _ = lbvh.build_topology(centroids)
        child, leaf, depth = build_topology_wide(bl, br, order)
    n_rows = child.shape[0] + leaf.shape[0]
    n_i = int(child.shape[0])
    bound = exact_stack_bound(
        lambda n: [int(c) for c in child[n] if c >= 0] if n < n_i else []
    ) if n_i else 1
    wbvh = WideBVH(
        table=jnp.zeros((n_rows, ROW), jnp.float32),
        node_child=jnp.asarray(child),
        leaf_tri=jnp.asarray(leaf),
        n_internal=n_i,
        depth=depth,
        stack_bound=bound,
        leaf_clip=None if clip is None else jnp.asarray(clip),
    )
    # jit: eager per-op dispatch of the refit graph is seconds of host overhead
    return jax.jit(refit)(wbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))


# --------------------------------------------------------------------------
# Traversal
# --------------------------------------------------------------------------

def _bitonic_pairs(n: int):
    """Compare-exchange pairs of a bitonic sorting network for pow2 n."""
    pairs = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                l = i ^ j
                if l > i:
                    # ascending blocks of size k
                    if (i & k) == 0:
                        pairs.append((i, l))
                    else:
                        pairs.append((l, i))
            j //= 2
        k *= 2
    return pairs


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


_SORT_N = _next_pow2(ARITY)
_SORT_PAIRS = _bitonic_pairs(_SORT_N)


def _sort_children(t: jnp.ndarray, m: jnp.ndarray):
    """Sort (R, ARITY) t ascending (inf-padded to pow2), carrying meta m.
    Static network of selects."""
    cols_t = [t[:, k] for k in range(ARITY)] + [
        jnp.full_like(t[:, 0], jnp.inf) for _ in range(_SORT_N - ARITY)
    ]
    cols_m = [m[:, k] for k in range(ARITY)] + [
        jnp.full_like(m[:, 0], -1) for _ in range(_SORT_N - ARITY)
    ]
    for a, b in _SORT_PAIRS:
        swap = cols_t[a] > cols_t[b]
        ta = jnp.where(swap, cols_t[b], cols_t[a])
        tb = jnp.where(swap, cols_t[a], cols_t[b])
        ma = jnp.where(swap, cols_m[b], cols_m[a])
        mb = jnp.where(swap, cols_m[a], cols_m[b])
        cols_t[a], cols_t[b] = ta, tb
        cols_m[a], cols_m[b] = ma, mb
    return cols_t[:ARITY], cols_m[:ARITY]


_META_BITS = 20  # packed sort key: [t-bits >> 20 | child id] — supports
_META_MASK = (1 << _META_BITS) - 1  # tables to 1M rows; t keeps its top 12
# bits (8 exp + 4 mantissa, ~3% ordering granularity)
_KEY_MAX = (1 << 31) - 1


def _sort_children_packed(tA, meta):
    """Single-array child sort: pack (t, id) into one i32 key per child.

    Child t is >= 0 (slab tnear clamped), and non-negative f32 bit patterns
    order like the floats themselves, so the key's top 12 bits sort children
    near-to-far while the low 20 bits carry the child id. Each bitonic
    comparator is then one min + one max instead of compare + 4 selects —
    the select chains were part of the 233-op/step band the round-2h xplane
    profile showed dominating traversal (docs/PERF.md). Ties inside a ~3%
    t bucket fall back to id order; traversal output is visit-order
    independent (strict-less best updates), so quantization only perturbs
    culling efficiency, never the result.

    Returns (cands (R, ARITY) i32 ids nearest-first, valid (R, ARITY) bool).
    """
    valid = jnp.isfinite(tA) & (meta >= 0)
    tbits = jax.lax.bitcast_convert_type(tA, jnp.int32)
    key = ((tbits >> _META_BITS) << _META_BITS) | (meta & _META_MASK)
    key = jnp.where(valid, key, _KEY_MAX)
    cols = [key[:, k] for k in range(ARITY)] + [
        jnp.full_like(key[:, 0], _KEY_MAX) for _ in range(_SORT_N - ARITY)
    ]
    for a, b in _SORT_PAIRS:
        lo = jnp.minimum(cols[a], cols[b])
        hi = jnp.maximum(cols[a], cols[b])
        cols[a], cols[b] = lo, hi
    keys = jnp.stack(cols[:ARITY], axis=1)
    return keys & _META_MASK, keys != _KEY_MAX


def _sorted_candidates(tA, meta, n_rows: int):
    """Child sort dispatch: packed i32 keys when ids fit 20 bits (any scene
    up to ~12M tris), else the carry-meta float network. Returns
    (cands ids nearest-first, valid mask), both (R, ARITY)."""
    if n_rows <= _META_MASK:
        return _sort_children_packed(tA, meta)
    cols_t, cols_m = _sort_children(tA, meta)
    cands = jnp.stack(cols_m, axis=1)
    valid = jnp.stack([jnp.isfinite(c) for c in cols_t], axis=1)
    return cands, valid


def _stack_pop(stack, active):
    """Top-at-slot-0 stack: read the top, shift live lanes left by one.
    Full-array rolls/selects vectorize on the VPU — the previous per-slot
    one-hot select chain compiled to a ~330k-cycle scalar kLoop fusion per
    step (see docs/PERF.md round 2)."""
    top = stack[:, 0]
    popped = jnp.concatenate([stack[:, 1:], jnp.zeros_like(stack[:, :1])], axis=1)
    return top, jnp.where(active[:, None], popped, stack)


def _stack_push_sorted(stack, cands, n_push):
    """Push cands[:, :n_push] (nearest-FIRST) onto a top-at-slot-0 stack:
    variable right-shift by n via log2 conditional shifts, then overlay the
    candidates in the first columns. Lanes with n_push == 0 are untouched.
    Overflow drops the FARTHEST entries off the bottom."""
    S = stack.shape[1]
    C = cands.shape[1]
    shifted = stack
    b = 1
    while b <= C:
        moved = jnp.concatenate(
            [jnp.zeros_like(shifted[:, :b]), shifted[:, : S - b]], axis=1
        )
        shifted = jnp.where(((n_push & b) != 0)[:, None], moved, shifted)
        b <<= 1
    lane = jnp.arange(C, dtype=jnp.int32)[None, :]
    head = jnp.where(lane < n_push[:, None], cands, shifted[:, :C])
    return jnp.concatenate([head, shifted[:, C:]], axis=1)


def _mt_leaf(row, ox, oy, oz, dx, dy, dz, t_min, t_cap, K: int = LEAF_K,
             T: bool = False):
    """K-wide Möller–Trumbore on a gathered leaf row. Component-wise on
    (R, K) arrays (no reshapes — keeps everything in 2D vector registers).
    K=1 serves the candidate-priming test with the IDENTICAL expression
    graph, so primed and unprimed results stay bit-equal.
    ``T``: transposed layout — row is (ROW, R), per-ray terms (1, R),
    results (K, R); the arithmetic is the same expression graph."""
    if T:
        v0x, v0y, v0z = row[0:K], row[K:2*K], row[2*K:3*K]
        v1x, v1y, v1z = row[3*K:4*K], row[4*K:5*K], row[5*K:6*K]
        v2x, v2y, v2z = row[6*K:7*K], row[7*K:8*K], row[8*K:9*K]
    else:
        v0x, v0y, v0z = row[:, 0:K], row[:, K:2*K], row[:, 2*K:3*K]
        v1x, v1y, v1z = row[:, 3*K:4*K], row[:, 4*K:5*K], row[:, 5*K:6*K]
        v2x, v2y, v2z = row[:, 6*K:7*K], row[:, 7*K:8*K], row[:, 8*K:9*K]
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    valid = jnp.abs(det) > 1e-9
    inv = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    # q = t x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= t_min) & (t <= t_cap)
    return hit, t, u, v


def _aabb_children(row, ox, oy, oz, ix, iy, iz, t_cap, T: bool = False):
    """ARITY child slab tests on a gathered internal row. Returns (hit, t).
    ``T``: transposed layout — row (ROW, R), per-ray terms (1, R)."""
    A = ARITY
    if T:
        bminx, bminy, bminz = row[0:A], row[A:2*A], row[2*A:3*A]
        bmaxx, bmaxy, bmaxz = row[3*A:4*A], row[4*A:5*A], row[5*A:6*A]
    else:
        bminx, bminy, bminz = row[:, 0:A], row[:, A:2*A], row[:, 2*A:3*A]
        bmaxx, bmaxy, bmaxz = row[:, 3*A:4*A], row[:, 4*A:5*A], row[:, 5*A:6*A]
    t0x = (bminx - ox) * ix
    t1x = (bmaxx - ox) * ix
    t0y = (bminy - oy) * iy
    t1y = (bmaxy - oy) * iy
    t0z = (bminz - oz) * iz
    t1z = (bmaxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z)
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z)
    )
    hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= t_cap)
    return hit, jnp.maximum(tnear, 0.0)


_BANDSORT = _os.environ.get("MRT_BANDSORT", "0") == "1"


def _band_partition(band: jnp.ndarray, n_bands: int = 256, block: int = 256):
    """Grouping permutation + inverse for a small-range band key WITHOUT the
    second argsort (round 5, VERDICT r4 item 3: the sort/permute band is
    22 ns/ray and round 4a showed chunk assignment only needs a band
    partition, not a total order).

    ``perm`` (slot -> src) still comes from one stable argsort of the band
    key alone; ``inv`` (src -> slot) is computed by COUNTING — block
    histograms + a strict-lower-triangular bf16 matmul for within-block
    ranks (MXU work) + tiny cumsums — instead of ``argsort(perm)``.
    Stability makes the two constructions agree exactly: stable argsort
    orders equal keys by index, and the counting destination is
    band_start + #earlier-lanes-of-same-band, which is the same order.

    Exactness: one-hot counts are accumulated in f32 (preferred f32 dot);
    within-block ranks are < block = 256, representable exactly in bf16.

    Requires band.shape[0] % block == 0 and 0 <= band < n_bands.
    """
    P = band.shape[0]
    G = P // block
    bb = band.reshape(G, block)
    oh = bb[:, :, None] == jnp.arange(n_bands, dtype=jnp.int32)[None, None, :]
    ohb = oh.astype(jnp.bfloat16)  # (G, block, B)
    tri = jnp.tril(jnp.ones((block, block), jnp.bfloat16), -1)  # strict
    within = jax.lax.dot_general(
        tri, ohb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (block, G, B) ranks
    within = jnp.transpose(within, (1, 0, 2))  # (G, block, B)
    blockcnt = jnp.sum(oh.astype(jnp.float32), axis=1)  # (G, B)
    totals = jnp.sum(blockcnt, axis=0)  # (B,)
    startb = jnp.cumsum(totals) - totals  # exclusive
    blockoff = jnp.cumsum(blockcnt, axis=0) - blockcnt  # (G, B) exclusive
    d = within + blockoff[:, None, :] + startb[None, None, :]
    inv = jnp.sum(jnp.where(oh, d, 0.0), axis=2).reshape(P).astype(jnp.int32)
    perm = jnp.argsort(band, stable=True)
    return perm, inv


def _sort_keys_generic(rays: Rays, live: jnp.ndarray, bmin, bmax) -> jnp.ndarray:
    """Coherence sort key: dead lanes last, then direction octant, then a
    Morton-ish cell of the origin (normalized by the given scene bounds).
    Sorting + chunking makes each chunk's while_loop tail match its own
    (coherent) workload instead of the global worst lane."""
    d = rays.direction
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    extent = jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip((rays.origin - bmin) / extent, 0.0, 1.0)
    cell = (
        (q[:, 0] * 15).astype(jnp.int32) * 256
        + (q[:, 1] * 15).astype(jnp.int32) * 16
        + (q[:, 2] * 15).astype(jnp.int32)
    )
    key = octant * 4096 + cell
    return jnp.where(live, key, jnp.int32(1 << 24))


def _sort_keys(wbvh: WideBVH, rays: Rays, live: jnp.ndarray) -> jnp.ndarray:
    A = ARITY
    if wbvh.n_internal > 0:
        root = wbvh.table[0]
        bmin = jnp.stack([jnp.min(root[0:A]), jnp.min(root[A:2*A]), jnp.min(root[2*A:3*A])])
        bmax = jnp.stack([jnp.max(root[3*A:4*A]), jnp.max(root[4*A:5*A]), jnp.max(root[5*A:6*A])])
    else:
        bmin = jnp.zeros(3)
        bmax = jnp.ones(3)
    return _sort_keys_generic(rays, live, bmin, bmax)


def _prime_hits(rays: Rays, prime_tri, tri_rows, t_min):
    """Test each lane's candidate triangle (its previous-frame/previous-sample
    hit or occluder) with ONE row gather. Returns (t, u, v, hit) — a valid
    hit seeds best_t (tightening closest-hit culling from step 0) or retires
    any-hit lanes outright. Pure optimization: candidates are re-tested, so
    results are bit-identical to an unprimed traversal's final answer for
    closest-hit, and any-hit truth is order-independent."""
    tid = jnp.maximum(prime_tri, 0)
    row = jnp.take(tri_rows, tid, axis=0)  # (R, >=9): [v0 v1 v2 ...]
    o, d = rays.origin, rays.direction
    # K=1 layout [v0x v0y v0z v1x ... v2z] is exactly the row's first 9 cols
    hit, t, u, v = _mt_leaf(
        row, o[:, 0:1], o[:, 1:2], o[:, 2:3], d[:, 0:1], d[:, 1:2], d[:, 2:3],
        t_min, rays.max_distance[:, None], K=1,
    )
    hit, t, u, v = hit[:, 0], t[:, 0], u[:, 0], v[:, 0]
    ok = hit & (prime_tri >= 0)
    return jnp.where(ok, t, jnp.inf), u, v, ok


def _traverse(wbvh: WideBVH, rays: Rays, t_min, any_hit_mode: bool, mask,
              chunks: int = 1, sort_rays: bool = False, shadow=None,
              profile: bool = False, prime_tri=None, tri_rows=None,
              stream_window: int = 0, refill_every: int = 8, unroll: int = 1,
              sort_hint=None, count_pops: bool = False):
    """Chunked, optionally sorted traversal wrapper around the core loop.

    ``shadow``: optional (R,) bool — per-lane any-hit mode (shadow lanes
    retire on first hit; others run closest-hit), enabling MIXED batches
    that fuse the next-bounce and shadow traversals into one call.

    ``prime_tri``/``tri_rows``: optional (R,) candidate triangle ids (-1 =
    none) + (T,>=9) packed world-vert rows. See _prime_hits.

    ``profile``: adds two per-lane counters to the result — ``pops`` (rows
    this lane actually consumed) and ``iters`` (its chunk's while-loop trip
    count = rows its lane PAID for). sum(iters)/sum(pops) is the tail-waste
    factor of the chunked execution."""
    n_rays = rays.origin.shape[0]
    live0 = jnp.ones((n_rays,), bool) if mask is None else mask
    if shadow is None:
        shadow = jnp.full((n_rays,), bool(any_hit_mode))

    perm = None
    if sort_rays:
        key = _sort_keys(wbvh, rays, live0)
        if sort_hint is not None:
            # workload-predictive major key (see twolevel._traverse2):
            # group lanes by expected step count so each chunk's while trip
            # count approaches its mean instead of the global tail.
            # Banding: shadow (any-hit, early-exit) lanes 0 | hinted lanes
            # 1 + hint (FINE granularity — matches the paid-step oracle in
            # the offline simulation, docs/PERF.md round 4a) | unknown-cost
            # lanes (hint < 0, e.g. bounce rays) 127 — mixed batches
            # previously collapsed shadow and bounce lanes into one band,
            # mixing the cheapest and the most expensive rays.
            hq = jnp.clip(sort_hint, 0, 125) + 1
            band = jnp.where(sort_hint < 0, jnp.int32(127), hq)
            band = jnp.where(shadow, jnp.int32(0), band)
            key = jnp.where(live0, band * (1 << 15) + key, key)
        inv_pre = None
        if (_BANDSORT and sort_hint is not None and n_rays % 256 == 0):
            # band-only partition: chunk assignment needs grouping, not a
            # total order (PERF.md round 4a: the coherence minor key is
            # inert under banding); counting replaces the inverse argsort
            band_full = jnp.where(live0, band, jnp.int32(255))
            perm, inv_pre = _band_partition(band_full)
        else:
            perm = jnp.argsort(key)
        # ONE wide-row permutation gather instead of six narrow ones (XLA
        # gather cost is per ROW, ~width-independent to 128 f32; each 65k-row
        # permutation gather profiled at ~0.5 ms, docs/PERF.md round 2b).
        cols = [rays.origin, rays.direction, rays.max_distance[:, None],
                live0.astype(jnp.float32)[:, None],
                shadow.astype(jnp.float32)[:, None]]
        if prime_tri is not None:
            cols.append(_encode_ids(prime_tri)[:, None])
        pool = jnp.take(jnp.concatenate(cols, axis=1), perm, axis=0)
        rays = Rays(origin=pool[:, 0:3], direction=pool[:, 3:6],
                    max_distance=pool[:, 6])
        mask = pool[:, 7] > 0.5
        shadow = pool[:, 8] > 0.5
        if prime_tri is not None:
            prime_tri = _decode_ids(pool[:, 9])

    init = None
    if prime_tri is not None and tri_rows is not None:
        m = mask if mask is not None else jnp.ones((n_rays,), bool)
        pt, pu, pv, pok = _prime_hits(rays, jnp.where(m, prime_tri, -1), tri_rows, t_min)
        init = dict(
            best_t=jnp.minimum(jnp.asarray(rays.max_distance, jnp.float32), pt),
            best_tri=jnp.where(pok, prime_tri, -1),
            best_u=jnp.where(pok, pu, 0.0),
            best_v=jnp.where(pok, pv, 0.0),
            found=pok,
        )

    if stream_window > 0:
        st = _traverse_stream(
            wbvh, rays, t_min, mask, shadow, init,
            window=stream_window, refill_every=refill_every, profile=profile,
            dead_last=sort_rays,  # sorted pools put masked-off rays last
        )
        if count_pops and "pops" not in st:
            st["pops"] = jnp.zeros((n_rays,), jnp.int32)
    elif _PASSES > 1 and chunks > 1 and n_rays % chunks == 0 and not profile:
        st = _multipass_flat(wbvh, rays, t_min, mask, shadow, init, chunks,
                             unroll, count_pops, _PASSES, _PASS_CAP)
    elif chunks > 1 and n_rays % chunks == 0:
        rc = n_rays // chunks
        m = mask if mask is not None else jnp.ones((n_rays,), bool)

        def chunk_fn(args):
            r_o, r_d, r_m, mm, sh, ini = args
            return _traverse_flat(wbvh, Rays(r_o, r_d, r_m), t_min, mm, sh,
                                  profile, ini, unroll=unroll,
                                  count_pops=count_pops)

        init_c = (
            {k: v.reshape((chunks, rc) + v.shape[1:]) for k, v in init.items()}
            if init is not None
            else None
        )
        st = jax.lax.map(
            chunk_fn,
            (
                rays.origin.reshape(chunks, rc, 3),
                rays.direction.reshape(chunks, rc, 3),
                rays.max_distance.reshape(chunks, rc),
                m.reshape(chunks, rc),
                shadow.reshape(chunks, rc),
                init_c,
            ),
        )
        st = {k: v.reshape((n_rays,) + v.shape[2:]) for k, v in st.items()}
    else:
        st = _traverse_flat(wbvh, rays, t_min, mask, shadow, profile, init,
                            unroll=unroll, count_pops=count_pops)

    if perm is not None:
        # argsort(perm) == inverse permutation; measured 184 us vs 450 us for
        # the scatter formulation at 65k lanes (scripts/microbench_inv.py);
        # the band partition precomputes it by counting instead
        inv = inv_pre if inv_pre is not None else jnp.argsort(perm)
        if profile:
            st = {k: jnp.take(v, inv, axis=0) for k, v in st.items()}
        else:
            cols = [st["best_t"], _encode_ids(st["best_tri"]), st["best_u"],
                    st["best_v"], st["found"].astype(jnp.float32)]
            if count_pops:
                cols.append(_encode_ids(st["pops"]))
            packed = jnp.stack(cols, axis=1)
            out = jnp.take(packed, inv, axis=0)  # one wide unsort gather
            st = dict(
                best_t=out[:, 0], best_tri=_decode_ids(out[:, 1]),
                best_u=out[:, 2], best_v=out[:, 3], found=out[:, 4] > 0.5,
            )
            if count_pops:
                st["pops"] = _decode_ids(out[:, 5])
    return st


def _traverse_flat(wbvh: WideBVH, rays: Rays, t_min, mask, shadow, profile: bool = False,
                   init=None, unroll: int = 1, count_pops: bool = False):
    return _traverse_flat_rows(wbvh, rays, t_min, mask, shadow, profile,
                               init, unroll=unroll, count_pops=count_pops)


def _traverse_flat_rows(wbvh: WideBVH, rays: Rays, t_min, mask, shadow, profile: bool = False,
                        init=None, unroll: int = 1, count_pops: bool = False,
                        max_iters: int = 0, return_state: bool = False,
                        state_override=None):
    n_rays = rays.origin.shape[0]
    n_i = wbvh.n_internal
    table = wbvh.table

    ox, oy, oz = rays.origin[:, 0:1], rays.origin[:, 1:2], rays.origin[:, 2:3]
    inv = 1.0 / jnp.where(jnp.abs(rays.direction) < 1e-12,
                          jnp.where(rays.direction < 0, -1e-12, 1e-12), rays.direction)
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]
    dx, dy, dz = rays.direction[:, 0:1], rays.direction[:, 1:2], rays.direction[:, 2:3]

    S = _stack_alloc(wbvh.stack_bound, wbvh.depth)
    sp0 = jnp.ones((n_rays,), jnp.int32)
    if mask is not None:
        sp0 = jnp.where(mask, sp0, 0)

    state = dict(
        stack=jnp.zeros((n_rays, S), jnp.int32),  # root id 0 pre-pushed (top at slot 0)
        sp=sp0,
        best_t=jnp.asarray(rays.max_distance, jnp.float32),
        best_tri=jnp.full((n_rays,), -1, jnp.int32),
        best_u=jnp.zeros((n_rays,), jnp.float32),
        best_v=jnp.zeros((n_rays,), jnp.float32),
        found=jnp.zeros((n_rays,), bool),
    )
    if init is not None:
        # primed best-hit seed (see _prime_hits); any-hit lanes whose
        # candidate already occludes skip traversal entirely
        state.update(init)
        state["sp"] = jnp.where(init["found"] & shadow, 0, state["sp"])
    if profile:
        state["pops"] = jnp.zeros((n_rays,), jnp.int32)
        state["iters"] = jnp.zeros((n_rays,), jnp.int32)
    elif count_pops:
        state["pops"] = jnp.zeros((n_rays,), jnp.int32)
    if state_override is not None:
        # multipass continuation: full mid-traversal state (incl. stack)
        # carried from a capped earlier pass (see _multipass_flat)
        state = dict(state_override)

    def cond(st):
        live = (st["sp"] > 0) & ~(st["found"] & shadow)
        return jnp.any(live)

    def body(st):
        sp = st["sp"]
        active = (sp > 0) & ~(st["found"] & shadow)
        top, stack = _stack_pop(st["stack"], active)
        entry = jnp.where(active, top, 0)
        sp = jnp.where(active, sp - 1, sp)
        if profile:
            st["pops"] = st["pops"] + active.astype(jnp.int32)
            st["iters"] = st["iters"] + 1
        elif count_pops:
            st["pops"] = st["pops"] + active.astype(jnp.int32)

        row = jnp.take(table, entry, axis=0)  # (R, 64) THE gather
        is_leaf = entry >= n_i

        t_cap = st["best_t"]

        # ---- leaf: LEAF_K-wide MT --------------------------------------------
        l_hit, l_t, l_u, l_v = _mt_leaf(row, ox, oy, oz, dx, dy, dz, t_min, t_cap[:, None])
        lane_leaf = active & is_leaf
        l_t_m = jnp.where(l_hit, l_t, jnp.inf)
        jbest = jnp.argmin(l_t_m, axis=1)
        oh4 = jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] == jbest[:, None]
        cand_t = jnp.sum(jnp.where(oh4, l_t_m, 0.0), axis=1)
        cand_any = jnp.any(l_hit, axis=1)
        ids4 = _decode_ids(row[:, IDS_OFF : IDS_OFF + LEAF_K])
        cand_tri = jnp.sum(jnp.where(oh4, ids4, 0), axis=1)
        cand_u = jnp.sum(jnp.where(oh4, l_u, 0.0), axis=1)
        cand_v = jnp.sum(jnp.where(oh4, l_v, 0.0), axis=1)
        take = lane_leaf & cand_any & (cand_t < st["best_t"])
        st["best_t"] = jnp.where(take, cand_t, st["best_t"])
        st["best_tri"] = jnp.where(take, cand_tri, st["best_tri"])
        st["best_u"] = jnp.where(take, cand_u, st["best_u"])
        st["best_v"] = jnp.where(take, cand_v, st["best_v"])
        st["found"] = st["found"] | (lane_leaf & cand_any)

        # ---- internal: ARITY AABBs, sort, push nearest-first ------------------
        a_hit, a_t = _aabb_children(row, ox, oy, oz, ix, iy, iz, t_cap[:, None])
        meta = _decode_ids(row[:, META_OFF : META_OFF + ARITY])
        t8 = jnp.where(a_hit & (meta >= 0), a_t, jnp.inf)
        cands, valid = _sorted_candidates(t8, meta, wbvh.n_rows)

        lane_int = active & ~is_leaf
        n_push = jnp.where(lane_int, jnp.sum(valid.astype(jnp.int32), axis=1), 0)
        stack = _stack_push_sorted(stack, cands, n_push)
        sp = jnp.minimum(sp + n_push, S)

        st["stack"] = stack
        st["sp"] = sp
        return st

    if unroll > 1:
        # check the (cross-lane reduce + scalar sync) condition every
        # ``unroll`` steps: a step with sp==0 everywhere is a pure no-op, so
        # up to unroll-1 wasted steps trade against halved/quartered
        # per-step loop overhead.
        one = body

        def body(s, _one=one):
            for _ in range(unroll):
                s = _one(s)
            return s

    if max_iters > 0:
        def stepped_c(c):
            it, s = c
            return it + 1, body(s)

        _, st = jax.lax.while_loop(
            lambda c: (c[0] < max_iters) & cond(c[1]), stepped_c,
            (jnp.zeros((), jnp.int32), state))
    else:
        st = jax.lax.while_loop(cond, body, state)
    if return_state:
        return st
    keys = ("best_t", "best_tri", "best_u", "best_v", "found")
    if profile:
        keys = keys + ("pops", "iters")
    elif count_pops:
        keys = keys + ("pops",)
    return {k: st[k] for k in keys}


# Capped-pass occupancy knobs (flat path only; every two-level occupancy
# variant — capped-pass, tail-continuation — lost on TPU and was deleted,
# PERF.md rounds 3g/4d; this flat multipass is the only alive-resort
# implementation left, kept for the gp-sharded path).
_PASSES = int(_os.environ.get("MRT_PASSES", "1"))
_PASS_CAP = int(_os.environ.get("MRT_PASSCAP", "12"))


def _multipass_flat(wbvh, rays, t_min, mask, shadow, init, chunks, unroll,
                    count_pops, passes, cap):
    """Capped-pass + alive-resort execution of the FLAT traversal — the only
    surviving occupancy-recovery variant (kept for the gp-sharded path,
    which forces two_level=False); the two-level tail-continuation twin
    measured 1.6-2.7x slower on TPU and was deleted (PERF.md round 4d)."""
    n = rays.origin.shape[0]
    rc = n // chunks
    impl = _traverse_flat_rows
    m = jnp.ones((n,), bool) if mask is None else mask
    # MRT_PASSCAP is in traversal STEPS; max_iters counts while TRIPS of the
    # unrolled body (the round-3d sweep capped at 12 trips = 48 steps with
    # unroll 4 — far beyond the tail it was meant to cut; docs/PERF.md 3e)
    cap = max(1, cap // max(unroll, 1))

    def to_chunks(k, v):
        return v.reshape((chunks, rc) + v.shape[1:])

    def from_chunks(k, v):
        return v.reshape((n,) + v.shape[2:])

    def lane_axis(k):
        return 0

    # pass 1 (capped) builds state from rays/mask/init per chunk
    init_c = ({k: v.reshape((chunks, rc) + v.shape[1:]) for k, v in init.items()}
              if init is not None else None)

    def p1(args):
        o, d, md, mm, sh, ini = args
        return impl(wbvh, Rays(o, d, md), t_min, mm, sh, init=ini,
                    unroll=unroll, count_pops=count_pops,
                    max_iters=cap, return_state=True)

    st = jax.lax.map(p1, (rays.origin.reshape(chunks, rc, 3),
                          rays.direction.reshape(chunks, rc, 3),
                          rays.max_distance.reshape(chunks, rc),
                          m.reshape(chunks, rc),
                          shadow.reshape(chunks, rc), init_c))
    st = {k: from_chunks(k, v) for k, v in st.items()}

    rays_c, shadow_c = rays, shadow
    order_total = None
    for p in range(passes - 1):
        alive = (st["sp"] > 0) & ~(st["found"] & shadow_c)
        order = jnp.argsort(~alive, stable=True)  # alive-first, order kept
        pool = jnp.concatenate(
            [rays_c.origin, rays_c.direction, rays_c.max_distance[:, None],
             shadow_c.astype(jnp.float32)[:, None]], axis=1)
        # ONE wide row gather for state + ray pool (see _permute_state_packed)
        st = _permute_state_packed(dict(st, _pool=pool), order, lane_axis)
        pool = st.pop("_pool")
        rays_c = Rays(pool[:, 0:3], pool[:, 3:6], pool[:, 6])
        shadow_c = pool[:, 7] > 0.5
        order_total = (order if order_total is None
                       else jnp.take(order_total, order))

        cap_i = 0 if p == passes - 2 else cap
        parts = {k: to_chunks(k, v) for k, v in st.items()}

        def p2(args, _cap=cap_i):
            o, d, md, sh, ov = args
            return impl(wbvh, Rays(o, d, md), t_min, None, sh,
                        unroll=unroll, count_pops=count_pops,
                        max_iters=_cap, return_state=True,
                        state_override=ov)

        st = jax.lax.map(p2, (rays_c.origin.reshape(chunks, rc, 3),
                              rays_c.direction.reshape(chunks, rc, 3),
                              rays_c.max_distance.reshape(chunks, rc),
                              shadow_c.reshape(chunks, rc), parts))
        st = {k: from_chunks(k, v) for k, v in st.items()}

    keys = ("best_t", "best_tri", "best_u", "best_v", "found")
    if count_pops:
        keys = keys + ("pops",)
    inv = jnp.argsort(order_total)
    # one packed unsort gather instead of one narrow take per key
    return _permute_state_packed({k: st[k] for k in keys}, inv, lambda k: 0)


def _traverse_stream(wbvh: WideBVH, rays: Rays, t_min, mask, shadow, init,
                     window: int, refill_every: int, profile: bool = False,
                     dead_last: bool = False):
    """Streaming wavefront traversal: a fixed WINDOW of lanes walks the BVH;
    every ``refill_every`` steps, retired lanes write their results back and
    load fresh rays from the (coherence-sorted) pool.

    Why: the chunked while_loop pays max-steps-per-chunk for every lane —
    measured 3.4-9x more gather rows than rays actually consume
    (docs/PERF.md round 2). Refill keeps occupancy near 1, paying ~mean
    steps + ~2 narrow gathers per ray for the load/store traffic.
    """
    n_rays = rays.origin.shape[0]
    n_i = wbvh.n_internal
    table = wbvh.table
    W = min(window, n_rays)

    live0 = jnp.ones((n_rays,), bool) if mask is None else mask

    # pool of ray records: [o(3) d(3) maxd live shadow init_t init_tri init_u
    # init_v init_found] — one narrow row gather loads a lane
    f32 = jnp.float32
    if init is None:
        init = dict(
            best_t=jnp.asarray(rays.max_distance, f32),
            best_tri=jnp.full((n_rays,), -1, jnp.int32),
            best_u=jnp.zeros((n_rays,), f32),
            best_v=jnp.zeros((n_rays,), f32),
            found=jnp.zeros((n_rays,), bool),
        )
    pool = jnp.concatenate(
        [
            rays.origin,
            rays.direction,
            init["best_t"][:, None],
            _encode_ids(init["best_tri"])[:, None],
            init["best_u"][:, None],
            init["best_v"][:, None],
            init["found"].astype(f32)[:, None],
            live0.astype(f32)[:, None],
            shadow.astype(f32)[:, None],
        ],
        axis=1,
    )  # (R, 13)

    # When the pool is coherence-sorted, dead (masked-off) rays sort to the
    # END (see _sort_keys); capping refill at the live count means they never
    # occupy window slots — the stream analog of all-dead chunks exiting
    # instantly. Without that guarantee (dead_last=False) every pool entry
    # must be loaded (dead lanes retire at their first refill).
    n_live = jnp.sum(live0.astype(jnp.int32)) if dead_last else jnp.asarray(n_rays, jnp.int32)

    n_out = 5

    def load(pool_rows, ids):
        """Unpack pool rows -> per-lane state dict pieces."""
        o = pool_rows[:, 0:3]
        d = pool_rows[:, 3:6]
        best_t = pool_rows[:, 6]
        best_tri = _decode_ids(pool_rows[:, 7])
        best_u = pool_rows[:, 8]
        best_v = pool_rows[:, 9]
        found = pool_rows[:, 10] > 0.5
        lv = pool_rows[:, 11] > 0.5
        sh = pool_rows[:, 12] > 0.5
        valid = ids < n_rays
        # a lane starts live unless masked off, already-retired (primed
        # any-hit), or out of pool range
        sp = jnp.where(valid & lv & ~(found & sh), 1, 0).astype(jnp.int32)
        return o, d, best_t, best_tri, best_u, best_v, found, sh, sp

    ids0 = jnp.arange(W, dtype=jnp.int32)
    o0, d0, bt0, btri0, bu0, bv0, f0, sh0, sp0 = load(
        jnp.take(pool, jnp.minimum(ids0, n_rays - 1), axis=0), ids0
    )

    # out defaults = init values, so rays never loaded (masked-off rays in a
    # dead_last pool) still report their primed/empty results
    out0 = jnp.concatenate(
        [
            init["best_t"][:, None],
            _encode_ids(init["best_tri"])[:, None],
            init["best_u"][:, None],
            init["best_v"][:, None],
            init["found"].astype(f32)[:, None],
        ],
        axis=1,
    )
    S = _stack_alloc(wbvh.stack_bound, wbvh.depth)
    state = dict(
        ray_id=ids0,
        o=o0, d=d0,
        stack=jnp.zeros((W, S), jnp.int32),
        sp=sp0,
        best_t=bt0, best_tri=btri0, best_u=bu0, best_v=bv0, found=f0,
        shadow=sh0,
        next=jnp.asarray(W, jnp.int32),
        out=out0,
    )
    if profile:
        state["pops"] = jnp.zeros((n_rays,), jnp.int32)
        state["nsteps"] = jnp.zeros((), jnp.int32)
        state["occupancy"] = jnp.zeros((), jnp.int32)  # sum of active lanes

    def step(st):
        active = st["sp"] > 0
        sp = st["sp"]
        top, stack0 = _stack_pop(st["stack"], active)
        entry = jnp.where(active, top, 0)
        sp = jnp.where(active, sp - 1, sp)
        if profile:
            st["pops"] = st["pops"].at[
                jnp.where(active, st["ray_id"], n_rays)
            ].add(1, mode="drop")
            st["nsteps"] = st["nsteps"] + 1
            st["occupancy"] = st["occupancy"] + jnp.sum(active.astype(jnp.int32))

        row = jnp.take(table, entry, axis=0)
        is_leaf = entry >= n_i
        o, d = st["o"], st["d"]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
        ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]
        t_cap = st["best_t"]

        l_hit, l_t, l_u, l_v = _mt_leaf(row, ox, oy, oz, dx, dy, dz, t_min, t_cap[:, None])
        lane_leaf = active & is_leaf
        l_t_m = jnp.where(l_hit, l_t, jnp.inf)
        jbest = jnp.argmin(l_t_m, axis=1)
        ohK = jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] == jbest[:, None]
        cand_t = jnp.sum(jnp.where(ohK, l_t_m, 0.0), axis=1)
        cand_any = jnp.any(l_hit, axis=1)
        idsK = _decode_ids(row[:, IDS_OFF : IDS_OFF + LEAF_K])
        cand_tri = jnp.sum(jnp.where(ohK, idsK, 0), axis=1)
        cand_u = jnp.sum(jnp.where(ohK, l_u, 0.0), axis=1)
        cand_v = jnp.sum(jnp.where(ohK, l_v, 0.0), axis=1)
        take = lane_leaf & cand_any & (cand_t < st["best_t"])
        st["best_t"] = jnp.where(take, cand_t, st["best_t"])
        st["best_tri"] = jnp.where(take, cand_tri, st["best_tri"])
        st["best_u"] = jnp.where(take, cand_u, st["best_u"])
        st["best_v"] = jnp.where(take, cand_v, st["best_v"])
        st["found"] = st["found"] | (lane_leaf & cand_any)
        # any-hit lanes retire at first hit
        sp = jnp.where(st["found"] & st["shadow"], 0, sp)

        a_hit, a_t = _aabb_children(row, ox, oy, oz, ix, iy, iz, t_cap[:, None])
        meta = _decode_ids(row[:, META_OFF : META_OFF + ARITY])
        tA = jnp.where(a_hit & (meta >= 0), a_t, jnp.inf)
        cands, valid = _sorted_candidates(tA, meta, wbvh.n_rows)

        lane_int = active & ~is_leaf
        n_push = jnp.where(lane_int, jnp.sum(valid.astype(jnp.int32), axis=1), 0)
        st["stack"] = _stack_push_sorted(stack0, cands, n_push)
        st["sp"] = jnp.minimum(sp + n_push, S)
        return st

    def refill(st):
        retired = st["sp"] <= 0
        # write back retired lanes' results (drop lanes already written:
        # ray_id is bumped out of range after its first write-back)
        lane_iota = jnp.arange(W, dtype=jnp.int32)
        wid = jnp.where(retired, st["ray_id"], n_rays + lane_iota)
        out = st["out"].at[wid].set(
            jnp.stack(
                [
                    st["best_t"],
                    _encode_ids(st["best_tri"]),
                    st["best_u"],
                    st["best_v"],
                    st["found"].astype(f32),
                ],
                axis=1,
            ),
            mode="drop", unique_indices=True,
        )
        st["out"] = out
        # assign fresh pool rays to retired lanes
        slot = jnp.cumsum(retired.astype(jnp.int32)) - 1
        new_id = st["next"] + slot
        take_new = retired & (new_id < n_live)
        ids = jnp.where(take_new, new_id, n_rays)
        rows = jnp.take(pool, jnp.minimum(ids, n_rays - 1), axis=0)
        o, d, bt, btri, bu, bv, fnd, sh, sp_new = load(rows, ids)

        def sel(new, old):
            m = take_new
            while m.ndim < new.ndim:
                m = m[..., None]
            return jnp.where(m, new, old)

        st["o"] = sel(o, st["o"])
        st["d"] = sel(d, st["d"])
        st["best_t"] = sel(bt, st["best_t"])
        st["best_tri"] = sel(btri, st["best_tri"])
        st["best_u"] = sel(bu, st["best_u"])
        st["best_v"] = sel(bv, st["best_v"])
        st["found"] = sel(fnd, st["found"])
        st["shadow"] = sel(sh, st["shadow"])
        st["sp"] = jnp.where(take_new, sp_new, jnp.where(retired, 0, st["sp"]))
        st["stack"] = jnp.where(take_new[:, None], 0, st["stack"])
        # retired lanes (written back) must not be written again
        st["ray_id"] = jnp.where(take_new, new_id, jnp.where(retired, n_rays, st["ray_id"]))
        st["next"] = jnp.minimum(st["next"] + jnp.sum(retired.astype(jnp.int32)), n_live)
        return st

    def cond(st):
        return jnp.any(st["sp"] > 0) | (st["next"] < n_live)

    def body(st):
        def inner(_, s):
            return step(s)

        st = jax.lax.fori_loop(0, refill_every, inner, st)
        return refill(st)

    st = jax.lax.while_loop(cond, body, state)
    st = refill(st)  # final write-back of any lanes retired exactly at exit

    out = st["out"]
    res = dict(
        best_t=out[:, 0],
        best_tri=_decode_ids(out[:, 1]),
        best_u=out[:, 2],
        best_v=out[:, 3],
        found=out[:, 4] > 0.5,
    )
    if profile:
        res["pops"] = st["pops"]
        # per-lane "paid" rows: window steps spread over the pool
        res["iters"] = jnp.full(
            (n_rays,), st["nsteps"] * W // max(n_rays, 1), jnp.int32
        )
        res["nsteps"] = jnp.full((n_rays,), st["nsteps"], jnp.int32)
        res["occupancy"] = jnp.full((n_rays,), st["occupancy"], jnp.int32)
    return res


def closest_hit(
    wbvh: WideBVH, rays: Rays, t_min: float = 0.0, mask=None,
    chunks: int = 1, sort_rays: bool = False, prime_tri=None, tri_rows=None,
    stream_window: int = 0, refill_every: int = 8, unroll: int = 1,
    sort_hint=None, count_pops: bool = False,
):
    st = _traverse(
        wbvh, rays, t_min, any_hit_mode=False, mask=mask, chunks=chunks,
        sort_rays=sort_rays, prime_tri=prime_tri, tri_rows=tri_rows,
        stream_window=stream_window, refill_every=refill_every, unroll=unroll,
        sort_hint=sort_hint, count_pops=count_pops,
    )
    found = st["best_tri"] >= 0
    hits = Hits(
        t=jnp.where(found, st["best_t"], jnp.inf),
        triangle=st["best_tri"],
        u=st["best_u"],
        v=st["best_v"],
    )
    if count_pops:
        return hits, st["pops"]
    return hits


def trace_mixed(
    wbvh: WideBVH, rays: Rays, shadow: jnp.ndarray, t_min: float = 0.0, mask=None,
    chunks: int = 1, sort_rays: bool = False, stream_window: int = 0,
    refill_every: int = 8, unroll: int = 1, sort_hint=None,
    count_pops: bool = False,
):
    """One traversal over a MIXED batch: lanes with shadow=True run any-hit
    (retire at first hit), the rest run closest-hit. Fuses the wavefront's
    next-bounce + shadow traversals into a single sorted/chunked call.

    Returns (Hits for all lanes, occluded flags)."""
    st = _traverse(
        wbvh, rays, t_min, any_hit_mode=False, mask=mask,
        chunks=chunks, sort_rays=sort_rays, shadow=shadow,
        stream_window=stream_window, refill_every=refill_every, unroll=unroll,
        sort_hint=sort_hint, count_pops=count_pops,
    )
    found = st["best_tri"] >= 0
    hits = Hits(
        t=jnp.where(found, st["best_t"], jnp.inf),
        triangle=st["best_tri"],
        u=st["best_u"],
        v=st["best_v"],
    )
    if count_pops:
        return hits, st["found"] & shadow, st["pops"]
    return hits, st["found"] & shadow


def any_hit(
    wbvh: WideBVH, rays: Rays, t_min: float = 0.0, mask=None,
    chunks: int = 1, sort_rays: bool = False, prime_tri=None, tri_rows=None,
    return_tri: bool = False, stream_window: int = 0, refill_every: int = 8,
    unroll: int = 1, sort_hint=None, count_pops: bool = False,
):
    """Occlusion query. With prime_tri/tri_rows, lanes whose cached occluder
    still blocks retire after ONE row gather (shadow caching — the dominant
    shadow-ray cost saver under temporal/sample coherence).

    return_tri=True additionally returns the blocking triangle's id (-1 if
    unoccluded) so callers can maintain the occluder cache."""
    st = _traverse(
        wbvh, rays, t_min, any_hit_mode=True, mask=mask, chunks=chunks,
        sort_rays=sort_rays, prime_tri=prime_tri, tri_rows=tri_rows,
        stream_window=stream_window, refill_every=refill_every, unroll=unroll,
        sort_hint=sort_hint, count_pops=count_pops,
    )
    out = (st["found"],)
    if return_tri:
        out = out + (jnp.where(st["found"], st["best_tri"], -1),)
    if count_pops:
        out = out + (st["pops"],)
    return out if len(out) > 1 else out[0]
