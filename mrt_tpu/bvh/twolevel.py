"""Two-level BVH (BLAS/TLAS) with true instancing — the structural analog of
the reference's per-mesh BLAS + instance-descriptor TLAS
(Renderer.swift:464-606 build, :937-973 per-frame descriptor update,
:1084-1202 refit).

Design (TPU-native, one unified gather table):

* Per UNIQUE mesh, one BLAS built in OBJECT space (shared-mesh scenes store
  one copy; skinned instances get exclusive groups since their pose refits).
* Instance rows hold {world->object affine inverse (12), world AABB (6),
  BLAS root entry, instance id} — popped like any row; entering one
  transforms the lane's ray registers (direction left UNNORMALIZED so t stays
  in world units across spaces).
* A tiny wide TLAS over instance world AABBs sits at the top of the table.
  TLAS rows are tested with the lane's WORLD ray registers.
* Stack discipline guarantees non-interleaving: BLAS entries pushed by an
  instance always sit ABOVE the remaining TLAS/instance entries, so a single
  set of current-ray registers per lane is sufficient.

Entry-id ranges: internal rows (TLAS first, then every BLAS) [0, NI);
leaf rows [NI, NI+NL); instance rows [NI+NL, NI+NL+I).

Per frame, refit touches ONLY skinned BLASes + instance rows + TLAS rows —
static geometry is never rebuilt and never transformed (kills the
whole-world per-frame refit and the manual rebuild_bvh footgun of the
flattened design).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import GEOMETRY_MASK_GEOMETRY, Hits, Rays
from . import lbvh
from .wide import (
    ARITY,
    IDS_OFF,
    LEAF_K,
    META_OFF,
    ROW,
    _BANDSORT,
    _aabb_children,
    _band_partition,
    _decode_ids,
    _encode_ids,
    _mt_leaf,
    _permute_state_packed,
    _sorted_candidates,
    _sort_keys_generic,
    _stack_alloc,
    _stack_pop,
    _stack_push_sorted,
    _stack_size,
    build_topology_wide,
    exact_stack_bound,
)

# NOTE: the MRT_TAILCAP tail-continuation experiment (capped chunks +
# dense continuation batches) was measured 1.6-2.7x SLOWER on TPU at every
# cap and deleted — docs/PERF.md round 4d has the A/B and diagnosis; git
# history has the implementation (_tailcont2 + wide._scatter_state_packed).

# instance-row layout (floats)
_I_MINV = 0  # 12: rows of the 3x4 world->object affine
_I_WBMIN = 12
_I_WBMAX = 15
_I_ROOT = 18
_I_ID = 19
_I_MASK = 20  # geometry mask bits (ShaderTypes.h:26-33), _encode_ids-packed


@jax.tree_util.register_pytree_node_class
class TwoLevelBVH:
    """Unified two-level table + refit metadata. Static aux fields define the
    trace/refit structure; arrays are data."""

    def __init__(self, table, node_child, leaf_tri, root_bmin, root_bmax,
                 flat_tri_base, flat_tri_inst, skin_indices,
                 n_internal: int, n_leaf: int, n_instances: int, tlas_n: int,
                 tlas_depth: int, mesh_meta: tuple, inst_mesh: tuple,
                 stack_bound: int | None = None, inst_masks: tuple | None = None,
                 leaf_clip=None):
        self.table = table  # (N, ROW) f32
        self.node_child = node_child  # (NI, ARITY) int32 global entry ids
        self.leaf_tri = leaf_tri  # (NL, LEAF_K) int32 LOCAL mesh tri ids
        self.root_bmin = root_bmin  # (G, 3) per-mesh-group root AABB (object)
        self.root_bmax = root_bmax
        self.flat_tri_base = flat_tri_base  # (I,) int32 flat tri base/instance
        self.flat_tri_inst = flat_tri_inst  # (Tf,) int32 flat tri -> instance
        self.skin_indices = skin_indices  # tuple of (Tm,3) local indices, one
        # per SKINNED group (refit gathers posed verts through these)
        self.n_internal = int(n_internal)
        self.n_leaf = int(n_leaf)
        self.n_instances = int(n_instances)
        self.tlas_n = int(tlas_n)
        self.tlas_depth = int(tlas_depth)
        # per mesh group: (int_lo, int_len, leaf_lo, leaf_len, depth,
        #                  root_entry, v_start, v_count, skin_slot or -1)
        self.mesh_meta = tuple(tuple(m) for m in mesh_meta)
        self.inst_mesh = tuple(int(i) for i in inst_mesh)  # (I,) group ids
        # exact per-graph worst-case stack occupancy (wide.exact_stack_bound
        # over TLAS -> instance -> BLAS); None = depth heuristic
        self.stack_bound = None if stack_bound is None else int(stack_bound)
        # per-instance geometry mask bits (instance-descriptor .mask analog,
        # ShaderTypes.h:26-33); all-default compiles to mask-free traversal
        self.inst_masks = (tuple(GEOMETRY_MASK_GEOMETRY for _ in range(self.n_instances))
                           if inst_masks is None else tuple(int(m) for m in inst_masks))
        # SBVH: (NL, 6) f32 per-leaf clip boxes (object space) or None —
        # refit intersects computed leaf bounds with them; skinned groups'
        # rows hold ±inf (no-op clamp), see build()
        self.leaf_clip = leaf_clip

    @property
    def has_masks(self) -> bool:
        """Static gate: True only when some instance deviates from the default
        geometry mask — the flagship path never pays for mask filtering."""
        return any(m != GEOMETRY_MASK_GEOMETRY for m in self.inst_masks)

    def tree_flatten(self):
        return (
            (self.table, self.node_child, self.leaf_tri, self.root_bmin,
             self.root_bmax, self.flat_tri_base, self.flat_tri_inst,
             self.skin_indices, self.leaf_clip),
            (self.n_internal, self.n_leaf, self.n_instances, self.tlas_n,
             self.tlas_depth, self.mesh_meta, self.inst_mesh,
             self.stack_bound, self.inst_masks),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:-1], *aux, leaf_clip=children[-1])

    def _replace(self, **kw):
        d = dict(
            table=self.table, node_child=self.node_child, leaf_tri=self.leaf_tri,
            root_bmin=self.root_bmin, root_bmax=self.root_bmax,
            flat_tri_base=self.flat_tri_base, flat_tri_inst=self.flat_tri_inst,
            skin_indices=self.skin_indices,
            n_internal=self.n_internal, n_leaf=self.n_leaf,
            n_instances=self.n_instances, tlas_n=self.tlas_n,
            tlas_depth=self.tlas_depth, mesh_meta=self.mesh_meta,
            inst_mesh=self.inst_mesh, stack_bound=self.stack_bound,
            inst_masks=self.inst_masks, leaf_clip=self.leaf_clip,
        )
        d.update(kw)
        return TwoLevelBVH(**d)


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------

def _tlas_topology(n_inst: int):
    """Wide TLAS topology over instance ids: list of internal nodes, each a
    list of ('I', internal idx) / ('L', instance idx) children (median-ish
    grouping; AABBs are refit per frame so only the grouping is fixed)."""
    nodes: list = []

    def build(ids):
        nodes.append(None)
        me = len(nodes) - 1
        if len(ids) <= ARITY:
            nodes[me] = [("L", i) for i in ids]
            return me
        # split into ARITY contiguous groups
        per = -(-len(ids) // ARITY)
        children = []
        for k in range(0, len(ids), per):
            sub = ids[k : k + per]
            if len(sub) == 1:
                children.append(("L", sub[0]))
            else:
                children.append(("I", build(sub)))
        nodes[me] = children
        return me

    build(list(range(n_inst)))
    depth = 1
    # nodes are preorder; compute depth bottom-up
    d = [1] * len(nodes)
    for i in range(len(nodes) - 1, -1, -1):
        for kind, c in nodes[i]:
            if kind == "I":
                d[i] = max(d[i], d[c] + 1)
    depth = d[0]
    return nodes, depth


def _mesh_topology(obj_tris: np.ndarray, spatial: bool = False):
    """(Tm,9) object-space tris -> (node_child_local, leaf_tri, depth,
    leaf_clip or None). Children local numbering: internal [0, ni),
    leaf [ni, ni+nl). spatial=True = SBVH reference splitting (static
    meshes only: the clip boxes pin leaf bounds to the BUILD-time verts)."""
    from ..utils import native

    out = native.build_wide_bvh_sah(obj_tris, spatial=spatial)
    if out is not None:
        return out
    v0 = obj_tris[:, 0:3]
    v1 = obj_tris[:, 3:6]
    v2 = obj_tris[:, 6:9]
    centroids = (v0 + v1 + v2) / 3.0
    bl, br, _, order, _ = lbvh.build_topology(centroids)
    return (*build_topology_wide(bl, br, order), None)


def build(models, scene_data, skin_slices=(), host_mirror=None) -> TwoLevelBVH:
    """Host-side build over a compiled scene.

    models: host Model list (mesh identity defines sharing).
    scene_data: compiled SceneData (vertex/tri pools give v_starts + tri
    bases). skin_slices: statics.skin_slices — skinned instances get
    exclusive BLAS groups (their pose refits every frame).
    host_mirror: Scene.compile's numpy mirrors; without it this falls back
    to reading the device arrays back, which permanently poisons axon
    dispatch ~300x (docs/PERF.md round 2j) — fine for CPU tests only.
    """
    if host_mirror is not None:
        vertex_instance = host_mirror["vertex_instance"]
        tri_instance = host_mirror["tri_instance"]
    else:
        vertex_instance = np.asarray(scene_data.vertex_instance)
        tri_instance = np.asarray(scene_data.tri_instance)
    n_inst = len(models)
    skinned_insts = {s[0] for s in skin_slices}

    # instance -> vertex start / tri base in the flat pools
    v_starts = np.searchsorted(vertex_instance, np.arange(n_inst))
    flat_tri_base = np.searchsorted(tri_instance, np.arange(n_inst)).astype(np.int32)

    # group instances by mesh identity (skinned = exclusive)
    groups: list = []  # per group: dict(insts, v_start, indices_local, skinned)
    by_mesh: dict = {}
    inst_group = np.zeros(n_inst, np.int32)
    for i, m in enumerate(models):
        key = ("skin", i) if i in skinned_insts else id(m.mesh)
        if key in by_mesh:
            g = by_mesh[key]
            groups[g]["insts"].append(i)
            inst_group[i] = g
            continue
        idx_local = np.concatenate(
            [s.indices.reshape(-1, 3) for s in m.mesh.submeshes]
        ).astype(np.int32)
        groups.append(
            dict(insts=[i], v_start=int(v_starts[i]), indices_local=idx_local,
                 skinned=(i in skinned_insts), positions=m.mesh.positions)
        )
        by_mesh[key] = len(groups) - 1
        inst_group[i] = len(groups) - 1

    # per-group topology
    tlas_nodes, tlas_depth = _tlas_topology(n_inst)
    tlas_n = len(tlas_nodes)

    # SBVH spatial splits for STATIC groups only (object-space verts are
    # immutable there — instance moves are transform updates; skinned
    # groups re-pose every frame, so stale clip boxes would cut geometry).
    # Default OFF: ranked a measured negative offline (PERF.md round 4h —
    # app-scene paid pops −2%, dragon +4%; per-BLAS meshes are uniform
    # blobs where splitting buys nothing, and the scene-spanning planes
    # are separate instances the TLAS already isolates).
    sbvh_on = os.environ.get("MRT_SBVH", "0") == "1"
    topos = []
    for g in groups:
        pos = np.asarray(g["positions"], np.float32)
        idx = g["indices_local"]
        tris = np.concatenate(
            [pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]], axis=1
        )
        topos.append(_mesh_topology(tris, spatial=sbvh_on and not g["skinned"]))

    n_int_total = tlas_n + sum(t[0].shape[0] for t in topos)
    n_leaf_total = sum(t[1].shape[0] for t in topos)
    inst_base = n_int_total + n_leaf_total

    node_child = np.full((n_int_total, ARITY), -1, np.int32)
    leaf_tri = np.full((n_leaf_total, LEAF_K), -1, np.int32)
    any_clip = any(t[3] is not None for t in topos)
    leaf_clip = None
    if any_clip:  # ±inf default = no-op clamp for skinned/unclipped groups
        leaf_clip = np.full((n_leaf_total, 6), np.inf, np.float32)
        leaf_clip[:, :3] = -np.inf
    mesh_meta = []
    int_cursor = tlas_n
    leaf_cursor = 0
    skin_indices = []
    for gi, (g, (child, leaf, depth, clip)) in enumerate(zip(groups, topos)):
        ni, nl = child.shape[0], leaf.shape[0]
        if clip is not None:
            leaf_clip[leaf_cursor : leaf_cursor + nl] = clip
        # offset local child ids -> global entries
        c = child.copy()
        is_int = (c >= 0) & (c < ni)
        is_lf = c >= ni
        c[is_int] += int_cursor
        c[is_lf] = n_int_total + leaf_cursor + (c[is_lf] - ni)
        node_child[int_cursor : int_cursor + ni] = c
        leaf_tri[leaf_cursor : leaf_cursor + nl] = leaf
        root_entry = int_cursor if ni > 0 else n_int_total + leaf_cursor
        skin_slot = -1
        if g["skinned"]:
            skin_slot = len(skin_indices)
            skin_indices.append(jnp.asarray(g["indices_local"]))
        mesh_meta.append(
            (int_cursor, ni, leaf_cursor, nl, depth, root_entry,
             g["v_start"], int(np.asarray(g["positions"]).shape[0]), skin_slot)
        )
        int_cursor += ni
        leaf_cursor += nl

    # TLAS rows: children = deeper TLAS internals or instance entries
    for t, children in enumerate(tlas_nodes):
        for j, (kind, c) in enumerate(children):
            node_child[t, j] = c if kind == "I" else inst_base + c

    # exact worst-case traversal stack bound over the full TLAS -> instance
    # -> BLAS graph (measured 42 vs the depth heuristic's 57 on the app
    # scene — 26% of per-step stack shift bandwidth)
    def _kids(n):
        if n < n_int_total:
            return [int(c) for c in node_child[n] if c >= 0]
        if n >= inst_base:
            return [int(mesh_meta[inst_group[n - inst_base]][5])]
        return []

    stack_bound = exact_stack_bound(_kids) if n_int_total else 1

    bvh = TwoLevelBVH(
        table=jnp.zeros((inst_base + n_inst, ROW), jnp.float32),
        node_child=jnp.asarray(node_child),
        leaf_tri=jnp.asarray(leaf_tri),
        root_bmin=jnp.zeros((len(groups), 3), jnp.float32),
        root_bmax=jnp.zeros((len(groups), 3), jnp.float32),
        flat_tri_base=jnp.asarray(flat_tri_base),
        flat_tri_inst=jnp.asarray(tri_instance),
        skin_indices=tuple(skin_indices),
        n_internal=n_int_total,
        n_leaf=n_leaf_total,
        n_instances=n_inst,
        tlas_n=tlas_n,
        tlas_depth=tlas_depth,
        mesh_meta=tuple(mesh_meta),
        inst_mesh=tuple(int(x) for x in inst_group),
        stack_bound=stack_bound,
        inst_masks=tuple(
            int(getattr(m, "geometry_mask", GEOMETRY_MASK_GEOMETRY)) for m in models
        ),
        leaf_clip=None if leaf_clip is None else jnp.asarray(leaf_clip),
    )
    # initial full refit fills every BLAS + instance + TLAS row
    all_indices = tuple(jnp.asarray(g["indices_local"]) for g in groups)
    return jax.jit(refit, static_argnames=("refit_all",))(
        bvh, scene_data.positions_obj, scene_data.instance_transform,
        refit_all=True, skin_group_indices=all_indices,
    )


# ---------------------------------------------------------------------------
# Device refit (jitted; runs inside the frame step)
# ---------------------------------------------------------------------------

def _pack_leaf_rows(w0, w1, w2, leaf_ids):
    pad_mask = leaf_ids < 0
    nan = jnp.nan
    w0 = jnp.where(pad_mask[..., None], nan, w0)
    w1 = jnp.where(pad_mask[..., None], nan, w1)
    w2 = jnp.where(pad_mask[..., None], nan, w2)
    comps = [w0[:, :, 0], w0[:, :, 1], w0[:, :, 2],
             w1[:, :, 0], w1[:, :, 1], w1[:, :, 2],
             w2[:, :, 0], w2[:, :, 1], w2[:, :, 2]]
    rows = jnp.concatenate(comps + [_encode_ids(leaf_ids)], axis=1)
    rows = jnp.pad(rows, ((0, 0), (0, ROW - rows.shape[1])))
    stacked = jnp.stack([w0, w1, w2], axis=2)
    valid = ~pad_mask
    big = jnp.where(valid[:, :, None, None], stacked, jnp.inf)
    small = jnp.where(valid[:, :, None, None], stacked, -jnp.inf)
    bmin = jnp.min(big, axis=(1, 2)) - 1e-7
    bmax = jnp.max(small, axis=(1, 2)) + 1e-7
    return rows, bmin, bmax


def _refit_group(table, root_bmin, root_bmax, bvh, gi, verts, idx):
    """Recompute one group's BLAS rows (leaf packing + bottom-up internal
    AABBs) from (Vm,3) object-space verts and (Tm,3) local indices."""
    int_lo, ni, leaf_lo, nl, depth, root_entry, _vs, _vc, _slot = bvh.mesh_meta[gi]
    leaf_ids = bvh.leaf_tri[leaf_lo : leaf_lo + nl]
    tid = jnp.maximum(leaf_ids, 0)
    v0 = jnp.take(verts, idx[:, 0], axis=0)
    v1 = jnp.take(verts, idx[:, 1], axis=0)
    v2 = jnp.take(verts, idx[:, 2], axis=0)

    def g(v):
        return jnp.take(v, tid.reshape(-1), axis=0).reshape(nl, LEAF_K, 3)

    leaf_rows, leaf_bmin, leaf_bmax = _pack_leaf_rows(g(v0), g(v1), g(v2), leaf_ids)
    if bvh.leaf_clip is not None:
        # SBVH: pin leaf bounds to the builder's clipped reference boxes
        # (±inf rows for skinned groups make this a no-op clamp there)
        clip = bvh.leaf_clip[leaf_lo : leaf_lo + nl]
        leaf_bmin = jnp.maximum(leaf_bmin, clip[:, :3])
        leaf_bmax = jnp.minimum(leaf_bmax, clip[:, 3:])
    table = table.at[bvh.n_internal + leaf_lo : bvh.n_internal + leaf_lo + nl].set(leaf_rows)
    if ni == 0:
        root_bmin = root_bmin.at[gi].set(leaf_bmin[0])
        root_bmax = root_bmax.at[gi].set(leaf_bmax[0])
        return table, root_bmin, root_bmax
    child = bvh.node_child[int_lo : int_lo + ni]
    empty = child < 0
    local = jnp.where(
        child < bvh.n_internal, child - int_lo,
        ni + (child - bvh.n_internal - leaf_lo),
    )
    local = jnp.clip(jnp.where(empty, 0, local), 0, ni + nl - 1)
    ebmin = jnp.concatenate([jnp.full((ni, 3), jnp.inf), leaf_bmin])
    ebmax = jnp.concatenate([jnp.full((ni, 3), -jnp.inf), leaf_bmax])

    def body(_, carry):
        bmin, bmax = carry
        cmin = jnp.take(bmin, local.reshape(-1), axis=0).reshape(ni, ARITY, 3)
        cmax = jnp.take(bmax, local.reshape(-1), axis=0).reshape(ni, ARITY, 3)
        cmin = jnp.where(empty[..., None], jnp.inf, cmin)
        cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
        bmin = bmin.at[:ni].set(jnp.min(cmin, axis=1))
        bmax = bmax.at[:ni].set(jnp.max(cmax, axis=1))
        return bmin, bmax

    ebmin, ebmax = jax.lax.fori_loop(0, depth, body, (ebmin, ebmax))
    cmin = jnp.take(ebmin, local.reshape(-1), axis=0).reshape(ni, ARITY, 3)
    cmax = jnp.take(ebmax, local.reshape(-1), axis=0).reshape(ni, ARITY, 3)
    cmin = jnp.where(empty[..., None], jnp.inf, cmin)
    cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
    rows = jnp.concatenate(
        [cmin[:, :, 0], cmin[:, :, 1], cmin[:, :, 2],
         cmax[:, :, 0], cmax[:, :, 1], cmax[:, :, 2],
         _encode_ids(child)],
        axis=1,
    )
    rows = jnp.pad(rows, ((0, 0), (0, ROW - rows.shape[1])))
    table = table.at[int_lo : int_lo + ni].set(rows)
    root_bmin = root_bmin.at[gi].set(ebmin[0])
    root_bmax = root_bmax.at[gi].set(ebmax[0])
    return table, root_bmin, root_bmax


def _affine_inverse(M):
    """(I,4,4) -> (I,3,4) inverse of the affine [R|t] (general 3x3 inverse:
    handles rotation+nonuniform scale+shear)."""
    R = M[:, :3, :3]
    t = M[:, :3, 3]
    Rinv = jnp.linalg.inv(R)
    tinv = -jnp.einsum("iab,ib->ia", Rinv, t)
    return jnp.concatenate([Rinv, tinv[:, :, None]], axis=2)  # (I,3,4)


def refit(bvh: TwoLevelBVH, positions_obj, instance_transform, *,
          refit_all: bool = False, skin_group_indices: tuple | None = None):
    """Per-frame update: skinned BLASes (or all, at init) + instance rows +
    TLAS rows. positions_obj: the FLAT object-space vertex pool (skinned
    slices updated by LBS). instance_transform: (I,4,4)."""
    table = bvh.table
    rbmin, rbmax = bvh.root_bmin, bvh.root_bmax

    for gi, meta in enumerate(bvh.mesh_meta):
        int_lo, ni, leaf_lo, nl, depth, root_entry, v_start, v_count, slot = meta
        if slot >= 0:
            # skinned: verts = this group's (exclusive) flat slice
            idx = bvh.skin_indices[slot]
            verts = jax.lax.slice(positions_obj, (v_start, 0), (v_start + v_count, 3))
            table, rbmin, rbmax = _refit_group(
                table, rbmin, rbmax, bvh, gi, verts, idx)
        elif refit_all and skin_group_indices is not None:
            idx = skin_group_indices[gi]
            verts = jax.lax.slice(positions_obj, (v_start, 0), (v_start + v_count, 3))
            table, rbmin, rbmax = _refit_group(
                table, rbmin, rbmax, bvh, gi, verts, idx)

    # --- instance rows -------------------------------------------------------
    I = bvh.n_instances
    M = instance_transform
    minv = _affine_inverse(M)  # (I,3,4)
    gidx = jnp.asarray(bvh.inst_mesh, jnp.int32)
    bmin = jnp.take(rbmin, gidx, axis=0)  # (I,3)
    bmax = jnp.take(rbmax, gidx, axis=0)
    # world AABB: transform the 8 object corners
    sel = jnp.asarray(
        [[(c >> a) & 1 for a in range(3)] for c in range(8)], jnp.float32
    )  # (8,3)
    corners = bmin[:, None, :] * (1 - sel)[None] + bmax[:, None, :] * sel[None]  # (I,8,3)
    wc = jnp.einsum("iab,icb->ica", M[:, :3, :3], corners) + M[:, None, :3, 3]
    wbmin = jnp.min(wc, axis=1)
    wbmax = jnp.max(wc, axis=1)
    roots = jnp.asarray([m[5] for m in bvh.mesh_meta], jnp.int32)
    root_of_inst = jnp.take(roots, gidx)
    inst_rows = jnp.concatenate(
        [
            minv.reshape(I, 12),
            wbmin,
            wbmax,
            _encode_ids(root_of_inst)[:, None],
            _encode_ids(jnp.arange(I, dtype=jnp.int32))[:, None],
            _encode_ids(jnp.asarray(bvh.inst_masks, jnp.int32))[:, None],
        ],
        axis=1,
    )
    inst_rows = jnp.pad(inst_rows, ((0, 0), (0, ROW - inst_rows.shape[1])))
    inst_base = bvh.n_internal + bvh.n_leaf
    table = table.at[inst_base:].set(inst_rows)

    # --- TLAS rows (world space) ---------------------------------------------
    tn = bvh.tlas_n
    child = bvh.node_child[:tn]  # global: < tn internal, >= inst_base instance
    empty = child < 0
    local = jnp.where(child >= inst_base, tn + (child - inst_base), child)
    local = jnp.clip(jnp.where(empty, 0, local), 0, tn + I - 1)
    ebmin = jnp.concatenate([jnp.full((tn, 3), jnp.inf), wbmin])
    ebmax = jnp.concatenate([jnp.full((tn, 3), -jnp.inf), wbmax])

    def body(_, carry):
        bmn, bmx = carry
        cmin = jnp.take(bmn, local.reshape(-1), axis=0).reshape(tn, ARITY, 3)
        cmax = jnp.take(bmx, local.reshape(-1), axis=0).reshape(tn, ARITY, 3)
        cmin = jnp.where(empty[..., None], jnp.inf, cmin)
        cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
        bmn = bmn.at[:tn].set(jnp.min(cmin, axis=1))
        bmx = bmx.at[:tn].set(jnp.max(cmax, axis=1))
        return bmn, bmx

    ebmin, ebmax = jax.lax.fori_loop(0, bvh.tlas_depth, body, (ebmin, ebmax))
    cmin = jnp.take(ebmin, local.reshape(-1), axis=0).reshape(tn, ARITY, 3)
    cmax = jnp.take(ebmax, local.reshape(-1), axis=0).reshape(tn, ARITY, 3)
    cmin = jnp.where(empty[..., None], jnp.inf, cmin)
    cmax = jnp.where(empty[..., None], -jnp.inf, cmax)
    tlas_rows = jnp.concatenate(
        [cmin[:, :, 0], cmin[:, :, 1], cmin[:, :, 2],
         cmax[:, :, 0], cmax[:, :, 1], cmax[:, :, 2],
         _encode_ids(child)],
        axis=1,
    )
    tlas_rows = jnp.pad(tlas_rows, ((0, 0), (0, ROW - tlas_rows.shape[1])))
    table = table.at[:tn].set(tlas_rows)

    return bvh._replace(table=table, root_bmin=rbmin, root_bmax=rbmax)


# ---------------------------------------------------------------------------
# Traversal (streaming wavefront; see bvh/wide._traverse_stream for the
# occupancy rationale — this adds instance-row handling)
# ---------------------------------------------------------------------------

def _world_bounds(bvh: TwoLevelBVH):
    A = ARITY
    root = bvh.table[0]
    bmin = jnp.stack([jnp.min(root[0:A]), jnp.min(root[A:2*A]), jnp.min(root[2*A:3*A])])
    bmax = jnp.stack([jnp.max(root[3*A:4*A]), jnp.max(root[4*A:5*A]), jnp.max(root[5*A:6*A])])
    return bmin, bmax


def _minv_apply(minv12, p, is_dir: bool):
    """Apply a (R,12) packed 3x4 affine to points/directions (R,3)."""
    r0 = minv12[:, 0:3]
    t0 = minv12[:, 3]
    r1 = minv12[:, 4:7]
    t1 = minv12[:, 7]
    r2 = minv12[:, 8:11]
    t2 = minv12[:, 11]
    x = jnp.sum(r0 * p, axis=1)
    y = jnp.sum(r1 * p, axis=1)
    z = jnp.sum(r2 * p, axis=1)
    if not is_dir:
        x = x + t0
        y = y + t1
        z = z + t2
    return jnp.stack([x, y, z], axis=1)


def _slab_world(row, wo, wd, t_cap):
    """Instance-row world-AABB slab test. Returns hit mask."""
    inv = 1.0 / jnp.where(jnp.abs(wd) < 1e-12, jnp.where(wd < 0, -1e-12, 1e-12), wd)
    bmin = row[:, _I_WBMIN : _I_WBMIN + 3]
    bmax = row[:, _I_WBMAX : _I_WBMAX + 3]
    t0 = (bmin - wo) * inv
    t1 = (bmax - wo) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=1)
    return (tn <= tf) & (tf >= 0.0) & (tn <= t_cap)


def _step2(bvh: TwoLevelBVH, t_min, st):
    """One two-level traversal step over a lane-state dict (shared by the
    chunked and streaming wrappers)."""
    active = st["sp"] > 0
    if "pops" in st:
        # per-lane useful-step counter: feeds the workload-predictive sort
        # (next call sorts lanes by expected work so chunk trip counts
        # approach the mean instead of the max — docs/PERF.md round 2g)
        st["pops"] = st["pops"] + active.astype(jnp.int32)
    sp = st["sp"]
    top, stack0 = _stack_pop(st["stack"], active)
    entry = jnp.where(active, top, 0)
    sp = jnp.where(active, sp - 1, sp)

    row = jnp.take(bvh.table, entry, axis=0)
    inst_base = bvh.n_internal + bvh.n_leaf
    is_inst = entry >= inst_base
    is_leaf = (entry >= bvh.n_internal) & ~is_inst
    is_tlas = entry < bvh.tlas_n
    t_cap = st["best_t"]

    # --- instance rows: re-cull against best_t, switch ray space; the
    # BLAS root joins the unified push below ------------------------------
    lane_inst = active & is_inst
    inst_hit = _slab_world(row, st["wo"], st["wd"], t_cap) & lane_inst
    if "ray_mask" in st:
        # geometry-mask filter (intersector.intersect(..., RAY_MASK_*),
        # Raytracing.metal:733-735): skip instances whose mask bits don't
        # overlap the lane's ray mask. Only compiled in when has_masks.
        imask = _decode_ids(row[:, _I_MASK])
        inst_hit = inst_hit & ((imask & st["ray_mask"]) != 0)
    new_o = _minv_apply(row[:, _I_MINV : _I_MINV + 12], st["wo"], is_dir=False)
    new_d = _minv_apply(row[:, _I_MINV : _I_MINV + 12], st["wd"], is_dir=True)
    st["o"] = jnp.where(inst_hit[:, None], new_o, st["o"])
    st["d"] = jnp.where(inst_hit[:, None], new_d, st["d"])
    st["cur_inst"] = jnp.where(
        inst_hit, _decode_ids(row[:, _I_ID]), st["cur_inst"]
    )
    blas_root = _decode_ids(row[:, _I_ROOT])

    # --- current regs (BLAS rows) vs world regs (TLAS rows) ------------
    o_sel = jnp.where(is_tlas[:, None], st["wo"], st["o"])
    d_sel = jnp.where(is_tlas[:, None], st["wd"], st["d"])
    ox, oy, oz = o_sel[:, 0:1], o_sel[:, 1:2], o_sel[:, 2:3]
    dx, dy, dz = d_sel[:, 0:1], d_sel[:, 1:2], d_sel[:, 2:3]
    inv = 1.0 / jnp.where(
        jnp.abs(d_sel) < 1e-12, jnp.where(d_sel < 0, -1e-12, 1e-12), d_sel
    )
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]

    # --- leaf rows: LEAF_K-wide MT (object space; t is world units) ----
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
    st["best_inst"] = jnp.where(take, st["cur_inst"], st["best_inst"])
    st["best_u"] = jnp.where(take, cand_u, st["best_u"])
    st["best_v"] = jnp.where(take, cand_v, st["best_v"])
    st["found"] = st["found"] | (lane_leaf & cand_any)
    sp = jnp.where(st["found"] & st["shadow"], 0, sp)

    # --- internal rows: ARITY child slab tests + ordered push ----------
    a_hit, a_t = _aabb_children(row, ox, oy, oz, ix, iy, iz, t_cap[:, None])
    meta = _decode_ids(row[:, META_OFF : META_OFF + ARITY])
    tA = jnp.where(a_hit & (meta >= 0), a_t, jnp.inf)
    cands, valid = _sorted_candidates(tA, meta, bvh.table.shape[0])

    lane_int = active & ~is_leaf & ~is_inst
    lane_iota = jnp.arange(ARITY, dtype=jnp.int32)[None, :]
    # instance lanes push exactly their BLAS root (candidate slot 0)
    cands = jnp.where(
        (inst_hit[:, None]) & (lane_iota == 0), blas_root[:, None], cands
    )
    n_push = jnp.where(
        lane_int, jnp.sum(valid.astype(jnp.int32), axis=1),
        jnp.where(inst_hit, 1, 0),
    )
    st["stack"] = _stack_push_sorted(stack0, cands, n_push)
    st["sp"] = jnp.minimum(sp + n_push, st["stack"].shape[1])
    return st


def _traverse_stream2(bvh: TwoLevelBVH, rays: Rays, t_min, mask, shadow, init,
                      window: int, refill_every: int, dead_last: bool):
    n_rays = rays.origin.shape[0]
    n_i = bvh.n_internal
    n_l = bvh.n_leaf
    inst_base = n_i + n_l
    tlas_n = bvh.tlas_n
    table = bvh.table
    W = min(window, n_rays)
    f32 = jnp.float32

    live0 = jnp.ones((n_rays,), bool) if mask is None else mask
    if init is None:
        init = dict(
            best_t=jnp.asarray(rays.max_distance, f32),
            best_tri=jnp.full((n_rays,), -1, jnp.int32),  # LOCAL tri ids
            best_u=jnp.zeros((n_rays,), f32),
            best_v=jnp.zeros((n_rays,), f32),
            found=jnp.zeros((n_rays,), bool),
            best_inst=jnp.full((n_rays,), -1, jnp.int32),
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
            _encode_ids(init["best_inst"])[:, None],
        ],
        axis=1,
    )  # (R, 14)
    n_live = jnp.sum(live0.astype(jnp.int32)) if dead_last else jnp.asarray(n_rays, jnp.int32)

    def load(rows, ids):
        wo = rows[:, 0:3]
        wd = rows[:, 3:6]
        best_t = rows[:, 6]
        best_tri = _decode_ids(rows[:, 7])
        best_u = rows[:, 8]
        best_v = rows[:, 9]
        found = rows[:, 10] > 0.5
        lv = rows[:, 11] > 0.5
        sh = rows[:, 12] > 0.5
        best_inst = _decode_ids(rows[:, 13])
        valid = ids < n_rays
        sp = jnp.where(valid & lv & ~(found & sh), 1, 0).astype(jnp.int32)
        return wo, wd, best_t, best_tri, best_u, best_v, found, sh, best_inst, sp

    ids0 = jnp.arange(W, dtype=jnp.int32)
    wo0, wd0, bt0, btri0, bu0, bv0, f0, sh0, bi0, sp0 = load(
        jnp.take(pool, jnp.minimum(ids0, n_rays - 1), axis=0), ids0
    )
    out0 = jnp.concatenate(
        [
            init["best_t"][:, None],
            _encode_ids(init["best_tri"])[:, None],
            init["best_u"][:, None],
            init["best_v"][:, None],
            init["found"].astype(f32)[:, None],
            _encode_ids(init["best_inst"])[:, None],
        ],
        axis=1,
    )
    # stack bound covers the TLAS chain + one instance hop + the deepest BLAS
    S = _stack_alloc(bvh.stack_bound,
                     bvh.tlas_depth + 1 + max(m[4] for m in bvh.mesh_meta))
    state = dict(
        ray_id=ids0,
        wo=wo0, wd=wd0, o=wo0, d=wd0,
        cur_inst=jnp.full((W,), -1, jnp.int32),
        stack=jnp.zeros((W, S), jnp.int32),
        sp=sp0,
        best_t=bt0, best_tri=btri0, best_u=bu0, best_v=bv0, found=f0,
        best_inst=bi0,
        shadow=sh0,
        next=jnp.asarray(W, jnp.int32),
        out=out0,
    )

    def step(st):
        return _step2(bvh, t_min, st)

    def refill(st):
        retired = st["sp"] <= 0
        # ray_ids are unique by construction (each pool ray occupies one
        # lane once; written-back lanes are bumped to the n_rays sentinel,
        # which mode="drop" discards) -> the scatter can vectorize
        lane_iota = jnp.arange(W, dtype=jnp.int32)
        wid = jnp.where(retired, st["ray_id"], n_rays + lane_iota)
        st["out"] = st["out"].at[wid].set(
            jnp.stack(
                [
                    st["best_t"],
                    _encode_ids(st["best_tri"]),
                    st["best_u"],
                    st["best_v"],
                    st["found"].astype(f32),
                    _encode_ids(st["best_inst"]),
                ],
                axis=1,
            ),
            mode="drop", unique_indices=True,
        )
        slot = jnp.cumsum(retired.astype(jnp.int32)) - 1
        new_id = st["next"] + slot
        take_new = retired & (new_id < n_live)
        ids = jnp.where(take_new, new_id, n_rays)
        rows = jnp.take(pool, jnp.minimum(ids, n_rays - 1), axis=0)
        wo, wd, bt, btri, bu, bv, fnd, sh, bi, sp_new = load(rows, ids)

        def sel(new, old):
            m = take_new
            while m.ndim < new.ndim:
                m = m[..., None]
            return jnp.where(m, new, old)

        st["wo"] = sel(wo, st["wo"])
        st["wd"] = sel(wd, st["wd"])
        st["o"] = sel(wo, st["o"])
        st["d"] = sel(wd, st["d"])
        st["cur_inst"] = jnp.where(take_new, -1, st["cur_inst"])
        st["best_t"] = sel(bt, st["best_t"])
        st["best_tri"] = sel(btri, st["best_tri"])
        st["best_inst"] = sel(bi, st["best_inst"])
        st["best_u"] = sel(bu, st["best_u"])
        st["best_v"] = sel(bv, st["best_v"])
        st["found"] = sel(fnd, st["found"])
        st["shadow"] = sel(sh, st["shadow"])
        st["sp"] = jnp.where(take_new, sp_new, jnp.where(retired, 0, st["sp"]))
        st["stack"] = jnp.where(take_new[:, None], 0, st["stack"])
        st["ray_id"] = jnp.where(take_new, new_id, jnp.where(retired, n_rays, st["ray_id"]))
        st["next"] = jnp.minimum(st["next"] + jnp.sum(retired.astype(jnp.int32)), n_live)
        return st

    def cond(st):
        return jnp.any(st["sp"] > 0) | (st["next"] < n_live)

    def body(st):
        st = jax.lax.fori_loop(0, refill_every, lambda _, s: step(s), st)
        return refill(st)

    st = jax.lax.while_loop(cond, body, state)
    st = refill(st)

    out = st["out"]
    return dict(
        best_t=out[:, 0],
        best_tri=_decode_ids(out[:, 1]),
        best_u=out[:, 2],
        best_v=out[:, 3],
        found=out[:, 4] > 0.5,
        best_inst=_decode_ids(out[:, 5]),
    )


# 2D state arrays (lanes first)
_STATE_2D = ("stack", "wo", "wd", "o", "d")


def _lane_axis(key: str) -> int:
    return 0


def _make_state2(o, d, lv, sh, ini, S, count_pops, ray_mask=None):
    """Full per-lane two-level traversal state."""
    w = o.shape[0]
    sp0 = jnp.where(lv & ~(ini["found"] & sh), 1, 0).astype(jnp.int32)
    st = dict(wo=o, wd=d, o=o, d=d,
              stack=jnp.zeros((w, S), jnp.int32))
    st.update(
        cur_inst=jnp.full((w,), -1, jnp.int32),
        sp=sp0,
        best_t=ini["best_t"], best_tri=ini["best_tri"],
        best_u=ini["best_u"], best_v=ini["best_v"],
        found=ini["found"], best_inst=ini["best_inst"],
        shadow=sh,
    )
    if ray_mask is not None:
        st["ray_mask"] = ray_mask.astype(jnp.int32)
    if count_pops:
        st["pops"] = jnp.zeros((w,), jnp.int32)
    return st


def _run_state2(bvh, t_min, st, unroll: int, max_iters: int = 0):
    """Run the two-level step loop over a state dict; ``max_iters`` > 0 caps
    the while trips (capped pass 1); 0 runs to completion."""
    step_fn = _step2

    def stepped(s):
        for _ in range(unroll):
            s = step_fn(bvh, t_min, s)
        return s

    if max_iters > 0:
        def stepped_c(c):
            it, s = c
            return it + 1, stepped(s)

        _, st = jax.lax.while_loop(
            lambda c: (c[0] < max_iters) & jnp.any(c[1]["sp"] > 0),
            stepped_c, (jnp.zeros((), jnp.int32), st))
        return st
    return jax.lax.while_loop(lambda s: jnp.any(s["sp"] > 0), stepped, st)


def _traverse_chunked2(bvh: TwoLevelBVH, rays: Rays, t_min, mask, shadow, init,
                       chunks: int, unroll: int = 1, count_pops: bool = False,
                       ray_mask=None):
    """Chunked two-level traversal (wide._traverse's execution strategy with
    the two-level step): the coherence-sorted batch is split into independent
    while_loops so all-dead chunks exit immediately."""
    n_rays = rays.origin.shape[0]
    f32 = jnp.float32
    live0 = jnp.ones((n_rays,), bool) if mask is None else mask
    if init is None:
        init = dict(
            best_t=jnp.asarray(rays.max_distance, f32),
            best_tri=jnp.full((n_rays,), -1, jnp.int32),
            best_u=jnp.zeros((n_rays,), f32),
            best_v=jnp.zeros((n_rays,), f32),
            found=jnp.zeros((n_rays,), bool),
            best_inst=jnp.full((n_rays,), -1, jnp.int32),
        )
    S = _stack_alloc(bvh.stack_bound,
                     bvh.tlas_depth + 1 + max(m[4] for m in bvh.mesh_meta))

    def run_flat(o, d, lv, sh, ini, rm=None):
        # sp==0 lanes make the step a no-op, so checking the cross-lane
        # condition only every ``unroll`` steps is exact
        st = _make_state2(o, d, lv, sh, ini, S, count_pops, ray_mask=rm)
        st = _run_state2(bvh, t_min, st, unroll)
        keys = ("best_t", "best_tri", "best_u", "best_v", "found", "best_inst")
        if count_pops:
            keys = keys + ("pops",)
        return {k: st[k] for k in keys}

    init = dict(init, best_t=jnp.minimum(init["best_t"],
                                         jnp.asarray(rays.max_distance, f32)))
    if chunks > 1 and n_rays % chunks == 0:
        rc = n_rays // chunks
        def chunk_fn(args):
            o, d, lv, sh, ini, rm = args
            return run_flat(o, d, lv, sh, ini, rm)

        st = jax.lax.map(
            chunk_fn,
            (
                rays.origin.reshape(chunks, rc, 3),
                rays.direction.reshape(chunks, rc, 3),
                live0.reshape(chunks, rc),
                shadow.reshape(chunks, rc),
                {k: v.reshape((chunks, rc) + v.shape[1:]) for k, v in init.items()},
                None if ray_mask is None else ray_mask.reshape(chunks, rc),
            ),
        )
        return {k: v.reshape((n_rays,) + v.shape[2:]) for k, v in st.items()}
    return run_flat(rays.origin, rays.direction, live0, shadow, init, ray_mask)


def _prime_decompose(bvh: TwoLevelBVH, prime_flat):
    """FLAT candidate tri ids -> (local tri, instance)."""
    ok = prime_flat >= 0
    pf = jnp.maximum(prime_flat, 0)
    inst = jnp.take(bvh.flat_tri_inst, pf)
    local = pf - jnp.take(bvh.flat_tri_base, inst)
    return jnp.where(ok, local, -1), jnp.where(ok, inst, -1)


def _to_flat(bvh: TwoLevelBVH, local, inst):
    ok = (local >= 0) & (inst >= 0)
    flat = jnp.take(bvh.flat_tri_base, jnp.maximum(inst, 0)) + jnp.maximum(local, 0)
    return jnp.where(ok, flat, -1)


def _traverse2(bvh: TwoLevelBVH, rays: Rays, t_min, mask, shadow=None,
               sort_rays: bool = True, stream_window: int = 0,
               refill_every: int = 8, prime_tri=None, tri_rows=None,
               chunks: int = 16, unroll: int = 1, sort_hint=None,
               count_pops: bool = False, ray_mask=None):
    n_rays = rays.origin.shape[0]
    live0 = jnp.ones((n_rays,), bool) if mask is None else mask
    if shadow is None:
        shadow = jnp.zeros((n_rays,), bool)
    if ray_mask is not None and not bvh.has_masks:
        ray_mask = None  # all instances default-visible: filter is a no-op

    perm = None
    if sort_rays:
        bmin, bmax = _world_bounds(bvh)
        key = _sort_keys_generic(rays, live0, bmin, bmax)
        if sort_hint is not None:
            # Workload-predictive major key: chunk trip count = the chunk's
            # MAX steps, so grouping lanes by expected step count makes each
            # chunk pay ~its mean instead of the global tail. Oracle-sorted
            # lanes cut paid steps 5.3x -> 1.4x (docs/PERF.md round 2g).
            # Coherence stays as the minor key (live key < 2^15; dead
            # sentinel 1<<24 still sorts last).
            # Banding (see wide._traverse): shadow lanes 0 | hinted lanes
            # 1 + hint (FINE: 1 step per band — offline paid-step simulation
            # matched the oracle at this granularity, docs/PERF.md round 4a)
            # | unknown-cost (hint < 0, bounce) 127 — keeps the cheapest
            # (any-hit shadow) and most expensive (unhinted bounce) lanes of
            # a mixed batch out of each other's chunks.
            hq = jnp.clip(sort_hint, 0, 125) + 1
            band = jnp.where(sort_hint < 0, jnp.int32(127), hq)
            band = jnp.where(shadow, jnp.int32(0), band)
            key = jnp.where(live0, band * (1 << 15) + key, key)
        inv_pre = None
        if (_BANDSORT and sort_hint is not None and n_rays % 256 == 0):
            # band-only partition (see wide._traverse): counting inverse,
            # no coherence minor key, one argsort instead of two
            band_full = jnp.where(live0, band, jnp.int32(255))
            perm, inv_pre = _band_partition(band_full)
        else:
            perm = jnp.argsort(key)
        # ONE wide-row permutation gather instead of six narrow ones: XLA
        # gather cost is per ROW, nearly width-independent to 128 f32
        # (docs/PERF.md round 1); the profiled per-bounce permutation
        # gathers at 65k rows were ~0.5 ms EACH (round 2b). Int fields ride
        # along as bitcast-encoded floats (never touched by arithmetic).
        cols = [rays.origin, rays.direction, rays.max_distance[:, None],
                live0.astype(jnp.float32)[:, None],
                shadow.astype(jnp.float32)[:, None]]
        if prime_tri is not None:
            cols.append(_encode_ids(prime_tri)[:, None])
        if ray_mask is not None:
            cols.append(_encode_ids(ray_mask)[:, None])
        pool = jnp.take(jnp.concatenate(cols, axis=1), perm, axis=0)
        rays = Rays(origin=pool[:, 0:3], direction=pool[:, 3:6],
                    max_distance=pool[:, 6])
        live0 = pool[:, 7] > 0.5
        shadow = pool[:, 8] > 0.5
        col = 9
        if prime_tri is not None:
            prime_tri = _decode_ids(pool[:, col])
            col += 1
        if ray_mask is not None:
            ray_mask = _decode_ids(pool[:, col])

    init = None
    if prime_tri is not None and tri_rows is not None:
        from .wide import _prime_hits

        pt, pu, pv, pok = _prime_hits(
            rays, jnp.where(live0, prime_tri, -1), tri_rows, t_min
        )
        local, inst = _prime_decompose(bvh, prime_tri)
        init = dict(
            best_t=jnp.minimum(jnp.asarray(rays.max_distance, jnp.float32), pt),
            best_tri=jnp.where(pok, local, -1),
            best_u=jnp.where(pok, pu, 0.0),
            best_v=jnp.where(pok, pv, 0.0),
            found=pok,
            best_inst=jnp.where(pok, inst, -1),
        )

    if stream_window > 0 and ray_mask is None:
        # (the stream pool has no ray-mask column; masked scenes take the
        # chunked path — masks are a correctness feature, not a hot path)
        st = _traverse_stream2(
            bvh, rays, t_min, live0, shadow, init,
            window=stream_window, refill_every=refill_every, dead_last=sort_rays,
        )
        if count_pops:  # stream mode has no per-lane counter; hint decays to 0
            st["pops"] = jnp.zeros((n_rays,), jnp.int32)
    else:
        st = _traverse_chunked2(bvh, rays, t_min, live0, shadow, init, chunks,
                                unroll=unroll, count_pops=count_pops,
                                ray_mask=ray_mask)

    if perm is not None:
        # argsort(perm) == inverse permutation; measured 184 us vs 450 us for
        # the scatter formulation at 65k lanes (scripts/microbench_inv.py);
        # the band partition precomputes it by counting instead
        inv = inv_pre if inv_pre is not None else jnp.argsort(perm)
        cols = [st["best_t"], _encode_ids(st["best_tri"]), st["best_u"],
                st["best_v"], st["found"].astype(jnp.float32),
                _encode_ids(st["best_inst"])]
        if count_pops:
            cols.append(_encode_ids(st["pops"]))
        packed = jnp.stack(cols, axis=1)
        out = jnp.take(packed, inv, axis=0)  # one wide unsort gather
        st = dict(
            best_t=out[:, 0], best_tri=_decode_ids(out[:, 1]),
            best_u=out[:, 2], best_v=out[:, 3], found=out[:, 4] > 0.5,
            best_inst=_decode_ids(out[:, 5]),
        )
        if count_pops:
            st["pops"] = _decode_ids(out[:, 6])
    return st


def closest_hit(bvh: TwoLevelBVH, rays: Rays, t_min: float = 0.0, mask=None,
                sort_rays: bool = True, stream_window: int = 0,
                refill_every: int = 8, prime_tri=None, tri_rows=None,
                chunks: int = 16, unroll: int = 1, sort_hint=None,
                count_pops: bool = False, ray_mask=None):
    """Closest hit; returns FLAT triangle ids (instance tri base + local) so
    the shade path is identical to the flattened backend's. stream_window=0
    uses the chunked execution strategy (measured faster once the shift-stack
    made steps cheap, docs/PERF.md round 2). With count_pops=True returns
    (Hits, per-lane useful step counts) for the workload-predictive sort."""
    st = _traverse2(
        bvh, rays, t_min, mask, shadow=None, sort_rays=sort_rays,
        stream_window=stream_window, refill_every=refill_every,
        prime_tri=prime_tri, tri_rows=tri_rows, chunks=chunks, unroll=unroll,
        sort_hint=sort_hint, count_pops=count_pops, ray_mask=ray_mask,
    )
    found = (st["best_tri"] >= 0) & (st["best_inst"] >= 0)
    flat = _to_flat(bvh, st["best_tri"], st["best_inst"])
    hits = Hits(
        t=jnp.where(found, st["best_t"], jnp.inf),
        triangle=jnp.where(found, flat, -1),
        u=st["best_u"],
        v=st["best_v"],
    )
    if count_pops:
        return hits, st["pops"]
    return hits


def trace_mixed(bvh: TwoLevelBVH, rays: Rays, shadow, t_min: float = 0.0,
                mask=None, sort_rays: bool = True, stream_window: int = 0,
                refill_every: int = 8, chunks: int = 16, unroll: int = 1,
                sort_hint=None, count_pops: bool = False, ray_mask=None):
    """One traversal over a MIXED batch (wide.trace_mixed's two-level twin):
    lanes with shadow=True run any-hit and retire at first hit, the rest run
    closest-hit. Fuses the wavefront's next-bounce + deferred-shadow
    traversals into a single sorted/chunked call (halves per-bounce sort /
    permutation / loop-launch overhead). Returns (Hits with FLAT tri ids,
    occluded flags[, per-lane pops when count_pops=True])."""
    st = _traverse2(
        bvh, rays, t_min, mask, shadow=shadow, sort_rays=sort_rays,
        stream_window=stream_window, refill_every=refill_every,
        chunks=chunks, unroll=unroll, sort_hint=sort_hint,
        count_pops=count_pops, ray_mask=ray_mask,
    )
    found = (st["best_tri"] >= 0) & (st["best_inst"] >= 0)
    flat = _to_flat(bvh, st["best_tri"], st["best_inst"])
    hits = Hits(
        t=jnp.where(found, st["best_t"], jnp.inf),
        triangle=jnp.where(found, flat, -1),
        u=st["best_u"],
        v=st["best_v"],
    )
    if count_pops:
        return hits, st["found"] & shadow, st["pops"]
    return hits, st["found"] & shadow


def any_hit(bvh: TwoLevelBVH, rays: Rays, t_min: float = 0.0, mask=None,
            sort_rays: bool = True, stream_window: int = 0,
            refill_every: int = 8, prime_tri=None, tri_rows=None,
            return_tri: bool = False, chunks: int = 16, unroll: int = 1,
            sort_hint=None, count_pops: bool = False, ray_mask=None):
    shadow = jnp.ones((rays.origin.shape[0],), bool)
    st = _traverse2(
        bvh, rays, t_min, mask, shadow=shadow, sort_rays=sort_rays,
        stream_window=stream_window, refill_every=refill_every,
        prime_tri=prime_tri, tri_rows=tri_rows, chunks=chunks, unroll=unroll,
        sort_hint=sort_hint, count_pops=count_pops, ray_mask=ray_mask,
    )
    out = (st["found"],)
    if return_tri:
        flat = _to_flat(bvh, st["best_tri"], st["best_inst"])
        out = out + (jnp.where(st["found"], flat, -1),)
    if count_pops:
        out = out + (st["pops"],)
    return out if len(out) > 1 else out[0]
