"""Count BVH rows gathered per ray, split internal vs leaf, for candidate
(ARITY, LEAF_K) shapes — the decision input for the fat-row redesign.

Uses a pure-NumPy traversal twin (exact same topology + ordered descent as
bvh/wide.py) so it runs anywhere without TPU time. Rays: primary (coherent)
and cosine-bounce secondary (incoherent) off first hits.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mrt_tpu.assets import procedural
from mrt_tpu.utils import native


def np_traverse_counts(child, leaf, bmin, bmax, leaf_bmin, leaf_bmax, tri_v, o, d, tmax):
    """Ordered stack traversal in NumPy, per-ray (slow, but exact counts).
    Returns (internal_pops, leaf_pops, best_t)."""
    ni = child.shape[0]
    n_int_pops = 0
    n_leaf_pops = 0
    best_t = tmax
    stack = [0] if ni > 0 else [ni]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    while stack:
        e = stack.pop()
        if e < ni:
            n_int_pops += 1
            cs = child[e]
            valid = cs >= 0
            cidx = np.maximum(cs, 0)
            is_leaf_child = cidx >= ni
            cbmin = np.where(is_leaf_child[:, None], leaf_bmin[np.maximum(cidx - ni, 0)], bmin[np.minimum(cidx, max(ni - 1, 0))])
            cbmax = np.where(is_leaf_child[:, None], leaf_bmax[np.maximum(cidx - ni, 0)], bmax[np.minimum(cidx, max(ni - 1, 0))])
            t0 = (cbmin - o) * inv
            t1 = (cbmax - o) * inv
            tn = np.minimum(t0, t1).max(axis=1)
            tf = np.maximum(t0, t1).min(axis=1)
            hit = valid & (tn <= tf) & (tf >= 0) & (tn <= best_t)
            order = np.argsort(np.where(hit, tn, np.inf))
            for k in order[::-1]:
                if hit[k]:
                    stack.append(int(cs[k]))
        else:
            n_leaf_pops += 1
            tris = leaf[e - ni]
            for t_id in tris:
                if t_id < 0:
                    continue
                v0, v1, v2 = tri_v[t_id]
                e1 = v1 - v0
                e2 = v2 - v0
                p = np.cross(d, e2)
                det = e1 @ p
                if abs(det) < 1e-9:
                    continue
                invdet = 1.0 / det
                tv = o - v0
                u = (tv @ p) * invdet
                if u < 0 or u > 1:
                    continue
                q = np.cross(tv, e1)
                v = (d @ q) * invdet
                if v < 0 or u + v > 1:
                    continue
                t = (e2 @ q) * invdet
                if 1e-4 <= t < best_t:
                    best_t = t
    return n_int_pops, n_leaf_pops, best_t


def compute_bounds(child, leaf, tri_v, ni):
    nl = leaf.shape[0]
    leaf_bmin = np.full((nl, 3), np.inf, np.float32)
    leaf_bmax = np.full((nl, 3), -np.inf, np.float32)
    for i in range(nl):
        tris = leaf[i][leaf[i] >= 0]
        vs = tri_v[tris].reshape(-1, 3)
        leaf_bmin[i] = vs.min(axis=0)
        leaf_bmax[i] = vs.max(axis=0)
    bmin = np.full((max(ni, 1), 3), np.inf, np.float32)
    bmax = np.full((max(ni, 1), 3), -np.inf, np.float32)
    # children precede parents? No — preorder: parents first. Iterate reversed.
    for i in range(ni - 1, -1, -1):
        for c in child[i]:
            if c < 0:
                continue
            if c < ni:
                bmin[i] = np.minimum(bmin[i], bmin[c])
                bmax[i] = np.maximum(bmax[i], bmax[c])
            else:
                bmin[i] = np.minimum(bmin[i], leaf_bmin[c - ni])
                bmax[i] = np.maximum(bmax[i], leaf_bmax[c - ni])
    return bmin, bmax, leaf_bmin, leaf_bmax


def main():
    n_sub = int(os.environ.get("MRT_BLOB_SUB", "5"))
    mesh = procedural.blob(subdivisions=n_sub)
    pos = np.asarray(mesh.positions)
    idx = np.concatenate([s.indices.reshape(-1, 3) for s in mesh.submeshes])
    tri_v = pos[idx]  # (T,3,3)
    tv9 = tri_v.reshape(-1, 9).astype(np.float32)
    print(f"blob tris={tri_v.shape[0]}")

    rng = np.random.default_rng(0)
    n_rays = int(os.environ.get("MRT_RAYS", "400"))
    # primary: camera at +z looking at origin
    cam = np.array([0, 0.2, 2.2], np.float32)
    targets = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 1.0
    prim_d = targets - cam
    prim_d /= np.linalg.norm(prim_d, axis=1, keepdims=True)

    for arity, leaf_k in ((12, 8), (16, 16), (24, 24), (32, 32), (32, 48), (48, 48), (64, 64)):
        out = native.build_wide_bvh_sah(tv9, arity, leaf_k)
        child, leaf, depth, _clip = out
        ni = child.shape[0]
        bmin, bmax, lbmin, lbmax = compute_bounds(child, leaf, tri_v, ni)
        t0 = time.time()
        ip = lp = 0
        sec_o, sec_d = [], []
        for r in range(n_rays):
            i_, l_, bt = np_traverse_counts(child, leaf, bmin, bmax, lbmin, lbmax, tri_v, cam, prim_d[r], np.inf)
            ip += i_
            lp += l_
            if np.isfinite(bt):
                hitp = cam + prim_d[r] * bt
                dd = rng.normal(size=3).astype(np.float32)
                dd /= np.linalg.norm(dd)
                sec_o.append(hitp + dd * 1e-3)
                sec_d.append(dd)
        sip = slp = 0
        for o_, d_ in zip(sec_o, sec_d):
            i_, l_, _ = np_traverse_counts(child, leaf, bmin, bmax, lbmin, lbmax, tri_v, o_, d_, np.inf)
            sip += i_
            slp += l_
        n_sec = max(len(sec_o), 1)
        int_used = 7 * arity
        leaf_used = 10 * leaf_k
        row = max(int_used, leaf_used)
        row = 1 << int(np.ceil(np.log2(row)))
        print(
            f"A={arity:2d} L={leaf_k:2d} ROW>={row:4d} ni={ni:6d} nl={leaf.shape[0]:6d} depth={depth} | "
            f"primary rows/ray: int={ip/n_rays:.1f} leaf={lp/n_rays:.1f} tot={(ip+lp)/n_rays:.1f} | "
            f"secondary: int={sip/n_sec:.1f} leaf={slp/n_sec:.1f} tot={(sip+slp)/n_sec:.1f} "
            f"({time.time()-t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
