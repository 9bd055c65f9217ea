"""MXU-mapped ray-triangle intersection microbench — round 5 item #1.

THE question (VERDICT r4 / PERF.md 4c): the roofline caps the gather-per-node
design family at ~6-7 Mrays/s/chip; the one order-of-magnitude lever left is
mapping intersection onto the MXU as batched matmuls. That was dismissed on a
napkin ("dense-padding waste ~100x, marshaling re-introduces per-row costs").
This bench MEASURES it under the honest protocol (poison first, slope timing
of dependent in-program chains — scripts/honest_microbench.py).

The mapping (Woop 2004 unit-triangle transform): per triangle k precompute
M_k = inv([e1 e2 n]) and translation -M_k v0, so a ray (o, d) intersects via

    o'_k = M_k o + b_k       d'_k = M_k d
    t = -o'z / d'z           u = o'x + t d'x       v = o'y + t d'y
    hit = u>=0 & v>=0 & u+v<=1 & t in (t_min, t_cap)

o' and d' for N rays x K triangles are ONE matmul: X[N,8] = (o,1,d,0) times
W[8,6K] (block coeffs; contraction dim 8 — the intrinsic rank of the ray).
The epilogue is ~10 VPU ops/pair; closest-hit is a packed-key min over K
(t-bits | tri-index, same trick as bvh/wide._sort_children_packed).

Cases measure, in ns per (ray*tri-test), marshaling included:
  vpu_leaf   — PRODUCTION baseline: gathered 128-f32 leaf rows, K=12-wide
               Moller-Trumbore (bvh/wide._mt_leaf expression graph)
  vpu_dense  — same dense NxK work on the VPU (broadcast MT): isolates
               "MXU vs VPU" from "dense vs gathered"
  mxu_f32    — the matmul mapping, f32 HIGHEST precision (exact-test grade)
  mxu_bf16   — bf16 DEFAULT precision (conservative-prefilter grade)
  mxu_mmonly — matmul without epilogue (decomposes matmul vs epilogue cost)
  mxu_group  — G groups of 256 rays, each vs ITS OWN gathered tri tile
               (the realistic in-frame shape: rays binned to cells, tile
               gathered per cell — marshaling in the measured loop)

Derived: implied Mrays/s at tests/ray budgets {24, 100, 500} — 24 is
today's paid leaf-test count/ray; 100-500 is what a shallow cell grid
(no deep BVH) would need.

Reference bar being replaced: /root/reference/MetalRaytracing/
Raytracing.metal:301-318 (HW intersector).

Run detached: nohup python scripts/microbench_mxu_isect.py > /tmp/mxu_isect.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mrt_tpu  # noqa: F401  (cache/platform init)
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- geometry

def random_tris(n, key=0, spread=4.0):
    rng = np.random.default_rng(key)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    return v0, v0 + e1, v0 + e2


def woop_weights(v0, v1, v2):
    """Per-tri affine transform packed as W[8, 6K] matmul weights.

    Column blocks j*K+k, j in 0..5 = (o'x o'y o'z d'x d'y d'z) of tri k.
    Rows 0-2: o coeffs (=M), row 3: translation (o' only), rows 4-6: d
    coeffs (=M), row 7: zero pad (contraction dim rounded to 8).
    """
    K = v0.shape[0]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)  # (K, 3, 3) columns e1|e2|n
    M = np.linalg.inv(A)                # (K, 3, 3)
    b = -np.einsum("kij,kj->ki", M, v0)  # (K, 3)
    W = np.zeros((8, 6 * K), np.float32)
    for j in range(3):  # o' rows: M and translation
        W[0:3, j * K : (j + 1) * K] = M[:, j, :].T
        W[3, j * K : (j + 1) * K] = b[:, j]
    for j in range(3):  # d' rows: M only
        W[4:7, (3 + j) * K : (4 + j) * K] = M[:, j, :].T
    return W


def pack_leaf_rows(v0, v1, v2, leaf_k=12):
    """Production-layout leaf rows: [v0x*K|v0y*K|...|v2z*K|id*K] = 10K f32,
    padded to 128 (bvh/wide.py row layout, leaf part)."""
    n = v0.shape[0]
    n_rows = (n + leaf_k - 1) // leaf_k
    pad = n_rows * leaf_k - n
    if pad:
        v0 = np.concatenate([v0, np.repeat(v0[-1:], pad, 0)])
        v1 = np.concatenate([v1, np.repeat(v1[-1:], pad, 0)])
        v2 = np.concatenate([v2, np.repeat(v2[-1:], pad, 0)])
    parts = []
    for v in (v0, v1, v2):
        for ax in range(3):
            parts.append(v[:, ax].reshape(n_rows, leaf_k))
    ids = np.arange(n_rows * leaf_k, dtype=np.float32).reshape(n_rows, leaf_k)
    parts.append(ids)
    rows = np.concatenate(parts, axis=1)  # (n_rows, 10K)
    out = np.zeros((n_rows, max(128, rows.shape[1])), np.float32)
    out[:, : rows.shape[1]] = rows
    return out


def random_rays(n, key=1, spread=4.0):
    rng = np.random.default_rng(key)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


# ---------------------------------------------------------------- kernels

_EPS = 1e-9
T_CAP = 1e9


def mxu_epilogue(out, K, t_min=1e-4):
    """out: (..., 6K) matmul result -> packed best (t,idx) key per ray."""
    ox_, oy_, oz_ = out[..., :K], out[..., K : 2 * K], out[..., 2 * K : 3 * K]
    dx_, dy_, dz_ = (
        out[..., 3 * K : 4 * K],
        out[..., 4 * K : 5 * K],
        out[..., 5 * K : 6 * K],
    )
    safe = jnp.abs(dz_) > _EPS
    t = -oz_ / jnp.where(safe, dz_, 1.0)
    u = ox_ + t * dx_
    v = oy_ + t * dy_
    hit = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= t_min) & (t <= T_CAP)
    tb = jax.lax.bitcast_convert_type(jnp.where(hit, t, jnp.float32(T_CAP)), jnp.int32)
    key = ((tb >> 11) << 11) | jnp.arange(K, dtype=jnp.int32)
    key = jnp.where(hit, key, jnp.int32((1 << 31) - 1))
    return jnp.min(key, axis=-1)  # packed (quantized t | tri idx)


def make_mxu_case(n_rays, K, dtype, precision, epilogue=True, groups=0,
                  n_tiles=64):
    """Dependent chain: each iter intersects rays vs tile sel(prev_result).
    groups=0: all rays share one tile [N,8]@[8,6K].
    groups=G: [G,256,8] @ [G,8,6K] batched, per-group tile GATHERED from the
    tile table each iteration (marshaling measured)."""
    v0, v1, v2 = random_tris(K * n_tiles, key=7)
    W = np.stack(
        [woop_weights(v0[i * K : (i + 1) * K], v1[i * K : (i + 1) * K],
                      v2[i * K : (i + 1) * K]) for i in range(n_tiles)]
    )  # (n_tiles, 8, 6K)
    o, d = random_rays(n_rays)
    X = np.concatenate([o, np.ones((n_rays, 1), np.float32), d,
                        np.zeros((n_rays, 1), np.float32)], axis=1)  # (N, 8)
    Wj = jnp.asarray(W, dtype)
    Xj = jnp.asarray(X, dtype)
    prec = dict(hi=jax.lax.Precision.HIGHEST, lo=jax.lax.Precision.DEFAULT)[precision]

    if groups:
        G = groups
        per = n_rays // G
        Xg = Xj.reshape(G, per, 8)

        def step(i, carry):
            sel, acc = carry
            tiles = jnp.take(Wj, (sel + jnp.arange(G, dtype=jnp.int32)) % n_tiles,
                             axis=0)  # (G, 8, 6K) gather = marshaling
            out = jax.lax.dot_general(
                Xg, tiles, (((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32)
            best = mxu_epilogue(out, K)  # (G, per)
            s = jnp.min(best)
            acc = acc + s
            return (jnp.abs(s) % n_tiles, acc)

    else:
        def step(i, carry):
            sel, acc = carry
            tile = jnp.take(Wj, sel % n_tiles, axis=0)  # (8, 6K)
            out = jax.lax.dot_general(
                Xj, tile, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            if epilogue:
                best = mxu_epilogue(out, K)  # (N,)
                s = jnp.min(best)
            else:
                s = out.sum().astype(jnp.int32)
            acc = acc + s
            return (jnp.abs(s) % n_tiles, acc)

    def body(iters):
        def run():
            _, acc = jax.lax.fori_loop(
                0, iters, step, (jnp.int32(0), jnp.int32(0)))
            return acc
        return jax.jit(run)

    tests_per_iter = n_rays * K
    return body, tests_per_iter


def make_vpu_leaf_case(n_rays, n_tris, leaf_k=12):
    """Production baseline: per-lane gathered 128-f32 leaf row, K-wide MT.
    Chain: next row index derived from this step's best key."""
    from mrt_tpu.bvh.wide import _mt_leaf

    v0, v1, v2 = random_tris(n_tris, key=7)
    rows = jnp.asarray(pack_leaf_rows(v0, v1, v2, leaf_k))
    n_rows = rows.shape[0]
    o, d = random_rays(n_rays)
    ox, oy, oz = (jnp.asarray(o[:, i : i + 1]) for i in range(3))
    dx, dy, dz = (jnp.asarray(d[:, i : i + 1]) for i in range(3))
    idx0 = jnp.asarray(np.random.default_rng(3).integers(0, n_rows, n_rays),
                       jnp.int32)

    def step(i, carry):
        idx, acc = carry
        row = jnp.take(rows, idx, axis=0)  # (N, 128) THE production gather
        hit, t, u, v = _mt_leaf(row, ox, oy, oz, dx, dy, dz, 1e-4,
                                jnp.float32(T_CAP), K=leaf_k)
        tm = jnp.where(hit, t, jnp.inf)
        best = jnp.min(tm, axis=1)  # (N,)
        acc = acc + jnp.sum(jnp.where(jnp.isfinite(best), best, 0.0))
        nxt = jnp.abs(idx * 1103515245 + 12345
                      + jax.lax.bitcast_convert_type(best, jnp.int32)) % n_rows
        return (nxt, acc)

    def body(iters):
        def run():
            _, acc = jax.lax.fori_loop(0, iters, step, (idx0, jnp.float32(0)))
            return acc
        return jax.jit(run)

    return body, n_rays * leaf_k


def make_vpu_dense_case(n_rays, K, n_tiles=16):
    """Dense NxK Moller-Trumbore on the VPU (broadcast) — MXU's shape, VPU's
    units."""
    v0, v1, v2 = random_tris(K * n_tiles, key=7)
    # (n_tiles, 9, K) component-major tiles for broadcast MT
    tiles_np = np.stack([
        np.stack([v[i * K : (i + 1) * K, ax] for v in (v0, v1, v2)
                  for ax in range(3)])
        for i in range(n_tiles)
    ])  # (n_tiles, 9, K)
    tiles = jnp.asarray(tiles_np)
    o, d = random_rays(n_rays)
    ox, oy, oz = (jnp.asarray(o[:, i : i + 1]) for i in range(3))
    dx, dy, dz = (jnp.asarray(d[:, i : i + 1]) for i in range(3))

    def step(i, carry):
        sel, acc = carry
        tile = jnp.take(tiles, sel % n_tiles, axis=0)  # (9, K)
        v0x, v0y, v0z = tile[0][None], tile[1][None], tile[2][None]
        v1x, v1y, v1z = tile[3][None], tile[4][None], tile[5][None]
        v2x, v2y, v2z = tile[6][None], tile[7][None], tile[8][None]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        valid = jnp.abs(det) > _EPS
        inv = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = valid & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (t >= 1e-4)
        tb = jax.lax.bitcast_convert_type(
            jnp.where(hit, t, jnp.float32(T_CAP)), jnp.int32)
        key = ((tb >> 11) << 11) | jnp.arange(K, dtype=jnp.int32)[None, :]
        key = jnp.where(hit, key, jnp.int32((1 << 31) - 1))
        s = jnp.min(key)
        return (jnp.abs(s) % n_tiles, acc + s)

    def body(iters):
        def run():
            _, acc = jax.lax.fori_loop(0, iters, step, (jnp.int32(0), jnp.int32(0)))
            return acc
        return jax.jit(run)

    return body, n_rays * K


# ---------------------------------------------------------------- timing

def slope_time(body, lo=32, hi=256):
    f_lo, f_hi = body(lo), body(hi)
    r = f_lo()
    jax.block_until_ready(r)
    r = f_hi()
    jax.block_until_ready(r)

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = t(f_lo), t(f_hi)
    return (t_hi - t_lo) / (hi - lo)


def verify_mapping():
    """Woop matmul mapping must agree with Moller-Trumbore."""
    K = 64
    v0, v1, v2 = random_tris(K, key=7)
    W = jnp.asarray(woop_weights(v0, v1, v2))
    o, d = random_rays(256, spread=2.0)
    X = jnp.asarray(np.concatenate(
        [o, np.ones((256, 1), np.float32), d, np.zeros((256, 1), np.float32)], 1))
    out = jax.lax.dot_general(X, W, (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    key = mxu_epilogue(out, K)
    hit_mxu = key != (1 << 31) - 1
    idx_mxu = key & 0x7FF

    from mrt_tpu.bvh.wide import _mt_leaf  # reference expression graph
    row = jnp.asarray(pack_leaf_rows(v0, v1, v2, leaf_k=K)[:, : 10 * K])
    row = jnp.tile(row, (256, 1))
    hit, t, u, v = _mt_leaf(row, *(jnp.asarray(a[:, i : i + 1])
                                   for a in (o, d) for i in range(3)),
                            1e-4, jnp.float32(T_CAP), K=K)
    tm = jnp.where(hit, t, jnp.inf)
    hit_mt = jnp.any(hit, axis=1)
    idx_mt = jnp.argmin(tm, axis=1)
    agree_hit = float(jnp.mean((hit_mxu == hit_mt).astype(jnp.float32)))
    both = hit_mxu & hit_mt
    agree_idx = float(jnp.mean(jnp.where(
        both, (idx_mxu == idx_mt).astype(jnp.float32), 1.0)))
    print(f"verify: hit agreement {agree_hit:.4f}, idx agreement {agree_idx:.4f}",
          flush=True)
    return agree_hit > 0.995


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    ok = verify_mapping()
    if args.verify_only:
        sys.exit(0 if ok else 1)

    # POISON: one tiny D2H so the axon speculator deactivates (PERF.md 3a)
    jnp.zeros((4,)).sum().item()
    print(f"devices: {jax.devices()}", flush=True)

    results = {}

    def run(name, body, tests, lo=32, hi=256):
        per_iter = slope_time(body, lo, hi)
        ns = per_iter / tests * 1e9
        results[name] = ns
        print(json.dumps({
            "case": name, "ns_per_test": round(ns, 5),
            "tests_per_iter": tests,
            "iter_ms": round(per_iter * 1e3, 4),
            "gtests_per_s": round(1.0 / ns, 3) if ns > 0 else None,
        }), flush=True)

    b, n = make_vpu_leaf_case(32768, 12 * 4096)
    run("vpu_leaf_prod", b, n, lo=64, hi=512)

    b, n = make_vpu_dense_case(8192, 512)
    run("vpu_dense_8192x512", b, n)

    for K in (128, 512, 2048):
        b, n = make_mxu_case(8192, K, jnp.float32, "hi")
        run(f"mxu_f32hi_8192x{K}", b, n)
    b, n = make_mxu_case(8192, 512, jnp.bfloat16, "lo")
    run("mxu_bf16_8192x512", b, n)
    b, n = make_mxu_case(8192, 512, jnp.float32, "hi", epilogue=False)
    run("mxu_f32hi_mmonly_8192x512", b, n)
    b, n = make_mxu_case(8192, 512, jnp.bfloat16, "lo", epilogue=False)
    run("mxu_bf16_mmonly_8192x512", b, n)
    # realistic grouped shape: 32 groups x 256 rays, per-group gathered
    # tile (longer chains: the first run's lo=32/hi=256 slope went negative
    # on the fast bf16 case — per-iter time too small vs timer noise)
    b, n = make_mxu_case(8192, 512, jnp.bfloat16, "lo", groups=32)
    run("mxu_bf16_grouped32x256x512", b, n, lo=256, hi=1024)
    b, n = make_mxu_case(8192, 512, jnp.float32, "hi", groups=32)
    run("mxu_f32hi_grouped32x256x512", b, n, lo=128, hi=512)

    # implied Mrays/s at tests/ray budgets (intersection-only; today's
    # traversal pays ~24 leaf tests + ~12 box tests per ray)
    print("\nimplied Mrays/s (intersection cost only):", flush=True)
    for name, ns in results.items():
        line = {b: round(1e3 / (ns * b), 1) for b in (24, 100, 500)}
        print(f"  {name}: " + json.dumps({f"{b} tests/ray": v
                                          for b, v in line.items()}), flush=True)


if __name__ == "__main__":
    main()
