"""Cell-stage pipeline microbench — round 5 follow-up to 5b (PERF.md).

5b measured dense shared-tile intersection at 0.017 ns/test, 12x cheaper
than the production gather-per-pop leaf stage. The open question before
committing to a cell-sorted backend prototype: what does the FULL stage
cost per ray once the marshaling is included —

  expand rays to (ray, cell) pairs (static M slots per ray)
  -> counting band-partition of pairs by cell id (bvh/wide._band_partition)
  -> permute pair-rays into cell-contiguous order (one wide-row gather)
  -> per-256-pair chunk: gather the chunk's cell tile, dense-test
     [256,8] @ [8,6K] bf16 Woop matmul + epilogue + per-pair packed min
     (pairs whose cell != the chunk majority cell are masked: boundary
     waste is PAID, as it would be in production)
  -> unsort pair results (counting inverse), per-ray min over M slots

Reported: ns per RAY for the whole stage at (cells/ray, tris/cell) grids,
plus the boundary-waste fraction. Compare against the production leaf+tree
cost it would replace (~22 paid pops x 4.2 ns = ~92 ns/ray at flagship).

Cell assignment is synthetic but spatially coherent (consecutive rays
share cells), matching what the worksort already achieves for real rays.

Run detached on TPU:
  nohup python scripts/microbench_cellstage.py > /tmp/cellstage.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mrt_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from microbench_mxu_isect import mxu_epilogue, random_tris, woop_weights  # noqa: E402

P = 65536          # rays per stage call (one production tile)
CHUNK = 256        # pairs per dense chunk (matmul M dim)


def make_stage(n_cells, tris_per_cell, m_slots, coherence=64, seed=0,
               ablate="", scan_block=0, vmem_pool=False):
    """Build one jitted stage; returns (fn(iters), pairs_per_call).

    ablate: "noepi" (sum the matmul, no epilogue/min), "nopart" (skip the
    partition: pairs processed in ray order — WRONG results, measures the
    partition band), "nodense" (skip matmul+epilogue entirely).
    scan_block: process the dense phase in lax.map blocks of this many
    chunks so the [*,CHUNK,6K] f32 intermediate stays small enough to keep
    the epilogue fused (0 = all chunks in one batched dot)."""
    from mrt_tpu.bvh.wide import _band_partition

    K = tris_per_cell
    rng = np.random.default_rng(seed)
    v0, v1, v2 = random_tris(n_cells * K, key=3)
    tiles = np.stack([
        woop_weights(v0[i * K:(i + 1) * K], v1[i * K:(i + 1) * K],
                     v2[i * K:(i + 1) * K]) for i in range(n_cells)
    ])  # (C, 8, 6K)
    tiles_j = jnp.asarray(tiles, jnp.bfloat16)

    # coherent synthetic assignment: blocks of `coherence` consecutive rays
    # draw their M cells from a small local window of cells
    base = rng.integers(0, n_cells, P // coherence)
    cells = np.empty((P, m_slots), np.int32)
    for m in range(m_slots):
        jitter = rng.integers(0, 3, P // coherence)
        cells[:, m] = np.repeat((base + m + jitter) % n_cells, coherence)
    # ~15% of slots empty (rays with fewer candidates): cell id -1
    cells[rng.random((P, m_slots)) < 0.15] = -1
    cells_j = jnp.asarray(cells)

    o = rng.uniform(-4, 4, (P, 3)).astype(np.float32)
    d = rng.normal(0, 1, (P, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    X = np.concatenate([o, np.ones((P, 1), np.float32), d,
                        np.zeros((P, 1), np.float32)], 1)  # (P, 8)
    X_j = jnp.asarray(X)

    n_pairs = P * m_slots
    G = n_pairs // CHUNK

    def stage(rays8, cell_ids, salt, patch=None):
        if patch is not None:
            # production table-patch trick: make the gathered pool source an
            # in-program INTERMEDIATE so MSA can place it in VMEM — the
            # unpatched variant's permute gathers run at the ~8.7 ns/row HBM
            # rate and are the 33 ns/ray marshaling floor (cellstage v2)
            rays8 = rays8.at[: patch.shape[0]].set(patch)
        # salt makes each chain iteration's input differ (dependency)
        pair_cell = (cell_ids + salt).reshape(n_pairs) % n_cells
        pair_cell = jnp.where(cell_ids.reshape(n_pairs) < 0,
                              jnp.int32(n_cells), pair_cell)
        # --- partition pairs by cell (counting; empty slots band last);
        # counting one-hot caps at 256 bands — larger cell counts (dragon
        # class) fall back to two argsorts, cost PAID honestly ---
        if "nopart" in ablate:
            perm = jnp.arange(n_pairs, dtype=jnp.int32)
            inv = perm
        elif n_cells < 256:
            perm, inv = _band_partition(pair_cell, n_bands=256)
        else:
            perm = jnp.argsort(pair_cell, stable=True)
            inv = jnp.argsort(perm)
        pair_ray = perm // m_slots                      # src ray of each slot
        pool = jnp.take(rays8, pair_ray, axis=0)        # (n_pairs, 8) gather
        cell_sorted = jnp.take(pair_cell, perm)
        # --- dense test per chunk, chunk tile = majority (first) cell ----
        pool_c = pool.reshape(G, CHUNK, 8).astype(jnp.bfloat16)
        cells_c = cell_sorted.reshape(G, CHUNK)
        lead = cells_c[:, 0]

        def dense(args):
            pc, ld, cc = args  # (g, CHUNK, 8), (g,), (g, CHUNK)
            tile = jnp.take(tiles_j, jnp.minimum(ld, n_cells - 1), axis=0)
            if "nodense" in ablate:
                return (tile.sum(axis=(1, 2)).astype(jnp.int32)[:, None]
                        + jnp.zeros((1, CHUNK), jnp.int32))
            out = jax.lax.dot_general(
                pc, tile, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (g, CHUNK, 6K)
            if "noepi" in ablate:
                return out.sum(axis=2).astype(jnp.int32)
            return mxu_epilogue(out, K)                  # (g, CHUNK) packed

        if scan_block:
            best = jax.lax.map(
                dense, (pool_c.reshape(-1, scan_block, CHUNK, 8),
                        lead.reshape(-1, scan_block),
                        cells_c.reshape(-1, scan_block, CHUNK)),
            ).reshape(G, CHUNK)
        else:
            best = dense((pool_c, lead, cells_c))
        # pairs not matching the chunk's tile (cell boundary) are waste:
        # their tests are PAID but the result is discarded
        match = cells_c == lead[:, None]
        best = jnp.where(match & (cells_c < n_cells), best,
                         jnp.int32((1 << 31) - 1))
        # --- unsort + per-ray min over slots -----------------------------
        back = jnp.take(best.reshape(n_pairs), inv)      # src order
        per_ray = jnp.min(back.reshape(P, m_slots), axis=1)
        waste = jnp.sum((~match).astype(jnp.int32))
        return per_ray, waste

    def body(iters):
        # the patch must be a PARAMETER (as in production) — a captured
        # constant would const-fold and the pool would stay a constant in
        # HBM instead of becoming an MSA-placeable intermediate
        def run(p):
            def it(i, carry):
                acc, _ = carry
                per_ray, waste = stage(X_j, cells_j, i + (acc & 1),
                                       patch=p)
                return (acc + jnp.min(per_ray), waste)

            acc, waste = jax.lax.fori_loop(
                0, iters, it, (jnp.int32(0), jnp.int32(0)))
            return acc + waste

        jf = jax.jit(run)
        pv = X_j[:8] if vmem_pool else None
        return lambda: jf(pv)

    return body, n_pairs


def slope(body, lo=16, hi=64):
    f_lo, f_hi = body(lo), body(hi)
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())

    def t(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f_hi) - t(f_lo)) / (hi - lo)


def main():
    jnp.zeros((4,)).sum().item()  # poison
    print(f"devices: {jax.devices()}", flush=True)
    # (n_cells, tris/cell, M slots): flagship 95k tris -> 190 cells of 512,
    # 390 of 256; dragon-class -> 2600 cells of 512
    grid = [
        # v3: VMEM-patched pool (the 33 ns/ray marshaling floor was two
        # permute gathers at the HBM rate — production would patch)
        (192, 512, 2, "", 16, True),
        (192, 512, 2, "nodense", 0, True),
        (192, 512, 4, "", 16, True),
        (192, 512, 2, "", 16, False),   # v2 best, re-run for comparison
        (2600, 512, 4, "", 16, True),   # dragon-class (argsort partition)
    ]
    for n_cells, K, M, abl, blk, vp in grid:
        body, n_pairs = make_stage(n_cells, K, M, ablate=abl, scan_block=blk,
                                   vmem_pool=vp)
        per_iter = slope(body)
        ns_ray = per_iter / P * 1e9
        ns_test = per_iter / (n_pairs * K) * 1e9
        print(json.dumps({
            "cells": n_cells, "tris_per_cell": K, "slots": M,
            "ablate": abl, "scan_block": blk, "vmem_pool": vp,
            "ns_per_ray": round(ns_ray, 2),
            "ns_per_test": round(ns_test, 5),
            "tests_per_ray": M * K,
        }), flush=True)


if __name__ == "__main__":
    main()
