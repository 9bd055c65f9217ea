"""Subtractive decomposition of the traversal step's VPU band — round 5
item #2 (VERDICT r4: "the 78 ns/ray VPU traversal balance has never been
profiled into its parts").

Method: a FIXED-TRIP free-running replica of the production step body
(bvh/wide._traverse_flat_rows, same helper functions, the real flagship
table) timed by the honest slope protocol (iters hi-lo — dispatch RTT and
poisoning cancel). Ablations remove one band at a time; full-step minus
ablated = that band's per-pop cost. Fixed trips mean ablations cannot
perturb trip counts (the flaw of in-frame ablation), and the free-run
re-seeds exhausted lanes with pseudorandom entries so gather patterns stay
realistic-ish. Credibility cross-check: the full step must reproduce the
in-frame ~4.2 ns/pop (1.66 gather + ~2.5 VPU, PERF.md round 4c).

Bands ablated:
  nogather — row = broadcast(table[0]) instead of the per-lane gather
  nomt     — leaf Moller-Trumbore + best-hit bookkeeping skipped
  noslab   — child AABB slab tests skipped (children "all hit", t = id order)
  nosort   — bitonic child sort skipped (push in natural order)
  nostack  — shift-stack pop/push replaced by a 1-deep register (no shifts)
  nodecode — _decode_ids bias-subtract bitcasts skipped (raw bits as ids,
             masked to valid range)

Run detached on TPU:
  nohup python scripts/ablate_step.py > /tmp/ablate_step.log 2>&1 &
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


def build_flagship_flat():
    import bench

    r = bench.build_renderer(512, 512)
    sd = r.scene_data
    idx = np.asarray(sd.indices)
    pos = np.asarray(sd.positions_obj)
    xf = np.asarray(sd.instance_transform)
    vin = np.asarray(sd.vertex_instance)
    m = xf[vin]
    pw = np.einsum("vij,vj->vi", m[:, :3, :3], pos) + m[:, :3, 3]
    from mrt_tpu.bvh import wide

    bvh = wide.build(pw[idx[:, 0]], pw[idx[:, 1]], pw[idx[:, 2]], method="sah")
    cam = r.current_camera()
    return bvh, cam


def make_rays(cam, n):
    px = (np.arange(n) % 512 + 0.5) / 512 * 2 - 1
    py = (np.arange(n) // 512 % 512 + 0.5) / 512 * 2 - 1
    d = (px[:, None] * np.asarray(cam.right) + py[:, None] * np.asarray(cam.up)
         + np.asarray(cam.forward)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cam.position), (n, 3)).astype(np.float32)
    return o, d


def make_stepper(bvh, o, d, ablate, iters, chunk=2048):
    """One jitted program: `iters` fixed trips of the replicated step body
    over lanes processed as production-style chunks via lax.map."""
    from mrt_tpu.bvh.wide import (
        ARITY, IDS_OFF, LEAF_K, META_OFF, _aabb_children, _decode_ids,
        _mt_leaf, _sorted_candidates, _stack_alloc, _stack_pop,
        _stack_push_sorted,
    )

    table_base = bvh.table
    n_i = bvh.n_internal
    n_rows = bvh.n_rows
    S = _stack_alloc(bvh.stack_bound, bvh.depth)
    t_min = jnp.float32(1e-4)

    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    # production table_patch trick (engine/renderer._trace_tile_program):
    # write a parameter-carried patch into the table IN-PROGRAM so the
    # traversal consumes an intermediate that MSA may pin in VMEM — a
    # plain program parameter only reaches VMEM via evictable prefetch
    patch = jnp.asarray(np.asarray(table_base[:8]))

    def chunk_fn(args, tbl):
        co, cd = args  # (chunk, 3)
        ox, oy, oz = co[:, 0:1], co[:, 1:2], co[:, 2:3]
        inv = 1.0 / jnp.where(jnp.abs(cd) < 1e-12,
                              jnp.where(cd < 0, -1e-12, 1e-12), cd)
        ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]
        dx, dy, dz = cd[:, 0:1], cd[:, 1:2], cd[:, 2:3]
        n = co.shape[0]

        state = dict(
            stack=jnp.zeros((n, S), jnp.int32),
            sp=jnp.ones((n,), jnp.int32),
            best_t=jnp.full((n,), jnp.inf, jnp.float32),
            best_tri=jnp.full((n,), -1, jnp.int32),
            best_u=jnp.zeros((n,), jnp.float32),
            best_v=jnp.zeros((n,), jnp.float32),
            found=jnp.zeros((n,), bool),
            top_reg=jnp.zeros((n,), jnp.int32),
        )

        def body(it, st):
            sp = st["sp"]
            active = sp > 0
            if "nostack" in ablate:
                top = st["top_reg"]
                stack = st["stack"]
            else:
                top, stack = _stack_pop(st["stack"], active)
            # FREE-RUN: exhausted lanes restart at a pseudorandom entry so
            # every trip does full work on realistic row ids
            reseed = (it * jnp.int32(-1640531527)  # 2654435761 as i32
                      + jnp.arange(chunk, dtype=jnp.int32) * 40503)
            reseed = jnp.abs(reseed) % n_rows
            entry = jnp.where(active, top, reseed)
            sp = jnp.where(active, sp - 1, jnp.int32(1))

            if "nogather" in ablate:
                row = jnp.broadcast_to(tbl[0], (n, tbl.shape[1]))
            else:
                row = jnp.take(tbl, entry, axis=0)
            is_leaf = entry >= n_i
            t_cap = st["best_t"]

            if "nomt" not in ablate:
                l_hit, l_t, l_u, l_v = _mt_leaf(row, ox, oy, oz, dx, dy, dz,
                                                t_min, t_cap[:, None])
                lane_leaf = active & is_leaf
                l_t_m = jnp.where(l_hit, l_t, jnp.inf)
                jbest = jnp.argmin(l_t_m, axis=1)
                oh4 = jnp.arange(LEAF_K, dtype=jnp.int32)[None, :] == jbest[:, None]
                cand_t = jnp.sum(jnp.where(oh4, l_t_m, 0.0), axis=1)
                cand_any = jnp.any(l_hit, axis=1)
                if "nodecode" in ablate:
                    ids4 = jax.lax.bitcast_convert_type(
                        row[:, IDS_OFF : IDS_OFF + LEAF_K], jnp.int32)
                else:
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

            if "nodecode" in ablate:
                meta_raw = jax.lax.bitcast_convert_type(
                    row[:, META_OFF : META_OFF + ARITY], jnp.int32)
                meta = jnp.abs(meta_raw) % n_rows
            else:
                meta = _decode_ids(row[:, META_OFF : META_OFF + ARITY])
            if "noslab" in ablate:
                a_hit = meta >= 0
                a_t = jnp.broadcast_to(
                    jnp.arange(ARITY, dtype=jnp.float32)[None, :], (n, ARITY))
            else:
                a_hit, a_t = _aabb_children(row, ox, oy, oz, ix, iy, iz,
                                            t_cap[:, None])
            t8 = jnp.where(a_hit & (meta >= 0), a_t, jnp.inf)
            if "nosort" in ablate:
                cands = jnp.where(jnp.isfinite(t8), meta, 0)
                valid = jnp.isfinite(t8)
            else:
                cands, valid = _sorted_candidates(t8, meta, n_rows)

            lane_int = active & ~is_leaf
            n_push = jnp.where(lane_int,
                               jnp.sum(valid.astype(jnp.int32), axis=1), 0)
            if "nostack" in ablate:
                st["top_reg"] = cands[:, 0]
                sp = jnp.minimum(sp + jnp.minimum(n_push, 1), 2)
            else:
                stack = _stack_push_sorted(stack, cands, n_push)
                sp = jnp.minimum(sp + n_push, S)
                st["stack"] = stack
            st["sp"] = sp
            return st

        st = jax.lax.fori_loop(0, iters, body, state)
        # sink EVERY state leaf so no band is dead-code-eliminated
        return (jnp.minimum(st["best_t"], 1e30) + st["sp"].astype(jnp.float32)
                + st["best_u"] + st["best_v"]
                + st["best_tri"].astype(jnp.float32)
                + st["found"].astype(jnp.float32)
                + st["top_reg"].astype(jnp.float32)
                + st["stack"][:, 0].astype(jnp.float32))

    def run(p):
        tbl = table_base.at[: p.shape[0]].set(p)
        out = jax.lax.map(lambda a: chunk_fn(a, tbl),
                          (oj.reshape(-1, chunk, 3),
                           dj.reshape(-1, chunk, 3)))
        return out.sum()

    jf = jax.jit(run)
    return lambda: jf(patch)


def slope(bvh, o, d, ablate, lo=64, hi=256):
    f_lo = make_stepper(bvh, o, d, ablate, lo)
    f_hi = make_stepper(bvh, o, d, ablate, hi)
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        return best

    n_lanes = o.shape[0]
    per_step = (t(f_hi) - t(f_lo)) / (hi - lo)
    return per_step / n_lanes * 1e9  # ns per lane-pop


def main():
    # poison first (PERF.md 3a)
    jnp.zeros((4,)).sum().item()
    print(f"devices: {jax.devices()}", flush=True)
    bvh, cam = build_flagship_flat()
    print(f"flagship flat BVH: rows={bvh.n_rows} depth={bvh.depth}", flush=True)
    o, d = make_rays(cam, 65536)

    cases = ["full", "nogather", "nomt", "noslab", "nosort", "nostack",
             "nodecode", "nomt+noslab+nosort+nostack"]
    res = {}
    for c in cases:
        ns = slope(bvh, o, d, c if c != "full" else "")
        res[c] = ns
        delta = res["full"] - ns if c != "full" else 0.0
        print(json.dumps({"case": c, "ns_per_pop": round(ns, 3),
                          "band_ns": round(delta, 3)}), flush=True)
    print(json.dumps({"summary": {k: round(v, 3) for k, v in res.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
