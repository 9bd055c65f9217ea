"""Characterize XLA cross-program prefetch (CPP) of the BVH table.

Established so far: the FIRST traversal program in a process gathers from an
11 MB table parameter at ~0.05 ns/row (table pinned in VMEM by cross-program
prefetch); later programs in the same process run ~20-30 ns/row (the
microbench_tablesize.py "cliff" was program ORDER, not table size).

Questions answered here (each case in a fresh subprocess):
  big:      does a 46 / 89 MB table parameter still get the prefetch?
  inprog:   does modifying the table INSIDE the program (the in-jit refit
            pattern: table.at[rows].set(...) then traverse) keep the speed?
  second:   does program #2 lose the prefetch; does re-running program #1
            stay fast?
  chain:    two traversals of the SAME table inside one program (the
            closest+shadow pattern) — both fast?

Run detached: nohup python scripts/microbench_cpp.py > /tmp/cpp.log 2>&1 &
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, time, sys
sys.path.insert(0, REPO)
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

MODE = sys.argv[1]
N_TRIS = int(sys.argv[2])

rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (N_TRIS, 3)).astype(np.float32)
e = 0.6 / np.sqrt(N_TRIS)
v1 = c + rng.normal(size=(N_TRIS, 3)).astype(np.float32) * e
v2 = c + rng.normal(size=(N_TRIS, 3)).astype(np.float32) * e
bvh = wide.build(c, v1, v2)

N = 65536
rng = np.random.default_rng(1)
o = rng.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
d = rng.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro, rd = jnp.asarray(o), jnp.asarray(d)
rm = jnp.full((N,), np.inf, jnp.float32)
mask = jnp.ones((N,), bool)


def traverse(table, ro, rd, rm, msk):
    return wide._traverse(
        wide.WideBVH(table, bvh.node_child, bvh.leaf_tri, bvh.n_internal, bvh.depth),
        T.Rays(ro, rd, rm), 1e-4, False, msk, chunks=16, sort_rays=True,
        profile=True)


def timed(fn, *args):
    st = fn(*args); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    pops = int(np.sum(np.asarray(st["pops"])))
    return dict(ns_per_pop=round(best / pops * 1e9, 3),
                mrays_s=round(N / best / 1e6, 2))


if MODE.endswith("_incoh"):
    # bounce/shadow-class ray mix: random origins inside the cloud, random
    # unit directions — the production frame's mid-path distribution, vs the
    # near-collimated camera bundle above. Discriminates whether the frame's
    # ~25x slower per-row gather rate (round 2h xplane) is ray coherence.
    o = rng.uniform(0.1, 0.9, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro, rd = jnp.asarray(o), jnp.asarray(d)
    MODE = MODE[: -len("_incoh")]

out = dict(mode=MODE, n_tris=N_TRIS, rows=bvh.n_rows,
           mb=round(bvh.n_rows * wide.ROW * 4 / 1e6, 2))

if MODE == "plain":
    fn = jax.jit(traverse)
    out["r"] = timed(fn, bvh.table, ro, rd, rm, mask)
elif MODE == "inprog":
    # mimic the in-jit refit: rewrite a few rows, traverse the result
    def f(table, patch, ro, rd, rm, msk):
        table = table.at[:8].set(patch)
        return traverse(table, ro, rd, rm, msk)
    fn = jax.jit(f)
    patch = bvh.table[:8]
    out["r"] = timed(fn, bvh.table, patch, ro, rd, rm, mask)
elif MODE == "donated":
    # refit pattern with donation: donate the table argument
    def f(table, patch, ro, rd, rm, msk):
        table = table.at[:8].set(patch)
        return traverse(table, ro, rd, rm, msk), table
    fn = jax.jit(f, donate_argnums=(0,))
    patch = bvh.table[:8]
    table = bvh.table
    st, table = fn(table, patch, ro, rd, rm, mask)
    jax.block_until_ready(st)
    import time as _t
    best = 1e9
    for _ in range(3):
        t0 = _t.perf_counter(); st, table = fn(table, patch, ro, rd, rm, mask)
        jax.block_until_ready(st); best = min(best, _t.perf_counter() - t0)
    pops = int(np.sum(np.asarray(st["pops"])))
    out["r"] = dict(ns_per_pop=round(best / pops * 1e9, 3),
                    mrays_s=round(N / best / 1e6, 2))
elif MODE == "second":
    fn = jax.jit(traverse)
    out["first"] = timed(fn, bvh.table, ro, rd, rm, mask)
    # second DIFFERENT program (different ray count -> new executable)
    ro2, rd2, rm2, m2 = ro[:32768], rd[:32768], rm[:32768], mask[:32768]
    fn2 = jax.jit(traverse)
    out["second_prog"] = timed(fn2, bvh.table, ro2, rd2, rm2, m2)
    out["first_again"] = timed(fn, bvh.table, ro, rd, rm, mask)
elif MODE == "inprog_interleave":
    # per-execution VMEM placement of an in-program table intermediate:
    # does it survive OTHER programs running between frames?
    def f(table, patch, ro, rd, rm, msk):
        table = table.at[:8].set(patch)
        return traverse(table, ro, rd, rm, msk)
    fn = jax.jit(f)
    patch = bvh.table[:8]
    other = jax.jit(lambda a, b: a @ b)
    oa = jnp.ones((1024, 1024), jnp.float32)
    st = fn(bvh.table, patch, ro, rd, rm, mask); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        jax.block_until_ready(other(oa, oa))  # foreign program between frames
        t0 = time.perf_counter(); st = fn(bvh.table, patch, ro, rd, rm, mask)
        jax.block_until_ready(st); best = min(best, time.perf_counter() - t0)
    pops = int(np.sum(np.asarray(st["pops"])))
    out["r"] = dict(ns_per_pop=round(best / pops * 1e9, 3),
                    mrays_s=round(N / best / 1e6, 2))
elif MODE == "chain":
    def f(table, ro, rd, rm, msk):
        a = traverse(table, ro, rd, rm, msk)
        # second traversal of the same table, rays perturbed by the first
        rd2 = jnp.where((a["best_tri"] % 2 == 0)[:, None], rd, -rd)
        b = traverse(table, ro, rd2, rm, msk)
        return {k: a[k] + b[k] for k in ("pops", "iters")} | {
            "t": a["best_t"] + b["best_t"]}
    fn = jax.jit(f)
    out["r"] = timed(fn, bvh.table, ro, rd, rm, mask)

print(json.dumps(out), flush=True)
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cases = [
        ("plain", 400_000), ("plain", 800_000),
        ("inprog", 100_000), ("donated", 100_000),
        ("chain", 100_000), ("second", 100_000),
    ]
    if "--interleave" in sys.argv:
        cases = [("inprog_interleave", 100_000), ("inprog_interleave", 800_000)]
    if "--incoh" in sys.argv:
        cases = [("plain", 100_000), ("plain_incoh", 100_000),
                 ("inprog_incoh", 100_000), ("inprog_interleave_incoh", 100_000)]
    for mode, n in cases:
        code = CHILD.replace("REPO", repr(repo))
        try:
            # NO subprocess timeout: killing a child mid-TPU-work wedges the
            # axon grant for every process after (CLAUDE.md round-2h incident)
            p = subprocess.run([sys.executable, "-c", code, mode, str(n)],
                               capture_output=True, text=True)
            lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            print(lines[-1] if lines else json.dumps(
                {"mode": mode, "error": p.stderr[-200:]}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"mode": mode, "error": str(exc)[:200]}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
