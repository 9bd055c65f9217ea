"""Round-3 poison-trigger probe harness (consolidates bisect_history*).

Each case runs in a FRESH subprocess:
  1. jit + time a fixed standalone traversal ("fresh")   -> clean baseline
  2. run the case (compile-only or compile+execute)
  3. re-time the same traversal ("after_case")           -> poisoned?

A case POISONS if after_case is ~300x fresh (~35 ms vs ~100 us).

Hypothesis under test (round 2j continuation): every poisoning minimal
case so far (halton, cammath, camrays, trace_tile) contains an
i32->f32 convert_element_type; every clean case (history27/28 op
sweeps) is dtype-pure. Secondary: (3,) closure constants (history30,
never ran). Tertiary: compile/load vs execute (history26 halton_c
poisoned COMPILE-ONLY).

Also includes the latency-vs-multiplier discriminator (`bigsmall`):
times the traversal at N=32k and N=1M fresh, poisons via a known
Trigger-A readback, re-times both. Fixed-latency poison => both ~35 ms;
multiplier poison => 1M case ~30x the 32k case.

Usage:
  nohup python scripts/poison_probe.py [case ...] > /tmp/probe.log 2>&1 &
With no args runs the default round-3 matrix.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

case = sys.argv[1]
f32, i32 = jnp.float32, jnp.int32

n_tris = 100_000
rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
e = 0.6 / np.sqrt(n_tris)
v1 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
v2 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
bvh = wide.build(c, v1, v2)


def make_traversal(N):
    rg = np.random.default_rng(1)
    o = rg.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
    d = rg.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro, rd = jnp.asarray(o), jnp.asarray(d)
    rm = jnp.full((N,), np.inf, jnp.float32)
    mask = jnp.ones((N,), bool)

    chunks = max(N // 2048, 1)  # keep while bodies at 2048 lanes (compile time)

    def f(table, patch, ro, rd, rm, msk):
        b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child,
                         bvh.leaf_tri, bvh.n_internal, bvh.depth)
        return wide._traverse(b, T.Rays(ro, rd, rm), 1e-4, False, msk,
                              chunks=chunks, sort_rays=True, profile=False,
                              unroll=2)

    return jax.jit(f), (bvh.table, bvh.table[:8], ro, rd, rm, mask), N


fn32k = make_traversal(32768)


def timeit(label, probe=fn32k):
    fn, args, N = probe
    st = fn(*args); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps(dict(case=case, phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)


timeit("fresh")

P = 16384
x_i32 = jnp.asarray(np.arange(P) % 128, i32)          # uploaded, no eager ops
y_i32 = jnp.asarray(np.arange(P) // 128, i32)
x_f32 = jnp.asarray((np.arange(P) % 128).astype(np.float32))
y_f32 = jnp.asarray((np.arange(P) // 128).astype(np.float32))


def run_case(g, args, execute=True):
    comp = g.lower(*args).compile()
    print(json.dumps(dict(case=case, phase="compiled",
                          code=len(comp.as_text()))), flush=True)
    if execute:
        jax.block_until_ready(comp(*args))


# --- convert_element_type hypothesis ---------------------------------
if case == "conv_i2f":
    run_case(jax.jit(lambda a: (a.astype(f32) + 0.5).sum()), (x_i32,))
elif case == "conv_i2f_c":        # compile-only: does LOAD poison?
    run_case(jax.jit(lambda a: (a.astype(f32) + 0.5).sum()), (x_i32,),
             execute=False)
elif case == "conv_f2i":
    run_case(jax.jit(lambda a: (a * 2.0).astype(i32).sum()), (x_f32,))
elif case == "conv_b2f":          # bool->f32 (one-hot style)
    run_case(jax.jit(lambda a: ((a > 63).astype(f32) + 0.5).sum()), (x_i32,))
elif case == "conv_i2f_nored":    # no scalar reduce: array output
    run_case(jax.jit(lambda a: a.astype(f32) + 0.5), (x_i32,))
# --- closure-constant hypothesis (history30, never ran) --------------
elif case == "closure_dev3":
    cv = jnp.asarray([1.0, 0.0, 0.0])
    run_case(jax.jit(lambda a: (a[:, None] * cv).sum()), (x_f32,))
elif case == "arg3":
    cv = jnp.asarray([1.0, 0.0, 0.0])
    run_case(jax.jit(lambda a, c: (a[:, None] * c).sum()), (x_f32, cv))
# --- cammath ablations ------------------------------------------------
elif case in ("cammath_full", "cammath_noconv", "cammath_noconst",
              "cammath_nonorm"):
    camr = jnp.asarray([1.0, 0, 0]); camu = jnp.asarray([0, 1.0, 0])
    camf = jnp.asarray([0, 0, -1.0])

    def cm_full(px, py):
        u = (px.astype(f32) + 0.5) / 128 * 2 - 1
        v = (py.astype(f32) + 0.5) / 128 * 2 - 1
        rdir = u[:, None] * camr + v[:, None] * camu + camf
        rdir = rdir / jnp.linalg.norm(rdir, axis=1, keepdims=True)
        return (rdir * 0.5 + 0.5).sum()

    def cm_noconv(px, py):           # f32 inputs: no convert anywhere
        u = (px + 0.5) / 128 * 2 - 1
        v = (py + 0.5) / 128 * 2 - 1
        rdir = u[:, None] * camr + v[:, None] * camu + camf
        rdir = rdir / jnp.linalg.norm(rdir, axis=1, keepdims=True)
        return (rdir * 0.5 + 0.5).sum()

    def cm_noconst(px, py):          # converts, but no (3,) constants
        u = (px.astype(f32) + 0.5) / 128 * 2 - 1
        v = (py.astype(f32) + 0.5) / 128 * 2 - 1
        w = jnp.sqrt(u * u + v * v + 1.0)
        return ((u / w) * 0.5 + 0.5).sum()

    def cm_nonorm(px, py):           # converts + consts, no norm
        u = (px.astype(f32) + 0.5) / 128 * 2 - 1
        v = (py.astype(f32) + 0.5) / 128 * 2 - 1
        rdir = u[:, None] * camr + v[:, None] * camu + camf
        return (rdir * 0.5 + 0.5).sum()

    fns = dict(cammath_full=(cm_full, (x_i32, y_i32)),
               cammath_noconv=(cm_noconv, (x_f32, y_f32)),
               cammath_noconst=(cm_noconst, (x_i32, y_i32)),
               cammath_nonorm=(cm_nonorm, (x_i32, y_i32)))
    g, a = fns[case]
    run_case(jax.jit(g), a)
# --- latency vs multiplier -------------------------------------------
elif case == "bigsmall":
    fn1m = make_traversal(1 << 20)
    timeit("fresh_1m", fn1m)
    np.asarray(jnp.zeros((3,), f32))   # Trigger A: known reliable poison
    timeit("poisoned_32k")
    timeit("poisoned_1m", fn1m)
# --- cassette-speculator cache hypothesis -----------------------------
# If the axon frontend caches/speculates repeated identical dispatches
# (cassette/speculator.rs strings in libaxon_pjrt.so), a timing loop
# re-dispatching the SAME (executable, args) measures the cache, not the
# device. Discriminator: vary one ray origin per call in the FRESH state.
elif case == "argvary":
    fn, a, N = fn32k
    import time as _t
    variants = []
    for k in range(6):
        o2 = a[2].at[0, 0].set(0.001 * k)
        variants.append((a[0], a[1], o2) + a[3:])
    jax.block_until_ready(fn(*variants[0]))
    for rep in range(2):
        for k, va in enumerate(variants):
            t0 = _t.perf_counter(); st = fn(*va); jax.block_until_ready(st)
            dt = _t.perf_counter() - t0
            print(json.dumps(dict(case=case, phase=f"vary_r{rep}_{k}",
                                  us=round(dt * 1e6, 1),
                                  mrays_s=round(N / dt / 1e6, 1))), flush=True)
    timeit("same_args_after")
else:
    raise SystemExit(f"unknown case {case}")

timeit("after_case")
"""

DEFAULT = [
    "conv_i2f", "conv_i2f_c", "conv_f2i", "conv_b2f", "conv_i2f_nored",
    "closure_dev3", "arg3",
    "cammath_full", "cammath_noconv", "cammath_noconst", "cammath_nonorm",
    "bigsmall", "argvary",
]


def main():
    cases = sys.argv[1:] or DEFAULT
    for case in cases:
        p = subprocess.run(
            [sys.executable, "-c", CHILD.replace("@REPO@", REPO), case],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"case": case, "error": p.stderr[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
