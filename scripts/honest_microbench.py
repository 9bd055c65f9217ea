"""Honest (speculation-proof) gather microbench — round 3.

Round 2j established that the axon frontend optimistically acks
dispatches in its fresh state ("cassette speculator"), so wall-clock
timing loops measure the frontend, not the device, until the process is
"poisoned" (speculator deactivated). Protocol here:

  1. POISON FIRST (one tiny D2H readback) — all later timings are honest
     device round trips.
  2. SLOPE TIMING: each case is a single jitted program with a dependent
     in-program gather chain of ITERS steps; we time it at ITERS=lo and
     ITERS=hi and report (t_hi - t_lo) / (hi - lo) — the fixed ~33 ms
     dispatch RTT cancels exactly.

Reports ns/row and GB/s per case. The question this answers (PERF.md
round 2i, re-posed honestly): is the traversal's row gather
BYTES-bound (narrow/quantized rows pay) or ROW-bound (width is free)?

Run detached: nohup python scripts/honest_microbench.py > /tmp/honest.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LANES = 32768
CHUNK = 2048  # production traversal chunk width


def make_chain(rows, width, dtype, iters, pattern="random", chunk=CHUNK):
    table = jax.random.normal(
        jax.random.PRNGKey(0), (rows, width), jnp.float32).astype(dtype)
    idx0 = jax.random.randint(
        jax.random.PRNGKey(1), (N_LANES,), 0, rows, jnp.int32)
    if pattern == "coherent":
        idx0 = jnp.tile(idx0[: N_LANES // chunk, None],
                        (1, chunk)).reshape(-1)

    def chain(tbl, ix):
        def step(i, carry):
            idx, acc = carry
            row = jnp.take(tbl, idx, axis=0)
            acc = acc + row.astype(jnp.float32).sum(axis=1)
            nxt = jnp.abs(idx * 1103515245 + 12345
                          + row[:, 1].astype(jnp.int32)) % rows
            return nxt, acc

        _, acc = jax.lax.fori_loop(
            0, iters, step, (ix, jnp.zeros((ix.shape[0],), jnp.float32)))
        return acc.sum()

    def body(tbl, ix):
        out = jax.lax.map(lambda i: chain(tbl, i), ix.reshape(-1, chunk))
        return out.sum()

    fn = jax.jit(body)
    return fn, (table, idx0)


def timed(fn, args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def run_case(name, rows, width, dtype_s, pattern="random", chunk=CHUNK,
             lo=64, hi=512):
    dtype = dict(f32=jnp.float32, bf16=jnp.bfloat16,
                 i8=jnp.int8)[dtype_s]
    f_lo, a = make_chain(rows, width, dtype, lo, pattern, chunk)
    f_hi, _ = make_chain(rows, width, dtype, hi, pattern, chunk)
    t_lo = timed(f_lo, a)
    t_hi = timed(f_hi, a)
    d_iters = hi - lo
    per_iter = (t_hi - t_lo) / d_iters          # seconds per chain step
    rows_per_iter = N_LANES
    ns_row = per_iter / rows_per_iter * 1e9
    bytes_row = width * jnp.dtype(dtype).itemsize
    gbs = bytes_row / max(ns_row, 1e-9)
    print(json.dumps(dict(
        case=name, rows=rows, width=width, dtype=dtype_s, pattern=pattern,
        chunk=chunk, t_lo_ms=round(t_lo * 1e3, 2), t_hi_ms=round(t_hi * 1e3, 2),
        ns_per_row=round(ns_row, 4), gb_s=round(gbs, 1))), flush=True)


def main():
    # ----- POISON FIRST: all timings below are honest ------------------
    np.asarray(jnp.zeros((3,), jnp.float32))
    print(json.dumps(dict(case="poisoned", note="D2H done")), flush=True)

    # sanity: known-honest scale check — poisoned trivial dispatch ~RTT
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter(); jax.block_until_ready(f(x))
    print(json.dumps(dict(case="rtt_probe",
                          ms=round((time.perf_counter() - t0) * 1e3, 2))),
          flush=True)

    R = 14710  # flagship table row count
    # width sweep at production table size / pattern
    for w in (8, 16, 32, 64, 128):
        run_case(f"w{w}", R, w, "f32")
    run_case("w128_bf16", R, 128, "bf16")
    run_case("w64_bf16", R, 64, "bf16")
    # table-size sweep at width 128 (VMEM vs HBM residency)
    for rows in (2048, 65536, 262144, 1 << 20):
        run_case(f"r{rows}", rows, 128, "f32")
    # coherence
    run_case("w128_coh", R, 128, "f32", pattern="coherent")
    # chunk shape: flat 32k lanes in one chain (no lax.map)
    run_case("w128_flat", R, 128, "f32", chunk=N_LANES)

    # ----- (P,3) vs (3,P) vs componentized (P,) elementwise chains ------
    # The shading stage computes on (P,3) color/vector arrays; if XLA maps
    # the minor dim (3) to the 128 vector lanes, every such op runs at
    # ~2% lane utilization and the whole shade band is layout-bound.
    P = 65536
    x3 = jax.random.normal(jax.random.PRNGKey(2), (P, 3), jnp.float32)
    x3t = x3.T
    xc = [x3[:, 0], x3[:, 1], x3[:, 2]]

    def chain_p3(v):
        def step(i, a):
            a = a * 1.0001 + 0.1
            a = a / (1.0 + jnp.abs(a))
            return a * v[0, 0] + a
        return jax.lax.fori_loop(0, 400, step, v).sum()

    def chain_comp(vs):
        def step(i, abc):
            out = []
            for a in abc:
                a = a * 1.0001 + 0.1
                a = a / (1.0 + jnp.abs(a))
                out.append(a * abc[0][0] + a)
            return tuple(out)
        r = jax.lax.fori_loop(0, 400, step, tuple(vs))
        return sum(x.sum() for x in r)

    for name, fn, args in (("vec3_rows", chain_p3, (x3,)),
                           ("vec3_T", chain_p3, (x3t,)),
                           ("vec3_comp", chain_comp, (xc,))):
        g = jax.jit(fn)
        jax.block_until_ready(g(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*args))
            best = min(best, time.perf_counter() - t0)
        ns_el = best / (400 * P * 3) * 1e9
        print(json.dumps(dict(case=name, ms=round(best * 1e3, 2),
                              ns_per_elem_step=round(ns_el, 4))), flush=True)


if __name__ == "__main__":
    main()
