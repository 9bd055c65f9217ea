"""Microbench: alternatives to the per-step XLA row gather for SMALL tables.

The traversal's cost is the per-step random row fetch (~18 ns/row dependent-
chain, docs/PERF.md round 2). Rows near the TOP of the tree live in a small
index range, which opens fetch strategies whose cost scales with TABLE size
instead of being flat-per-row:

  A) plain gather at small table sizes (does XLA get faster under 4k rows?)
  B) one-hot matmul fetch: onehot(idx) @ table on the MXU, bf16
     (round-1 measured this losing at 32k+ rows — the onehot build is
     O(R x N); at N<=2k the arithmetic is trivial)
  C) exactness variant: byte-plane table (f32 split into 4 exact-in-bf16
     byte planes, recombined with int ops) — the cost of NOT accepting
     bf16 rounding
  D) pinned gather: only a fraction f of lanes gather random rows, the rest
     gather row 0 (the masked-lane pattern) — is the cost ~f or flat?

Run detached: nohup python scripts/microbench_onehot.py > /tmp/onehot.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LANES = 65536
ITERS = 30


def _timed(fn, *args, reps=3):
    fn(*args).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_gather_small(rows, width=128, pinned_frac=1.0):
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, width), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_LANES,), 0, rows, jnp.int32)
    if pinned_frac < 1.0:
        live = jax.random.uniform(jax.random.PRNGKey(2), (N_LANES,)) < pinned_frac
        idx0 = jnp.where(live, idx0, 0)
    else:
        live = None

    @jax.jit
    def run(table, idx0):
        def step(i, carry):
            idx, acc = carry
            row = jnp.take(table, idx, axis=0)
            acc = acc + row[:, 0]
            nxt = jnp.abs(idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
            if live is not None:
                nxt = jnp.where(live, nxt, 0)
            return nxt, acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((N_LANES,), jnp.float32)))
        return acc.sum()

    best = _timed(run, table, idx0)
    ns = best / (ITERS * N_LANES) * 1e9
    return dict(kind="gather", rows=rows, width=width, pinned_frac=pinned_frac,
                ns_per_row=round(ns, 2), mrows_s=round(1e3 / ns, 1))


def bench_onehot(rows, width=128):
    """One-hot matmul row fetch, bf16 table (AABB-precision use case)."""
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, width), jnp.float32).astype(jnp.bfloat16)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_LANES,), 0, rows, jnp.int32)
    iota = jnp.arange(rows, dtype=jnp.int32)

    @jax.jit
    def run(table, idx0):
        def step(i, carry):
            idx, acc = carry
            oh = (idx[:, None] == iota[None, :]).astype(jnp.bfloat16)
            row = jax.lax.dot(oh, table, precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)
            acc = acc + row[:, 0]
            nxt = jnp.abs(idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
            return nxt, acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((N_LANES,), jnp.float32)))
        return acc.sum()

    best = _timed(run, table, idx0)
    ns = best / (ITERS * N_LANES) * 1e9
    return dict(kind="onehot_bf16", rows=rows, width=width,
                ns_per_row=round(ns, 2), mrows_s=round(1e3 / ns, 1))


def bench_onehot_bytes(rows, width=128):
    """Exact f32 fetch via 4 byte planes, each exactly representable in bf16:
    onehot @ (rows, 4*width) then int recombine + bitcast."""
    tbl_f32 = jax.random.normal(jax.random.PRNGKey(0), (rows, width), jnp.float32)
    bits = jax.lax.bitcast_convert_type(tbl_f32, jnp.uint32)
    planes = [((bits >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)]
    table = jnp.concatenate(planes, axis=1)  # (rows, 4*width) bf16, values 0..255
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_LANES,), 0, rows, jnp.int32)
    iota = jnp.arange(rows, dtype=jnp.int32)

    @jax.jit
    def run(table, idx0):
        def step(i, carry):
            idx, acc = carry
            oh = (idx[:, None] == iota[None, :]).astype(jnp.bfloat16)
            raw = jax.lax.dot(oh, table, preferred_element_type=jnp.float32)
            b = [raw[:, k * width:(k + 1) * width].astype(jnp.uint32) for k in range(4)]
            word = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
            row = jax.lax.bitcast_convert_type(word, jnp.float32)
            acc = acc + row[:, 0]
            nxt = jnp.abs(idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
            return nxt, acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((N_LANES,), jnp.float32)))
        return acc.sum()

    best = _timed(run, table, idx0)
    ns = best / (ITERS * N_LANES) * 1e9
    return dict(kind="onehot_bytes_exact", rows=rows, width=width,
                ns_per_row=round(ns, 2), mrows_s=round(1e3 / ns, 1))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    # A) small-table plain gather
    for rows in (157, 512, 1344, 4096):
        print(json.dumps(bench_gather_small(rows)), flush=True)

    # B) one-hot matmul fetch, bf16
    for rows in (157, 512, 1344, 2048, 4096, 8192):
        print(json.dumps(bench_onehot(rows)), flush=True)

    # C) exact byte-plane variant
    for rows in (1344, 4096):
        print(json.dumps(bench_onehot_bytes(rows)), flush=True)

    # D) pinned-fraction gather at realistic table size
    for f in (1.0, 0.3, 0.1, 0.03):
        print(json.dumps(bench_gather_small(16384, pinned_frac=f)), flush=True)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
