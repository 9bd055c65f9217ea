"""Gather microbenchmark: per-row cost vs row width, table size, and dtype.

Round-1 established the traversal is gather-bound at ~10 ns/row for rows of
1..128 f32 (docs/PERF.md). This measures whether FAT rows (256..2048 floats)
stay near per-row cost — if so, the BVH should pack far more tree per gather
(bigger arity + bigger leaves => fewer rows/ray) and large scenes stay under
the >32k-row cliff. Emits one JSON line per config.

Run detached (CLAUDE.md: never kill mid-TPU work):
    nohup python scripts/microbench_gather.py > /tmp/microbench.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 65536  # lanes per gather (keep while-body lanes <= 64k)
ITERS = 30


def bench_gather(rows, width, dtype, reps=3, sorted_idx=False):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows, width), jnp.float32).astype(dtype)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows, jnp.int32)
    if sorted_idx:
        idx0 = jnp.sort(idx0)

    @jax.jit
    def run(table, idx0):
        # table as an ARGUMENT (a closure capture becomes a baked-in program
        # constant and blows the remote-compile request size for big tables)
        def step(i, carry):
            idx, acc = carry
            row = jnp.take(table, idx, axis=0)
            acc = acc + row[:, 0].astype(jnp.float32)
            # dependent next index (same dependency structure as traversal)
            nxt = (idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
            if sorted_idx:
                nxt = jnp.sort(nxt)
            return jnp.abs(nxt), acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((N,), jnp.float32)))
        return acc.sum()

    run(table, idx0).block_until_ready()  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run(table, idx0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ns_per_row = best / (ITERS * N) * 1e9
    bytes_per_row = width * jnp.dtype(dtype).itemsize
    return dict(
        rows=rows, width=width, dtype=str(jnp.dtype(dtype).name),
        sorted=sorted_idx, ns_per_row=round(ns_per_row, 2),
        eff_gbps=round(bytes_per_row / ns_per_row, 2),
        mrows_s=round(1e3 / ns_per_row, 1),
    )


def bench_sort(n, payload_cols, reps=3):
    key = jax.random.PRNGKey(0)
    keys0 = jax.random.randint(key, (n,), 0, 1 << 24, jnp.int32)
    payload = jax.random.normal(key, (n, payload_cols), jnp.float32)

    @jax.jit
    def run(keys0):
        def step(i, carry):
            k, s = carry
            perm = jnp.argsort(k)
            p = jnp.take(payload, perm, axis=0)
            s = s + p[:, 0].sum()
            k = (k * 1103515245 + 12345) % (1 << 24)
            return k, s

        k, s = jax.lax.fori_loop(0, 10, step, (keys0, jnp.zeros((), jnp.float32)))
        return s

    run(keys0).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run(keys0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return dict(kind="argsort+take", n=n, payload_cols=payload_cols,
                ns_per_lane=round(best / (10 * n) * 1e9, 2))


def main():
    import sys

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    if "--round2" in sys.argv:
        # configs the first round didn't reach (it died on a baked-constant
        # compile-size limit, since fixed)
        for w in (128, 256, 512):
            print(json.dumps(bench_gather(16384, w, jnp.bfloat16)), flush=True)
        for rows in (131072, 262144):
            for w in (128, 512):
                print(json.dumps(bench_gather(rows, w, jnp.float32)), flush=True)
        print(json.dumps(bench_gather(16384, 128, jnp.float32, sorted_idx=True)), flush=True)
        print(json.dumps(bench_sort(65536, 8)), flush=True)
        print(json.dumps(bench_sort(131072, 8)), flush=True)
        print(json.dumps({"done": True}), flush=True)
        return

    # 1) width sweep at fixed 16k-row table, f32
    for w in (8, 64, 128, 256, 512, 1024, 2048):
        print(json.dumps(bench_gather(16384, w, jnp.float32)), flush=True)

    # 2) table-size sweep at width 512 f32 (the fat-row candidate)
    for rows in (4096, 16384, 32768, 65536, 131072):
        print(json.dumps(bench_gather(rows, 512, jnp.float32)), flush=True)

    # 3) dtype: bf16 rows (same lane counts as f32 but half the bytes)
    for w in (256, 512, 1024, 2048):
        print(json.dumps(bench_gather(16384, w, jnp.bfloat16)), flush=True)

    # 4) sorted indices at width 512 (does locality help?)
    print(json.dumps(bench_gather(16384, 512, jnp.float32, sorted_idx=True)), flush=True)

    # 5) table-size sweep at width 1024 f32 (4 KB rows)
    for rows in (4096, 16384, 65536):
        print(json.dumps(bench_gather(rows, 1024, jnp.float32)), flush=True)

    # 6) sort pricing (for sort-based alternatives)
    print(json.dumps(bench_sort(65536, 8)), flush=True)
    print(json.dumps(bench_sort(131072, 8)), flush=True)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
