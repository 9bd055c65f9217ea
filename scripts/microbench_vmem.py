"""Verify the small-table gather cliff with FULL-ROW consumption.

microbench_onehot.py showed gathers from <=4096-row tables running ~1000x
faster than 16k-row tables — but its accumulator only consumed 2 of 128
columns, so XLA may have narrowed the gather. This consumes every column
(sum over the row) and sweeps table size finely to locate the threshold
(hypothesis: XLA places small operands in VMEM; threshold in bytes).

Run detached: nohup python scripts/microbench_vmem.py > /tmp/vmem.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LANES = 65536
ITERS = 30


def bench(rows, width, n_lanes=N_LANES, chunked=0):
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, width), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (n_lanes,), 0, rows, jnp.int32)

    def chain(table, idx0, n):
        def step(i, carry):
            idx, acc = carry
            row = jnp.take(table, idx, axis=0)
            acc = acc + row.sum(axis=1)  # consume EVERY column
            nxt = jnp.abs(idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
            return nxt, acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((n,), jnp.float32)))
        return acc.sum()

    if chunked:
        @jax.jit
        def run(table, idx0):
            # lax.map over chunks — the traversal's actual execution shape
            out = jax.lax.map(
                lambda ix: chain(table, ix, chunked),
                idx0.reshape(-1, chunked),
            )
            return out.sum()
    else:
        @jax.jit
        def run(table, idx0):
            return chain(table, idx0, n_lanes)

    run(table, idx0).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        run(table, idx0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ns = best / (ITERS * n_lanes) * 1e9
    return dict(rows=rows, width=width, chunked=chunked,
                mb=round(rows * width * 4 / 1e6, 2),
                ns_per_row=round(ns, 3), mrows_s=round(1e3 / ns, 1))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    # size sweep at width 128 (full-row consumption)
    for rows in (1024, 2048, 4096, 6144, 8192, 12288, 16384, 24576):
        print(json.dumps(bench(rows, 128)), flush=True)

    # is the threshold in BYTES? same byte sizes, different shapes
    for rows, width in ((4096, 256), (8192, 64), (16384, 64), (32768, 64), (2048, 512)):
        print(json.dumps(bench(rows, width)), flush=True)

    # chunked execution (lax.map over 4096-lane chunks) — the traversal shape
    for rows in (4096, 8192, 16384):
        print(json.dumps(bench(rows, 128, chunked=4096)), flush=True)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
