"""Locate the small-table gather cliff with rewrite-proof consumption.

microbench_vmem.py was invalidated: XLA rewrites gather(table).sum(1) into
gather(precomputed_row_sums) — the table collapses to a vector and every
size looks fast. Here each gathered row is consumed by a PER-LANE dot
product (row · lane_vec), the same structure as the traversal's slab test —
table-side precomputation is impossible, so the full row must move.

Signal sought: gather cost vs table BYTES (hypothesis: XLA places small
operands in VMEM; cliff somewhere in 2-8 MB).

Run detached: nohup python scripts/microbench_vmem2.py > /tmp/vmem2.log 2>&1 &
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
    lane_vec = jax.random.normal(jax.random.PRNGKey(3), (n_lanes, width), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (n_lanes,), 0, rows, jnp.int32)

    def chain(table, lv, idx0, n):
        def step(i, carry):
            idx, acc = carry
            row = jnp.take(table, idx, axis=0)
            val = (row * lv).sum(axis=1)  # per-lane dot: full row must move
            acc = acc + val
            nxt = jnp.abs(idx * 1103515245 + 12345 + val.astype(jnp.int32)) % rows
            return nxt, acc

        idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((n,), jnp.float32)))
        return acc.sum()

    if chunked:
        @jax.jit
        def run(table, lane_vec, idx0):
            out = jax.lax.map(
                lambda a: chain(table, a[0], a[1], chunked),
                (lane_vec.reshape(-1, chunked, width), idx0.reshape(-1, chunked)),
            )
            return out.sum()
    else:
        @jax.jit
        def run(table, lane_vec, idx0):
            return chain(table, lane_vec, idx0, n_lanes)

    run(table, lane_vec, idx0).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        run(table, lane_vec, idx0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ns = best / (ITERS * n_lanes) * 1e9
    return dict(rows=rows, width=width, chunked=chunked,
                mb=round(rows * width * 4 / 1e6, 2),
                ns_per_row=round(ns, 3), mrows_s=round(1e3 / ns, 1))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    # size sweep at width 128
    for rows in (2048, 4096, 6144, 8192, 12288, 16384, 32768):
        print(json.dumps(bench(rows, 128)), flush=True)

    # byte-threshold check at other widths (same MB as some above)
    for rows, width in ((8192, 64), (16384, 64), (32768, 64),
                        (4096, 256), (2048, 512), (65536, 32)):
        print(json.dumps(bench(rows, width)), flush=True)

    # chunked execution shape (lax.map over 4096-lane chunks)
    for rows in (4096, 8192, 16384):
        print(json.dumps(bench(rows, 128, chunked=4096)), flush=True)

    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
