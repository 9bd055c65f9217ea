"""Does the VMEM-placed table gather's cost scale with ROW WIDTH?

Round-2h xplane profile: the traversal's 2048-row gathers from the S(1)
(VMEM) 14710x128 f32 table run at ~1.6 ns/row (~0.66 rows/cycle) — the
gather issue rate, not HBM latency. If that rate is BYTES-proportional,
shrinking rows (f32[64] table via LEAF_K<=6, or bf16 rows) halves the
single biggest per-step cost (~29% of the frame). If it is per-ROW flat,
width changes buy nothing.

Each case runs in a fresh subprocess (clean cross-program-prefetch state,
same as microbench_cpp.py) with the traversal's execution shape: lax.map
over 2048-lane chunks, dependent index chain, full-row consumption.

Run detached: nohup python scripts/microbench_rowwidth.py > /tmp/rowwidth.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp

rows, width, dtype_s, chunk = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
placement = sys.argv[5] if len(sys.argv) > 5 else "param"   # param | inprog | donate
pattern = sys.argv[6] if len(sys.argv) > 6 else "random"    # random | coherent
dtype = dict(f32=jnp.float32, bf16=jnp.bfloat16)[dtype_s]
ITERS = 30
N_LANES = 32768

table = jax.random.normal(jax.random.PRNGKey(0), (rows, width), jnp.float32).astype(dtype)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_LANES,), 0, rows, jnp.int32)
if pattern == "coherent":
    # all lanes in a chunk follow the SAME index chain (lockstep front)
    idx0 = jnp.tile(idx0[:N_LANES // chunk, None], (1, chunk)).reshape(-1)


def chain(table, idx0, n):
    def step(i, carry):
        idx, acc = carry
        row = jnp.take(table, idx, axis=0)
        acc = acc + row.astype(jnp.float32).sum(axis=1)
        nxt = jnp.abs(idx * 1103515245 + 12345 + row[:, 1].astype(jnp.int32)) % rows
        return nxt, acc

    idx, acc = jax.lax.fori_loop(0, ITERS, step, (idx0, jnp.zeros((n,), jnp.float32)))
    return acc.sum()


def body(table, idx0):
    if placement == "inprog":
        # in-program intermediate (the production staged-frame pattern):
        # MSA, not cross-program-prefetch, owns the placement
        table = table.at[0, 0].set(table[0, 0] + 0.0)
    out = jax.lax.map(lambda ix: chain(table, ix, chunk), idx0.reshape(-1, chunk))
    return out.sum()


if placement == "donate":
    def _run_d(table, idx0):
        out = jax.lax.map(lambda ix: chain(table, ix, chunk), idx0.reshape(-1, chunk))
        return out.sum(), table
    run_d = jax.jit(_run_d, donate_argnums=(0,))
    s, table = run_d(table, idx0)
    s.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, table = run_d(table, idx0)
        s.block_until_ready()
        best = min(best, time.perf_counter() - t0)
else:
    run = jax.jit(body)
    run(table, idx0).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(table, idx0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
ns = best / (ITERS * N_LANES) * 1e9
print(json.dumps(dict(rows=rows, width=width, dtype=dtype_s, chunk=chunk,
                      placement=placement, pattern=pattern,
                      mb=round(rows * width * table.dtype.itemsize / 1e6, 2),
                      ns_per_row=round(ns, 3))))
"""

CASES = [
    # (rows, width, dtype, chunk, placement, pattern)
    (14710, 128, "f32", 2048, "param", "random"),    # 0.063 ns/row measured
    (14710, 128, "f32", 2048, "inprog", "random"),   # production placement
    (14710, 128, "f32", 2048, "inprog", "coherent"),
    (14710, 128, "f32", 2048, "param", "coherent"),
    (14710, 128, "f32", 2048, "donate", "random"),
]


def main():
    for case in CASES:
        # NO subprocess timeout: killing a child mid-TPU-work wedges the
        # axon device grant for every process after (CLAUDE.md). Let each
        # case run to natural completion.
        p = subprocess.run(
            [sys.executable, "-c", CHILD] + [str(c) for c in case],
            capture_output=True, text=True, cwd=REPO,
        )
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else json.dumps({"case": list(case),
                                              "error": p.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
