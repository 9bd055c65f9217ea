"""Strategies for inverting a permutation (the traversal unsort) and for
applying it, measured on-device at wavefront sizes.

The axon tunnel costs ~27 ms per dispatch+sync round trip, so each case
runs REPS dependent iterations inside one jitted fori_loop and reports
(total - baseline) / REPS.

Run detached: nohup python scripts/microbench_inv.py > /tmp/inv.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 200


def timed(make_body, init):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, make_body, x)

    r = run(init)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(init)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = 65536
    rng = np.random.default_rng(0)
    perm0 = jnp.asarray(rng.permutation(N).astype(np.int32))
    vals0 = jnp.asarray(rng.uniform(size=(N, 6)).astype(np.float32))
    iota = jnp.arange(N, dtype=jnp.int32)

    # each body perturbs its input so iterations are dependent & un-CSEable
    base = timed(lambda i, p: (p + 1) % N, perm0)

    cases = dict(
        scatter_inv=lambda i, p: jnp.zeros_like(p).at[p].set(iota) ^ 1,
        scatter_inv_unique=lambda i, p: (
            jnp.zeros_like(p).at[p].set(iota, unique_indices=True) ^ 1),
        argsort_inv=lambda i, p: jnp.argsort(p) ^ 1,
        sort_pair_inv=lambda i, p: jax.lax.sort((p, iota), num_keys=1)[1] ^ 1,
        gather_wide6=lambda i, v: jnp.take(v, perm0, axis=0) * 1.0000001,
        gather_narrow1=lambda i, v: jnp.take(v, perm0) * 1.0000001,
    )
    out = {"baseline_us": round(base / REPS * 1e6, 2)}
    for name, body in cases.items():
        if name == "gather_wide6":
            t = timed(body, vals0)
        elif name == "gather_narrow1":
            t = timed(body, vals0[:, 0])
        else:
            t = timed(body, perm0)
        out[name] = round((t - base) / REPS * 1e6, 1)  # us per op
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
