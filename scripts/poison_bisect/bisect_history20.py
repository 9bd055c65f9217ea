"""Round 2j step 20: is WHILE-NESTING DEPTH the poison trigger?

The trace program nests sample-while -> bounce-while -> chunk-map-while ->
traversal-while (4 levels). Clean probes max out at 2. Wrap the standalone
traversal in 1 and 2 extra while_loop levels (2 trips each) and probe.

Run detached: nohup python scripts/bisect_history20.py > /tmp/history20.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

extra = int(sys.argv[1])

n_tris = 100_000
rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
e = 0.6 / np.sqrt(n_tris)
v1 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
v2 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
bvh = wide.build(c, v1, v2)

N = 32768
rng = np.random.default_rng(1)
o = rng.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
d = rng.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro, rd = jnp.asarray(o), jnp.asarray(d)
rm = jnp.full((N,), np.inf, jnp.float32)
mask = jnp.ones((N,), bool)

def f(table, patch, ro, rd, rm, msk):
    b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child, bvh.leaf_tri,
                     bvh.n_internal, bvh.depth)
    return wide._traverse(b, T.Rays(ro, rd, rm), 1e-4, False, msk,
                          chunks=16, sort_rays=True, profile=False, unroll=2)

fn = jax.jit(f)
args = (bvh.table, bvh.table[:8], ro, rd, rm, mask)

def timeit(label):
    st = fn(*args); jax.block_until_ready(st)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps(dict(extra=extra, phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

def nested(table, patch, ro, rd, rm, msk):
    b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child, bvh.leaf_tri,
                     bvh.n_internal, bvh.depth)

    def traverse_once(rd_c):
        st = wide._traverse(b, T.Rays(ro, rd_c, rm), 1e-4, False, msk,
                            chunks=16, sort_rays=True, profile=False,
                            unroll=2)
        return st["best_t"], st["best_u"]

    def level(k, inner):
        def run(rd_c):
            def cond(carry):
                i, _, _ = carry
                return i < 2
            def body(carry):
                i, rd_c, acc = carry
                t, u = inner(rd_c)
                rd_n = rd_c * (1.0 + u[:, None] * 1e-6)
                rd_n = rd_n / jnp.linalg.norm(rd_n, axis=1, keepdims=True)
                return i + 1, rd_n, acc + t
            _, rd_f, acc = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), rd_c,
                             jnp.zeros((N,), jnp.float32)))
            return acc, rd_f[:, 0]
        return run

    inner = traverse_once
    for k in range(extra):
        inner = level(k, inner)
    acc, _ = inner(rd)
    return acc.sum()

g = jax.jit(nested)
jax.block_until_ready(g(*args))
timeit("after_nested")
"""

CASES = [1, 2]


def main():
    for extra in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO), str(extra)],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"extra": extra, "error": p.stderr[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
