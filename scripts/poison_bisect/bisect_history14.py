"""Round 2j step 14: does a LONG-RUNNING (but small) program poison axon
dispatch, or is it the trace program's SIZE?

Cases (fresh subprocess each): matmul fori_loop sized to ~25 ms / ~100 ms /
~400 ms / ~1.6 s device time, then re-time the standalone traversal.
Plus a 'bigbody' case: fori_loop with unroll=128 (large executable, same
math) at ~100 ms.

Run detached: nohup python scripts/bisect_history14.py > /tmp/history14.log 2>&1 &
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

iters = int(sys.argv[1])
unroll = int(sys.argv[2])

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
    print(json.dumps(dict(iters=iters, unroll=unroll, phase=label,
                          us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

def loop(x):
    def body(i, a):
        return a @ x + 1.0
    return jax.lax.fori_loop(0, iters, body, x, unroll=unroll)

g = jax.jit(loop)
x = jnp.ones((1024, 1024), jnp.float32) * 1e-3
jax.block_until_ready(g(x))  # includes compile
t0 = time.perf_counter(); jax.block_until_ready(g(x))
print(json.dumps(dict(iters=iters, loop_ms=round((time.perf_counter()-t0)*1e3, 1))), flush=True)

timeit("after_loop")
"""

CASES = [(500, 1), (2000, 1), (8000, 1), (32000, 1), (2000, 128)]


def main():
    for iters, unroll in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO),
             str(iters), str(unroll)],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"iters": iters, "error": p.stderr[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
