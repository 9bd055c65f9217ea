"""Round 2j step 28: cammath (pure elementwise at 16384 lanes) poisons;
all 4096-lane op-class programs were clean. Isolate: op kind vs lane count.

Run detached: nohup python scripts/bisect_history28.py > /tmp/history28.log 2>&1 &
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
    print(json.dumps(dict(case=case, phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

iz16 = jnp.asarray(np.arange(16384), jnp.int32)
iz4 = jnp.asarray(np.arange(4096), jnp.int32)

if case == "i32mod7_16k":
    g = jax.jit(lambda a: (a % 7).sum())
    jax.block_until_ready(g(iz16))
elif case == "i32mod7_4k":
    g = jax.jit(lambda a: (a % 7).sum())
    jax.block_until_ready(g(iz4))
elif case == "u32mod_16k":
    g = jax.jit(lambda a: (a % jnp.uint32(1009)).sum())
    jax.block_until_ready(g(iz16.astype(jnp.uint32)))
elif case == "i32divdyn_16k":
    b = jnp.asarray(7, jnp.int32)
    g = jax.jit(lambda a, bb: ((a // bb) + (a % bb)).sum())
    jax.block_until_ready(g(iz16, b))
elif case == "i32mod128_16k":
    g = jax.jit(lambda a: ((a % 128) + (a // 128)).sum())
    jax.block_until_ready(g(iz16))

timeit("after_case")
"""

CASES = ["i32mod7_16k", "i32mod7_4k", "u32mod_16k", "i32divdyn_16k", "i32mod128_16k"]


def main():
    for case in CASES:
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
