"""Round 2j step 18: executable-size hypothesis with REAL content.

The non-poisoning standalone traversal compiled to ~0.7 MB HLO text; the
poisoning trace program is ~2.1 MB. Chain K sequential traversals in one
jit to scale the executable with identical op content. If poison appears
at some K, it's program size / load, not content.

Run detached: nohup python scripts/bisect_history18.py > /tmp/history18.log 2>&1 &
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

K = int(sys.argv[1])

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
    print(json.dumps(dict(K=K, phase=label, us=round(best * 1e6, 1),
                          mrays_s=round(N / best / 1e6, 1))), flush=True)

timeit("fresh")

def chainK(table, patch, ro, rd, rm, msk):
    b = wide.WideBVH(table.at[:8].set(patch), bvh.node_child, bvh.leaf_tri,
                     bvh.n_internal, bvh.depth)
    acc = jnp.zeros((N,), jnp.float32)
    rd_c = rd
    for i in range(K):
        st = wide._traverse(b, T.Rays(ro, rd_c, rm), 1e-4, False, msk,
                            chunks=16, sort_rays=True, profile=False,
                            unroll=2)
        acc = acc + st["best_t"] * (0.5 + 0.01 * i)
        rd_c = rd_c * (1.0 + st["best_u"][:, None] * 1e-6)
        rd_c = rd_c / jnp.linalg.norm(rd_c, axis=1, keepdims=True)
    return acc

g = jax.jit(chainK)
low = g.lower(*args)
comp = low.compile()
txt_mb = len(comp.as_text()) / 1e6
t0 = time.perf_counter()
out = g(*args); jax.block_until_ready(out)
print(json.dumps(dict(K=K, hlo_mb=round(txt_mb, 2),
                      chain_ms=round((time.perf_counter()-t0)*1e3, 1))), flush=True)

timeit("after_chain")
"""

CASES = [2, 4, 8]


def main():
    for k in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO), str(k)],
            capture_output=True, text=True, cwd=REPO,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"K": k, "error": p.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
