"""Bisect the 100x standalone-traversal speed split (round 2j).

microbench_cpp 'inprog' (N=65536, chunks=16 -> 4096 lanes, unroll=1,
profile=True, _traverse direct): 328 Mrays/s TODAY.
profile_flat_cases 'flat_syn' (N=32768, chunks=16 -> 2048 lanes, unroll=2,
profile=False, closest_hit): 0.9 Mrays/s TODAY. Same scene, same ray
distribution, same in-program-intermediate table pattern.

This sweeps the differing knobs one at a time, fresh subprocess each.

Run detached: nohup python scripts/bisect_flat_speed.py > /tmp/bisect.log 2>&1 &
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

N, chunks, unroll, profile, sort_rays = (int(sys.argv[1]), int(sys.argv[2]),
    int(sys.argv[3]), sys.argv[4] == "1", sys.argv[5] == "1")

n_tris = 100_000
rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
e = 0.6 / np.sqrt(n_tris)
v1 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
v2 = c + rng.normal(size=(n_tris, 3)).astype(np.float32) * e
bvh = wide.build(c, v1, v2)

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
                          chunks=chunks, sort_rays=sort_rays,
                          profile=profile, unroll=unroll)

fn = jax.jit(f)
args = (bvh.table, bvh.table[:8], ro, rd, rm, mask)
st = fn(*args); jax.block_until_ready(st)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
    best = min(best, time.perf_counter() - t0)
out = dict(N=N, chunks=chunks, unroll=unroll, profile=profile,
           sort=sort_rays, us=round(best * 1e6, 1),
           mrays_s=round(N / best / 1e6, 1))
if profile:
    out["pops"] = int(np.sum(np.asarray(st["pops"])))
print(json.dumps(out))
"""

CASES = [
    # (N, chunks, unroll, profile, sort) — start from the fast config,
    # mutate one knob at a time toward the slow config
    (65536, 16, 1, 1, 1),   # == microbench_cpp inprog (fast, 328)
    (65536, 16, 1, 0, 1),   # profile off
    (65536, 16, 2, 1, 1),   # unroll 2
    (32768, 16, 1, 1, 1),   # 2048-lane chunks
    (32768, 16, 2, 0, 1),   # == flat_syn config (slow, 0.9)
]


def main():
    for case in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO)]
            + [str(c) for c in case],
            capture_output=True, text=True, cwd=REPO,
        )
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else json.dumps({"case": list(case),
                                              "error": p.stderr[-300:]}),
              flush=True)


if __name__ == "__main__":
    main()
