"""Round 2j step 10: which D2H paths poison, and what resets the poison?

Established: np.asarray(dev_arr) -> permanent 280-400x slowdown of all
subsequent device programs (axon runtime state; not memory, not placement).

Cases (fresh subprocess each):
  paths:    device_get | item | async_copy (copy_to_host_async then read)
  recovery: clear_caches | clear_backends (after poisoning with np.asarray)

Run detached: nohup python scripts/bisect_history10.py > /tmp/history10.log 2>&1 &
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
small = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
jax.block_until_ready(small)

if case == "device_get":
    _ = jax.device_get(small)
elif case == "item":
    _ = small[0].item()
elif case == "async_copy":
    small.copy_to_host_async()
    time.sleep(0.5)
    _ = np.asarray(small)
elif case in ("clear_caches", "clear_backends", "donate_readback"):
    _ = np.asarray(small)  # poison first
timeit("after_readback")

if case == "clear_caches":
    jax.clear_caches()
    timeit("after_clear_caches")
elif case == "clear_backends":
    jax._src.api.clear_backends()
    timeit("after_clear_backends")
"""

CASES = ["device_get", "item", "async_copy", "clear_caches", "clear_backends"]


def main():
    for case in CASES:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % dict(repo=REPO), case],
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
