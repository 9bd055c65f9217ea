"""Round 2j step 8: minimal poison repro — which property of the tiny
(13,) f32 upload wedges the device into the 280x-slow mode?

Each case in sys.argv order; run variants in fresh subprocesses from the
driver below.

Run detached: nohup python scripts/bisect_history8.py > /tmp/history8.log 2>&1 &
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

VALS = [0.0, 37.25490188598633, 37.25490188598633, 37.25490188598633,
        37.25490188598633, 154.90196228027344, 37.25490188598633,
        96.07843017578125, 96.07843017578125, 30.0, 32.0, 32.0, 0.0]

keep = None
if case == "list_vals_f32":
    keep = jnp.asarray(VALS, jnp.float32)
elif case == "np_vals_f32":
    keep = jax.device_put(np.asarray(VALS, np.float32))
elif case == "np_zeros13_f32":
    keep = jax.device_put(np.zeros((13,), np.float32))
elif case == "np_zeros16_f32":
    keep = jax.device_put(np.zeros((16,), np.float32))
elif case == "list_zeros13_f32":
    keep = jnp.asarray([0.0] * 13, jnp.float32)
jax.block_until_ready(keep)
timeit("after_upload")
del keep
timeit("after_del")
"""

CASES = ["list_vals_f32", "np_vals_f32", "np_zeros13_f32",
         "np_zeros16_f32", "list_zeros13_f32"]


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
