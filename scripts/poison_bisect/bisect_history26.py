"""Round 2j step 26: camrays poisons — halton or camera math?

Fresh subprocess per case:
  halton    - H.halton on 16384 lanes (the AA jitter call)
  halton_c  - compile-only (no execute)
  cammath   - ray direction normalize/broadcast math only
  stub      - the _stub_outputs construction only (TileOutputs of zeros)

Run detached: nohup python scripts/bisect_history26.py > /tmp/history26.log 2>&1 &
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
from mrt_tpu.core import halton as H

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

P = 16384
offs = jnp.asarray(np.random.default_rng(5).integers(0, 1 << 20, P), jnp.int32)

if case in ("halton", "halton_c"):
    g = jax.jit(lambda off: (H.halton(off, jnp.zeros((), jnp.int32))
                             + H.halton(off, jnp.ones((), jnp.int32))).sum())
    comp = g.lower(offs).compile()
    if case == "halton":
        jax.block_until_ready(g(offs))
elif case == "cammath":
    px = jnp.arange(P, dtype=jnp.int32) % 128
    py = jnp.arange(P, dtype=jnp.int32) // 128
    camr = jnp.asarray([1.0, 0, 0]); camu = jnp.asarray([0, 1.0, 0])
    camf = jnp.asarray([0, 0, -1.0]); camp = jnp.asarray([0, 1.0, 5.4])
    def cm(px, py):
        u = (px.astype(jnp.float32) + 0.5) / 128 * 2 - 1
        v = (py.astype(jnp.float32) + 0.5) / 128 * 2 - 1
        rdir = u[:, None] * camr + v[:, None] * camu + camf
        rdir = rdir / jnp.linalg.norm(rdir, axis=1, keepdims=True)
        return (rdir * 0.5 + 0.5).sum()
    g = jax.jit(cm)
    jax.block_until_ready(g(px, py))
elif case == "stub":
    def mk(p):
        z3 = jnp.zeros((P, 3), jnp.float32)
        z1 = jnp.zeros((P,), jnp.float32)
        return (z3, jnp.full((P,), 1e8, jnp.float32), jnp.zeros((P, 2)),
                z3, z3, z3, z1, jnp.zeros((P,), jnp.int32),
                jnp.asarray(p, jnp.int32))
    g = jax.jit(mk)
    jax.block_until_ready(g(offs))

timeit("after_case")
"""

CASES = ["halton", "halton_c", "cammath", "stub"]


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
