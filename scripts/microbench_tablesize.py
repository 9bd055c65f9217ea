"""Real-traversal gather cost vs BVH table size.

Synthetic microbenches keep getting rewritten by XLA into something that
doesn't move the rows (docs: microbench_vmem*.py). This measures the REAL
wide-BVH traversal (wide._traverse, profile=True) on triangle soups of
increasing size and reports ns per actually-popped row. If XLA places small
tables in VMEM, ns/pop should cliff upward at some table size.

Run detached: nohup python scripts/microbench_tablesize.py > /tmp/tsize.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

N_RAYS = 65536


def make_soup(n_tris, seed=0):
    """Random small triangles filling the unit box (uniform density)."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
    # edge length ~ density^-1/2 so expected overlap stays scale-free
    e = 0.6 / np.sqrt(n_tris)
    d1 = rng.normal(size=(n_tris, 3)).astype(np.float32) * e
    d2 = rng.normal(size=(n_tris, 3)).astype(np.float32) * e
    return c, c + d1, c + d2


def bench(n_tris, chunks=16):
    v0, v1, v2 = make_soup(n_tris)
    bvh = wide.build(v0, v1, v2)
    rows = bvh.n_rows
    mb = rows * wide.ROW * 4 / 1e6

    rng = np.random.default_rng(1)
    # coherent-ish primaries: origins on a plane outside, direction +z-ish
    o = rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32)
    o[:, 2] = -1.0
    d = rng.normal(0, 0.05, (N_RAYS, 3)).astype(np.float32)
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = T.Rays(jnp.asarray(o), jnp.asarray(d), jnp.full((N_RAYS,), np.inf, jnp.float32))
    mask = jnp.ones((N_RAYS,), bool)

    fn = jax.jit(
        lambda table, ro, rd, rm, msk: wide._traverse(
            wide.WideBVH(table, bvh.node_child, bvh.leaf_tri, bvh.n_internal, bvh.depth),
            T.Rays(ro, rd, rm), 1e-4, False, msk,
            chunks=chunks, sort_rays=True, profile=True,
        )
    )
    args = (bvh.table, rays.origin, rays.direction, rays.max_distance, mask)
    st = fn(*args)
    jax.block_until_ready(st)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        st = fn(*args)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    pops = int(np.sum(np.asarray(st["pops"])))
    iters = int(np.sum(np.asarray(st["iters"])))
    return dict(
        n_tris=n_tris, rows=rows, mb=round(mb, 2),
        pops=pops, iters=iters, waste=round(iters / max(pops, 1), 2),
        mean_steps=round(pops / N_RAYS, 2),
        ns_per_pop=round(best / pops * 1e9, 2),
        ns_per_iter_lane=round(best / iters * 1e9, 2),
        mrays_s=round(N_RAYS / best / 1e6, 2),
        s=round(best, 4),
    )


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for n_tris in (8_000, 30_000, 60_000, 100_000, 200_000, 400_000, 800_000):
        print(json.dumps(bench(n_tris)), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
