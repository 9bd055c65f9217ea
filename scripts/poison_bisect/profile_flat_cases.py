"""Discriminate the 1.6 ns/row vs 0.05 ns/row gather-rate split (round 2j).

Facts so far:
- twolevel backend, app scene, standalone: row gathers 3.3 us/2048 rows
  (xplane, profile_twolevel.py) — same as in-frame. NOT frame context.
- flat backend, synthetic 100k cloud, standalone: ~0.05 ns/row effective
  (microbench_cpp round 2b, 515 Mrays/s).

This profiles the flat backend on BOTH scenes with identical ray shapes so
the xplane per-op gather times separate backend-body effects from
scene/index-distribution effects.

Run detached: nohup python scripts/profile_flat_cases.py > /tmp/flatcases.log 2>&1 &
Parse: python scripts/parse_xplane_ops.py '/tmp/flat_app_trace/plugins/profile/*/*.xplane.pb' 12
       python scripts/parse_xplane_ops.py '/tmp/flat_syn_trace/plugins/profile/*/*.xplane.pb' 12
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def profile_case(name, bvh, ro, rd, rm, outdir):
    from mrt_tpu.bvh import wide
    from mrt_tpu.core import types as T

    def run_flat(table, patch, ro, rd, rm):
        b = bvh._replace(table=table.at[:8].set(patch))
        return wide.closest_hit(b, T.Rays(ro, rd, rm), mask=None,
                                sort_rays=True, chunks=16, unroll=2)

    f = jax.jit(run_flat)
    args = (bvh.table, bvh.table[:8], ro, rd, rm)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    n = ro.shape[0]
    print(json.dumps(dict(case=name, us_per_call=round(best * 1e6, 1),
                          mrays_s=round(n / best / 1e6, 1),
                          rows=int(bvh.table.shape[0]))), flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
    print(name, "trace:", outdir, flush=True)


def main():
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer
    from mrt_tpu.bvh import wide

    N = 32768
    rng = np.random.default_rng(1)

    # case A: flat backend on the app scene, camera-ish rays
    scene = make_app_scene(width=64, height=64, include_robot=False)
    r = Renderer(scene, output_width=64, output_height=64)
    r.two_level = False
    r.rebuild_bvh()
    o = np.tile(np.array([0.0, 1.0, 5.4], np.float32), (N, 1))
    d = rng.normal(0, 0.25, (N, 3)).astype(np.float32)
    d[:, 2] = -1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    profile_case("flat_app", r.bvh, jnp.asarray(o), jnp.asarray(d),
                 jnp.full((N,), np.inf, jnp.float32), "/tmp/flat_app_trace")

    # case B: flat backend on the synthetic 100k cloud (round-2b setup)
    n_tris = 100_000
    rng2 = np.random.default_rng(0)
    c = rng2.uniform(0, 1, (n_tris, 3)).astype(np.float32)
    e = 0.6 / np.sqrt(n_tris)
    v1 = c + rng2.normal(size=(n_tris, 3)).astype(np.float32) * e
    v2 = c + rng2.normal(size=(n_tris, 3)).astype(np.float32) * e
    bvh_syn = wide.build(c, v1, v2)
    o2 = rng2.uniform(0, 1, (N, 3)).astype(np.float32); o2[:, 2] = -1.0
    d2 = rng2.normal(0, 0.05, (N, 3)).astype(np.float32); d2[:, 2] = 1.0
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    profile_case("flat_syn", bvh_syn, jnp.asarray(o2), jnp.asarray(d2),
                 jnp.full((N,), np.inf, jnp.float32), "/tmp/flat_syn_trace")


if __name__ == "__main__":
    main()
