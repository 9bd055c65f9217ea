"""Standalone two-level traversal on the REAL flagship scene BVH at the
in-frame shapes (32768 rays, chunks=16 -> 2048-lane chunks, unroll=2,
in-program table intermediate). Compares against the flat wide backend and
against the in-frame per-step cost (~3.3 us/row-gather at 2048 lanes).

Run detached: nohup python scripts/microbench_twolevel.py > /tmp/tl.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.bvh import twolevel, wide
    from mrt_tpu.core import types as T

    scene = make_app_scene(width=64, height=64, include_robot=False)
    r = Renderer(scene, output_width=64, output_height=64)
    bvh2 = r.bvh  # TwoLevelBVH (default)
    r2 = Renderer(scene, output_width=64, output_height=64)
    r2.two_level = False
    r2.rebuild_bvh()
    bvh1 = r2.bvh  # flat WideBVH

    N = 32768
    rng = np.random.default_rng(1)
    # camera-ish coherent rays toward the scene
    o = np.tile(np.array([0.0, 1.0, 5.4], np.float32), (N, 1))
    d = rng.normal(0, 0.25, (N, 3)).astype(np.float32)
    d[:, 2] = -1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro, rd = jnp.asarray(o), jnp.asarray(d)
    rm = jnp.full((N,), np.inf, jnp.float32)

    def run_twolevel(table, patch, ro, rd, rm):
        b = bvh2._replace(table=table.at[:8].set(patch))
        return twolevel.closest_hit(b, T.Rays(ro, rd, rm), mask=None,
                                    sort_rays=True, chunks=16, unroll=2)

    def run_flat(table, patch, ro, rd, rm):
        b = bvh1._replace(table=table.at[:8].set(patch))
        return wide.closest_hit(b, T.Rays(ro, rd, rm), mask=None,
                                sort_rays=True, chunks=16, unroll=2)

    REPS = 20
    for name, fn, bvh in (("twolevel", run_twolevel, bvh2), ("flat", run_flat, bvh1)):
        def run_many(table, patch, ro, rd, rm, _fn=fn):
            def body(i, carry):
                rd_c, acc = carry
                h = _fn(table, patch, ro, rd_c, rm)
                # dependent perturbation so reps cannot be CSE'd away
                bump = (h.t[:, None] * 1e-7 + 1.0)
                rd_n = rd_c * bump / jnp.linalg.norm(rd_c * bump, axis=1, keepdims=True)
                return rd_n, acc + jnp.sum(h.t * 0.0) + jnp.sum(h.u) * 1e-9
            return jax.lax.fori_loop(0, REPS, body, (rd, jnp.zeros((), jnp.float32)))
        f = jax.jit(run_many)
        args = (bvh.table, bvh.table[:8], ro, rd, rm)
        out = f(*args); jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args); jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        per = best / REPS
        print(json.dumps(dict(
            backend=name, us_per_call=round(per * 1e6, 1),
            mrays_s=round(N / per / 1e6, 1),
            rows=int(bvh.table.shape[0]),
        )), flush=True)


if __name__ == "__main__":
    main()
