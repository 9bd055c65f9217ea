"""Oracle test for workload-aware lane sorting: traverse once (profile mode)
to learn per-lane step counts, re-sort lanes by that count, traverse again.
If paid iters and wall time drop toward the mean, per-lane step PREDICTION
(temporal reuse) is worth building into the frame loop.

Run detached: nohup python scripts/microbench_sorthint.py > /tmp/sorthint.log 2>&1 &
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

def timed(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts)

def main():
    n = 65536
    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.two_level = False; r.rebuild_bvh()
    bvh = r.bvh
    cam = r.current_camera()
    rng = np.random.default_rng(0)
    px = rng.integers(0, 512, n); py = rng.integers(0, 512, n)
    u = (px + 0.5) / 512 * 2 - 1; v = (py + 0.5) / 512 * 2 - 1
    d = (u[:, None] * np.asarray(cam.right) + v[:, None] * np.asarray(cam.up)
         + np.asarray(cam.forward))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cam.position), (n, 3)).copy()
    mask = jnp.ones((n,), bool)

    for name, oo, dd in [("primary", o, d)]:
        rays = T.Rays(jnp.asarray(oo, jnp.float32), jnp.asarray(dd, jnp.float32),
                      jnp.full((n,), np.inf, jnp.float32))
        prof = jax.jit(lambda o_, d_: wide._traverse(
            bvh, T.Rays(o_, d_, jnp.full((n,), jnp.inf, jnp.float32)), 1e-4, False,
            mask, chunks=16, sort_rays=True, profile=True))
        st, dt0 = timed(prof, rays.origin, rays.direction)
        pops = np.asarray(st["pops"])
        base_paid = int(np.asarray(st["iters"]).sum())
        # oracle order: sort lanes by true pop count (work), then traverse
        # pre-permuted with sort_rays OFF (chunks see uniform work)
        order = np.argsort(pops, kind="stable")
        o2 = np.asarray(rays.origin)[order]; d2 = np.asarray(rays.direction)[order]
        prof2 = jax.jit(lambda o_, d_: wide._traverse(
            bvh, T.Rays(o_, d_, jnp.full((n,), jnp.inf, jnp.float32)), 1e-4, False,
            mask, chunks=16, sort_rays=False, profile=True))
        st2, dt2 = timed(prof2, jnp.asarray(o2), jnp.asarray(d2))
        oracle_paid = int(np.asarray(st2["iters"]).sum())
        # hybrid realistic: bucket pops into 8 levels, then morton-coherent
        # inside — emulate (hint<<k)|coherence
        from mrt_tpu.bvh.wide import _sort_keys
        keys = np.asarray(_sort_keys(bvh, rays, mask))
        hint = np.minimum(pops // 4, 63).astype(np.int64)
        hyb = np.lexsort((keys, hint))
        o3 = np.asarray(rays.origin)[hyb]; d3 = np.asarray(rays.direction)[hyb]
        st3, dt3 = timed(prof2, jnp.asarray(o3), jnp.asarray(d3))
        hyb_paid = int(np.asarray(st3["iters"]).sum())
        pop_sum = int(pops.sum())
        print(f"{name}: useful={pop_sum}", flush=True)
        print(f"  coherence sort: paid={base_paid} waste={base_paid/pop_sum:.2f} {dt0*1e3:.1f} ms", flush=True)
        print(f"  oracle work sort: paid={oracle_paid} waste={oracle_paid/pop_sum:.2f} {dt2*1e3:.1f} ms", flush=True)
        print(f"  hint-bucket+coherence: paid={hyb_paid} waste={hyb_paid/pop_sum:.2f} {dt3*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
