"""Measure the chunked traversal's tail waste on the flagship scene.

For primary / secondary / shadow batches, reports:
  - pops:  rows actually consumed (sum over lanes of active iterations)
  - iters: rows PAID for (sum over lanes of their chunk's trip count)
  - waste = iters / pops  (the multiplier chunked execution loses to tails)
  - wall-clock Mrays/s of the traversal call

Run detached: nohup python scripts/profile_trace_steps.py > /tmp/steps.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T
from mrt_tpu.engine.appscene import make_app_scene
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF


def report(name, st, rays_mask, dt):
    pops = int(np.sum(np.asarray(st["pops"])))
    iters = int(np.sum(np.asarray(st["iters"])))
    n = int(np.sum(np.asarray(rays_mask)))
    per_ray = np.asarray(st["pops"])[np.asarray(rays_mask)]
    print(
        f"{name}: rays={n} pops={pops} iters(paid)={iters} "
        f"waste={iters / max(pops, 1):.2f} mean_steps={per_ray.mean():.1f} "
        f"p99={np.percentile(per_ray, 99):.0f} max={per_ray.max()} "
        f"| {n / dt / 1e6:.2f} Mrays/s",
        flush=True,
    )


def timed_trace(bvh, rays, mask, chunks, sort):
    fn = jax.jit(
        lambda o, d, m, msk: wide._traverse(
            bvh, T.Rays(o, d, m), 1e-4, False, msk,
            chunks=chunks, sort_rays=sort, profile=True,
        )
    )
    st = fn(rays.origin, rays.direction, rays.max_distance, mask)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = fn(rays.origin, rays.direction, rays.max_distance, mask)
    jax.block_until_ready(st)
    return st, time.perf_counter() - t0


def main():
    n = 65536
    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.two_level = False  # this tool profiles the FLAT wide traversal
    r.rebuild_bvh()
    r.upscaler_mode = UPSCALER_OFF
    bvh = r.bvh
    print(f"scene rows={bvh.n_rows} internal={bvh.n_internal} depth={bvh.depth}", flush=True)

    cam = r.current_camera()
    rng = np.random.default_rng(0)
    px = rng.integers(0, 512, n)
    py = rng.integers(0, 512, n)
    u = (px + 0.5) / 512 * 2 - 1
    v = (py + 0.5) / 512 * 2 - 1
    d = (
        u[:, None] * np.asarray(cam.right)
        + v[:, None] * np.asarray(cam.up)
        + np.asarray(cam.forward)
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cam.position), (n, 3)).copy()
    prim = T.Rays(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                  jnp.full((n,), np.inf, jnp.float32))
    mask = jnp.ones((n,), bool)

    for chunks, sort in ((8, True), (16, True), (32, True), (64, True), (16, False), (1, True)):
        st, dt = timed_trace(bvh, prim, mask, chunks, sort)
        report(f"primary c={chunks} sort={int(sort)}", st, np.ones(n, bool), dt)

    # secondary: cosine-ish random bounce from primary hits
    hits = wide.closest_hit(bvh, prim, t_min=1e-4, chunks=16, sort_rays=True)
    hit_mask = np.asarray(hits.triangle >= 0)
    hp = o + d * np.asarray(hits.t)[:, None]
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    sec = T.Rays(
        jnp.asarray(np.where(hit_mask[:, None], hp + dd * 1e-3, o), jnp.float32),
        jnp.asarray(dd, jnp.float32),
        jnp.full((n,), np.inf, jnp.float32),
    )
    for chunks in (8, 16, 32):
        st, dt = timed_trace(bvh, sec, jnp.asarray(hit_mask), chunks, True)
        report(f"secondary c={chunks}", st, hit_mask, dt)

    # shadow: toward the area light (any-hit mode)
    lp = np.array([0.0, 8.0, 2.0], np.float32)
    sd = lp[None, :] - hp
    dist = np.linalg.norm(sd, axis=1)
    sd /= np.maximum(dist[:, None], 1e-6)
    sh = T.Rays(
        jnp.asarray(np.where(hit_mask[:, None], hp + sd * 1e-3, o), jnp.float32),
        jnp.asarray(sd, jnp.float32),
        jnp.asarray(np.where(hit_mask, dist - 1e-3, 1.0), jnp.float32),
    )

    def timed_shadow(chunks):
        fn = jax.jit(
            lambda o_, d_, m_, msk: wide._traverse(
                bvh, T.Rays(o_, d_, m_), 1e-4, True, msk,
                chunks=chunks, sort_rays=True, profile=True,
            )
        )
        st = fn(sh.origin, sh.direction, sh.max_distance, jnp.asarray(hit_mask))
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st = fn(sh.origin, sh.direction, sh.max_distance, jnp.asarray(hit_mask))
        jax.block_until_ready(st)
        return st, time.perf_counter() - t0

    for chunks in (8, 16, 32):
        st, dt = timed_shadow(chunks)
        report(f"shadow c={chunks}", st, hit_mask, dt)

    print("done", flush=True)


if __name__ == "__main__":
    main()
