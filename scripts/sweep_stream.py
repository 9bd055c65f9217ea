"""Measure streaming-wavefront traversal vs the chunked baseline on the
flagship scene: window x refill sweep on primary/secondary/shadow batches,
then a quick end-to-end frame comparison.

Run detached: nohup python scripts/sweep_stream.py > /tmp/stream.log 2>&1 &
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


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    n = 65536
    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.upscaler_mode = UPSCALER_OFF
    bvh = r.bvh

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
    lp = np.array([0.0, 8.0, 2.0], np.float32)
    sd = lp[None, :] - hp
    dist = np.linalg.norm(sd, axis=1)
    sd /= np.maximum(dist[:, None], 1e-6)
    sh = T.Rays(
        jnp.asarray(np.where(hit_mask[:, None], hp + sd * 1e-3, o), jnp.float32),
        jnp.asarray(sd, jnp.float32),
        jnp.asarray(np.where(hit_mask, dist - 1e-3, 1.0), jnp.float32),
    )
    hm = jnp.asarray(hit_mask)

    def run(name, rays, mask, any_hit, **kw):
        def fn(o_, d_, m_, msk):
            return wide._traverse(bvh, T.Rays(o_, d_, m_), 1e-4, any_hit, msk,
                                  sort_rays=True, **kw)

        jfn = jax.jit(fn)
        dt = timed(jfn, rays.origin, rays.direction, rays.max_distance, mask)
        nn = int(np.asarray(mask).sum())
        print(f"{name}: {nn / dt / 1e6:.2f} Mrays/s ({dt*1e3:.2f} ms)", flush=True)

    ones = jnp.ones((n,), bool)
    for batch_name, rays, mask, anyh in (
        ("primary", prim, ones, False),
        ("secondary", sec, hm, False),
        ("shadow", sh, hm, True),
    ):
        run(f"{batch_name} chunked c=16", rays, mask, anyh, chunks=16)
        for w in (4096, 8192, 16384):
            for k in (4, 8, 16):
                run(f"{batch_name} stream w={w} k={k}", rays, mask, anyh,
                    stream_window=w, refill_every=k)

    # end-to-end 512^2 quick frames
    for name, stream, refill in (("e2e chunked", 0, 8), ("e2e stream", 8192, 8),
                                 ("e2e stream16k", 16384, 8)):
        rr = Renderer(scene, output_width=512, output_height=512)
        rr.upscaler_mode = UPSCALER_OFF
        rr.samples_per_pixel = 2
        rr.max_bounces = 4
        rr.use_motion_adaptive_sampling = False
        rr.traversal_stream = stream
        rr.stream_refill = refill
        rr.draw()
        jax.block_until_ready(rr.accum)
        t0 = time.perf_counter()
        total = 0
        for _ in range(2):
            rr.draw()
            total += int(rr.last_rays_traced)
        jax.block_until_ready(rr.accum)
        dt = time.perf_counter() - t0
        print(f"{name}: {total/dt/1e6:.2f} Mrays/s e2e", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
