"""Post-unique-scatter measurements: flat stream standalone + the e2e matrix
(flat-chunked r01 baseline vs two-level stream vs knob variations)."""

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


def main():
    n = 65536
    scene = make_app_scene(width=512, height=512, include_robot=False)
    r = Renderer(scene, output_width=512, output_height=512)
    r.upscaler_mode = UPSCALER_OFF
    r.two_level = False
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

    def run(name, **kw):
        fn = jax.jit(
            lambda o_, d_, m_: wide._traverse(
                bvh, T.Rays(o_, d_, m_), 1e-4, False, None, sort_rays=True, **kw
            )
        )
        out = fn(prim.origin, prim.direction, prim.max_distance)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(prim.origin, prim.direction, prim.max_distance)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name}: {n / dt / 1e6:.2f} Mrays/s ({dt*1e3:.2f} ms)", flush=True)

    run("flat chunked c=16", chunks=16)
    for k in (2, 4, 8):
        run(f"flat stream w=4096 k={k}", stream_window=4096, refill_every=k)
    run("flat stream w=8192 k=4", stream_window=8192, refill_every=4)

    # e2e matrix (512^2, 2 spp, 4 bounces, 4 timed frames)
    def e2e(name, **cfg):
        rr = Renderer(scene, output_width=512, output_height=512)
        rr.upscaler_mode = UPSCALER_OFF
        rr.samples_per_pixel = 2
        rr.max_bounces = 4
        rr.use_motion_adaptive_sampling = False
        for k, v in cfg.items():
            setattr(rr, k, v)
        rr.draw()
        jax.block_until_ready(rr.accum)
        t0 = time.perf_counter()
        total = 0
        for _ in range(4):
            rr.draw()
            total += int(rr.last_rays_traced)
        jax.block_until_ready(rr.accum)
        dt = time.perf_counter() - t0
        print(f"{name}: {total/dt/1e6:.2f} Mrays/s e2e", flush=True)

    e2e("e2e r01-config (flat chunked, no prime)", two_level=False,
        hit_priming=False)
    e2e("e2e flat chunked + prime", two_level=False)
    e2e("e2e flat stream4096k4 + prime", two_level=False, traversal_stream=4096,
        stream_refill=4)
    e2e("e2e twolevel stream4096k4 + prime", traversal_stream=4096, stream_refill=4)
    e2e("e2e twolevel stream8192k8 + prime", traversal_stream=8192, stream_refill=8)
    e2e("e2e twolevel stream4096k4 no-prime", traversal_stream=4096,
        stream_refill=4, hit_priming=False)
    print("done", flush=True)


if __name__ == "__main__":
    main()
