"""Isolate stream per-step cost vs refill cost: sweep refill_every upward and
compare against the chunked per-step baseline."""

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

    def run(name, profile=False, **kw):
        fn = jax.jit(
            lambda o_, d_, m_: wide._traverse(
                bvh, T.Rays(o_, d_, m_), 1e-4, False, None, sort_rays=True,
                profile=profile, **kw
            )
        )
        out = fn(prim.origin, prim.direction, prim.max_distance)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(prim.origin, prim.direction, prim.max_distance)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        extra = ""
        if profile:
            ns = int(np.asarray(out["nsteps"])[0]) if "nsteps" in out else -1
            extra = f" nsteps={ns}"
        print(f"{name}: {n / dt / 1e6:.2f} Mrays/s ({dt*1e3:.2f} ms){extra}", flush=True)

    run("chunked c=16", chunks=16)
    run("chunked c=1 (flat)", chunks=1)
    for k in (4, 16, 64, 256):
        run(f"stream w=4096 k={k}", stream_window=4096, refill_every=k)
        run(f"stream w=4096 k={k} prof", stream_window=4096, refill_every=k, profile=True)
    run("stream w=65536 k=100000 (no refill)", stream_window=65536, refill_every=100000)
    print("done", flush=True)


if __name__ == "__main__":
    main()
