"""Stream-traversal diagnostics: outer-step counts, occupancy, per-step cost
vs the chunked baseline, and the dead-lane-capped e2e frame."""

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
    r.two_level = False  # the standalone section profiles the FLAT wide BVH
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

    # step-count profile at w=4096 k=8 (profile mode inflates time; ignore it)
    for w, k in ((4096, 8), (8192, 8), (4096, 4)):
        fn = jax.jit(
            lambda o_, d_, m_: wide._traverse(
                bvh, T.Rays(o_, d_, m_), 1e-4, False, None, sort_rays=True,
                stream_window=w, refill_every=k, profile=True,
            )
        )
        st = fn(prim.origin, prim.direction, prim.max_distance)
        jax.block_until_ready(st)
        nsteps = int(np.asarray(st["nsteps"])[0])
        occ = int(np.asarray(st["occupancy"])[0])
        pops = int(np.asarray(st["pops"]).sum())
        print(
            f"primary w={w} k={k}: nsteps={nsteps} lane_steps={nsteps * w} "
            f"active={occ} pops={pops} occupancy={occ / max(nsteps * w, 1):.2f} "
            f"active/pops={occ / max(pops, 1):.2f}",
            flush=True,
        )

    # pure timing without profile, after the fix
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

    run("primary chunked c=16", chunks=16)
    run("primary stream w=4096 k=4", stream_window=4096, refill_every=4)
    run("primary stream w=2048 k=4", stream_window=2048, refill_every=4)
    run("primary stream w=2048 k=2", stream_window=2048, refill_every=2)
    run("primary stream w=1024 k=2", stream_window=1024, refill_every=2)

    # e2e with the dead-lane fix
    for name, stream, refill in (
        ("e2e chunked", 0, 8),
        ("e2e stream w4096 k4", 4096, 4),
        ("e2e stream w8192 k8", 8192, 8),
    ):
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
