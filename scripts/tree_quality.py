"""Offline BVH-builder quality A/B: used pops per ray (mean/p90/max) and
simulated paid steps at the production chunking, for the shipped builder vs
a candidate .so (same C ABI), on the flagship app scene.

Pops scale the entire traversal band (63% of the frame), so builder quality
A/Bs rank offline exactly like sorting strategies do (occupancy_sim.py).

Usage:
  env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/tree_quality.py \
      [--alt /tmp/libmrt_native_v2.so] [--size 256]
"""

import argparse
import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def alt_builder(so_path):
    lib = ctypes.CDLL(so_path)
    lib.mrt_build_wide_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mrt_build_wide_bvh.restype = ctypes.c_int
    lib.mrt_wide_n_internal.restype = ctypes.c_int32
    lib.mrt_wide_n_leaves.restype = ctypes.c_int32
    lib.mrt_wide_depth.restype = ctypes.c_int32
    lib.mrt_wide_fetch.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 2

    def build(tri_verts, arity=None, leaf_k=None, spatial=False):
        from mrt_tpu.bvh.wide import ARITY as _A, LEAF_K as _L
        A = _A if arity is None else arity
        L = _L if leaf_k is None else leaf_k
        tv = np.ascontiguousarray(tri_verts, np.float32)
        rc = lib.mrt_build_wide_bvh(
            tv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tv.shape[0], A, L)
        if rc != 0:
            return None
        ni, nl = int(lib.mrt_wide_n_internal()), int(lib.mrt_wide_n_leaves())
        depth = int(lib.mrt_wide_depth())
        child = np.empty((ni, A), np.int32)
        leaf = np.empty((nl, L), np.int32)
        lib.mrt_wide_fetch(child.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                           leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return child, leaf, depth, None

    return build


def paid(used, key, chunks=16, unroll=4):
    order = np.argsort(key, kind="stable")
    u = used[order].reshape(chunks, -1)
    trips = -(-u.max(axis=1) // unroll)
    return int((trips * unroll).sum() * u.shape[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alt", default="/tmp/libmrt_native_v2.so")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dragon", type=int, default=None, metavar="SUBDIV",
                    help="use the dragon_1m-class scene (bench.py's "
                         "dragon_subdivisions; 8 = 1.31M tris) instead of "
                         "the flagship app scene")
    ap.add_argument("--sbvh", action="store_true",
                    help="rank the SBVH spatial-split tree (wide.build "
                         "spatial=True) alongside the shipped object-split one")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.bvh import wide
    from mrt_tpu.core import types as T
    from mrt_tpu.utils import native

    size = args.size
    scene = make_app_scene(width=size, height=size, include_robot=False,
                           dragon_subdivisions=args.dragon)
    r = Renderer(scene, output_width=size, output_height=size)
    r.upscaler_mode = UPSCALER_OFF
    sd = r.scene_data
    # world-space flattened triangles (the flat wide path's input)
    idx = np.asarray(sd.indices)
    pos = np.asarray(sd.positions_obj)
    xf = np.asarray(sd.instance_transform)
    vin = np.asarray(sd.vertex_instance)
    m = xf[vin]
    pw = np.einsum("vij,vj->vi", m[:, :3, :3], pos) + m[:, :3, 3]
    tv = np.concatenate([pw[idx[:, 0]], pw[idx[:, 1]], pw[idx[:, 2]]], axis=1)

    cam = r.current_camera()
    P = min(65536, size * size)
    px = (np.arange(P) % size + 0.5) / size * 2 - 1
    py = (np.arange(P) // size + 0.5) / size * 2 - 1
    d = (px[:, None] * np.asarray(cam.right) + py[:, None] * np.asarray(cam.up)
         + np.asarray(cam.forward))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cam.position), (P, 3)).astype(np.float32)

    builders = {"shipped": None}
    if args.sbvh:
        builders["sbvh"] = "sbvh"
    if args.alt and os.path.exists(args.alt):
        builders[os.path.basename(args.alt)] = alt_builder(args.alt)

    for name, bld in builders.items():
        orig = native.build_wide_bvh_sah
        if bld is not None and bld != "sbvh":
            native.build_wide_bvh_sah = bld
        try:
            t0 = time.perf_counter()
            bvh = wide.build(tv[:, 0:3], tv[:, 3:6], tv[:, 6:9], method="sah",
                             spatial=(bld == "sbvh"))
            bt = time.perf_counter() - t0
        finally:
            native.build_wide_bvh_sah = orig

        ch = jax.jit(lambda ro, rd: wide.closest_hit(
            bvh, T.Rays(ro, rd, jnp.full((P,), jnp.inf, jnp.float32)),
            chunks=16, unroll=4, count_pops=True))
        hits, pops = ch(jnp.asarray(o), jnp.asarray(d, jnp.float32))
        pops = np.asarray(pops)
        t = np.asarray(hits.t)
        tri = np.asarray(hits.triangle)
        found = tri >= 0

        # one cosine-bounce batch off the camera hits
        ti = np.maximum(tri, 0)
        v = tv[ti].reshape(-1, 3, 3)
        n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        n = np.where((np.sum(n * d, axis=1) > 0)[:, None], -n, n)
        hp = o + np.where(found, t, 0)[:, None] * d
        rng = np.random.default_rng(3)
        u1, u2 = rng.random(P), rng.random(P)
        rr, phi = np.sqrt(u1), 2 * np.pi * u2
        a = np.where((np.abs(n[:, 0]) > 0.9)[:, None],
                     np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
        tx = np.cross(n, a)
        tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        bd = (rr * np.cos(phi))[:, None] * tx + (rr * np.sin(phi))[:, None] * ty \
            + np.sqrt(np.maximum(1 - u1, 0))[:, None] * n
        bo = (hp + 1e-3 * n).astype(np.float32)
        chb = jax.jit(lambda ro, rd, mk: wide.closest_hit(
            bvh, T.Rays(ro, rd, jnp.full((P,), jnp.inf, jnp.float32)),
            mask=mk, chunks=16, unroll=4, count_pops=True))
        _, bpops = chb(jnp.asarray(bo), jnp.asarray(bd, np.float32),
                       jnp.asarray(found))
        bpops = np.asarray(bpops)

        # paid under production ordering: camera = fine hint bands (hint =
        # own pops, the static-scene prediction); bounce = Morton-only
        kc = np.where(np.ones(P, bool), np.clip(pops, 0, 125).astype(np.int64)
                      * (1 << 15), 1 << 40)
        pc = paid(pops, kc)
        kb = np.where(found, np.int64(0), 1 << 40)
        pb = paid(bpops, kb)
        print(f"{name:28s} build={bt*1e3:7.1f}ms nodes={bvh.n_internal} "
              f"depth={bvh.depth}")
        print(f"   camera: used mean={pops.mean():.2f} p90={np.percentile(pops,90):.0f} "
              f"max={pops.max()} | paid/used={pc/max(pops.sum(),1):.2f}x "
              f"paid={pc}")
        print(f"   bounce: used mean={bpops[found].mean():.2f} "
              f"p90={np.percentile(bpops[found],90):.0f} max={bpops.max()} "
              f"| paid/used={pb/max(bpops.sum(),1):.2f}x paid={pb}")


if __name__ == "__main__":
    main()
