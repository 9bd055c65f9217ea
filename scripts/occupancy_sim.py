"""Occupancy study: capture per-lane USED traversal pops for realistic frame
batches (camera / fused bounce+shadow), then simulate the PAID step cost of
candidate lane orderings offline.

Why offline: with chunked execution, a chunk's while loop runs
ceil(max_used_in_chunk / unroll) trips and every lane in the chunk pays
trips*unroll row gathers (gathers are unconditional under masking). So
paid(order, chunks, unroll) is a pure function of the used-pops vector and
the ordering -- no device run needed to rank sorting strategies. One capture
buys the whole strategy x chunks x unroll grid; only the winner needs a TPU
A/B. (docs/PERF.md round 4a.)

Usage:
  python scripts/occupancy_sim.py [--capture-only] [--npz /tmp/occ.npz]
  env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/occupancy_sim.py --size 256
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(size: int, npz_path: str):
    import jax
    import jax.numpy as jnp

    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.bvh import twolevel
    from mrt_tpu.core import types as T

    scene = make_app_scene(width=size, height=size, include_robot=False)
    r = Renderer(scene, output_width=size, output_height=size)
    r.upscaler_mode = UPSCALER_OFF
    sd = r.scene_data
    bvh = r.bvh
    cam = r.current_camera()

    P = min(65536, size * size)  # one wavefront tile, raster order
    px = (np.arange(P) % size + 0.5) / size * 2 - 1
    py = (np.arange(P) // size + 0.5) / size * 2 - 1
    d = (px[:, None] * np.asarray(cam.right) + py[:, None] * np.asarray(cam.up)
         + np.asarray(cam.forward))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cam.position), (P, 3)).astype(np.float32)

    rays = T.Rays(jnp.asarray(o), jnp.asarray(d, jnp.float32),
                  jnp.full((P,), np.inf, jnp.float32))
    chunks = r.traversal_chunks if P % r.traversal_chunks == 0 else 1

    # --- camera batch -------------------------------------------------------
    ch = jax.jit(lambda ro, rd: twolevel.closest_hit(
        bvh, T.Rays(ro, rd, jnp.full((P,), jnp.inf, jnp.float32)),
        chunks=chunks, unroll=r.traversal_unroll, count_pops=True))
    hits, cam_pops = ch(rays.origin, rays.direction)
    cam_pops = np.asarray(cam_pops)
    tri = np.asarray(hits.triangle)
    t = np.asarray(hits.t)
    found = tri >= 0

    # world-space geometric normals of the hit triangles (for bounce dirs)
    idx = np.asarray(sd.indices)
    pos = np.asarray(sd.positions_obj)
    xf = np.asarray(sd.instance_transform)
    tri_inst = np.asarray(sd.tri_instance)
    ti = np.maximum(tri, 0)
    v = pos[idx[ti]]  # (P,3verts,3)
    m = xf[tri_inst[ti]]  # (P,4,4)
    vw = np.einsum("pij,pvj->pvi", m[:, :3, :3], v) + m[:, None, :3, 3]
    n = np.cross(vw[:, 1] - vw[:, 0], vw[:, 2] - vw[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    n = np.where((np.sum(n * d, axis=1) > 0)[:, None], -n, n)  # face the ray

    hitp = o + t[:, None] * d
    rng = np.random.default_rng(7)

    def cosine(nrm):
        u1, u2 = rng.random(P), rng.random(P)
        rr = np.sqrt(u1)
        phi = 2 * np.pi * u2
        lx, ly = rr * np.cos(phi), rr * np.sin(phi)
        lz = np.sqrt(np.maximum(1 - u1, 0))
        a = np.where((np.abs(nrm[:, 0]) > 0.9)[:, None],
                     np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
        tx = np.cross(nrm, a)
        tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
        ty = np.cross(nrm, tx)
        return lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * nrm

    lp = np.asarray(sd.lights.position[0])

    out = dict(cam_pops=cam_pops, cam_o=o, cam_d=d, cam_active=np.ones(P, bool))

    # --- two fused bounce rounds (mixed [closest | shadow] 2P batches) ------
    active = found.copy()
    origin, normal, point = o, n, hitp
    tm = jax.jit(lambda ro, rd, rm, sh, mk: twolevel.trace_mixed(
        bvh, T.Rays(ro, rd, rm), sh, mask=mk,
        chunks=2 * chunks if (2 * P) % (2 * chunks) == 0 else 1,
        unroll=r.traversal_unroll, count_pops=True))
    for b in range(2):
        if b == 0:
            # an alternate direction draw from the SAME origins/normals:
            # measures how much bounce cost is origin- vs direction-determined
            # (the "previous sample predicts this sample" hint candidate)
            bd_alt = cosine(normal)
            bo_alt = point + 1e-3 * normal
            h_alt = jax.jit(lambda ro, rd, mk: twolevel.closest_hit(
                bvh, T.Rays(ro, rd, jnp.full((P,), jnp.inf, jnp.float32)),
                mask=mk, chunks=chunks, unroll=r.traversal_unroll,
                count_pops=True))
            _, alt_pops = h_alt(jnp.asarray(bo_alt.astype(np.float32)),
                                jnp.asarray(bd_alt.astype(np.float32)),
                                jnp.asarray(active))
            out["b0_alt_pops"] = np.asarray(alt_pops)
        bd = cosine(normal)
        bo = point + 1e-3 * normal
        sv = lp[None, :] - point
        sdist = np.linalg.norm(sv, axis=1)
        sdir = sv / np.maximum(sdist[:, None], 1e-12)
        so = point + 1e-3 * normal
        ro = np.concatenate([bo, so]).astype(np.float32)
        rd = np.concatenate([bd, sdir]).astype(np.float32)
        rm = np.concatenate([np.full(P, np.inf), sdist - 2e-3]).astype(np.float32)
        sh = np.concatenate([np.zeros(P, bool), np.ones(P, bool)])
        mk = np.concatenate([active, active])
        h2, occ, pops2 = tm(jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(rm),
                            jnp.asarray(sh), jnp.asarray(mk))
        pops2 = np.asarray(pops2)
        out[f"b{b}_pops"] = pops2
        out[f"b{b}_o"] = ro
        out[f"b{b}_d"] = rd
        out[f"b{b}_active"] = mk
        out[f"b{b}_shadow"] = sh
        out[f"b{b}_parent_pops"] = np.concatenate([cam_pops if b == 0 else out[f"b{b-1}_pops"][:P],
                                                   cam_pops if b == 0 else out[f"b{b-1}_pops"][:P]])
        # advance: next bounce starts at this bounce's closest hits
        tri2 = np.asarray(h2.triangle)[:P]
        t2 = np.asarray(h2.t)[:P]
        f2 = (tri2 >= 0) & active
        ti2 = np.maximum(tri2, 0)
        v2 = pos[idx[ti2]]
        m2 = xf[tri_inst[ti2]]
        vw2 = np.einsum("pij,pvj->pvi", m2[:, :3, :3], v2) + m2[:, None, :3, 3]
        n2 = np.cross(vw2[:, 1] - vw2[:, 0], vw2[:, 2] - vw2[:, 0])
        n2 /= np.maximum(np.linalg.norm(n2, axis=1, keepdims=True), 1e-12)
        n2 = np.where((np.sum(n2 * bd, axis=1) > 0)[:, None], -n2, n2)
        point = bo + t2[:, None] * bd
        normal = n2
        active = f2
    # world bounds for the Morton minor key
    bmin, bmax = twolevel._world_bounds(bvh)
    out["bmin"] = np.asarray(bmin)
    out["bmax"] = np.asarray(bmax)
    np.savez_compressed(npz_path, **out)
    print(f"captured -> {npz_path}")


# --- offline simulation ------------------------------------------------------

def morton_key(o, d, bmin, bmax):
    octant = ((d[:, 0] < 0).astype(np.int64) + 2 * (d[:, 1] < 0)
              + 4 * (d[:, 2] < 0))
    ext = np.maximum(bmax - bmin, 1e-6)
    q = np.clip((o - bmin) / ext, 0.0, 1.0)
    cell = ((q[:, 0] * 15).astype(np.int64) * 256
            + (q[:, 1] * 15).astype(np.int64) * 16 + (q[:, 2] * 15).astype(np.int64))
    return octant * 4096 + cell


def paid_steps(used, order, chunks, unroll):
    """Total paid steps = sum over chunks of trips*unroll*lanes_in_chunk,
    trips = ceil(chunk max used / unroll) (0-used chunks exit at the cond)."""
    u = used[order].reshape(chunks, -1)
    mx = u.max(axis=1)
    trips = -(-mx // unroll)
    return int((trips * unroll).sum() * u.shape[1])


def simulate(npz_path):
    z = np.load(npz_path)
    bmin, bmax = z["bmin"], z["bmax"]

    def report(name, used, keys, chunks_list=(8, 16, 32, 64), unrolls=(2, 4)):
        usum = max(int(used.sum()), 1)
        line = f"{name:34s} used={usum:9d}"
        print(line)
        for strat, key in keys.items():
            order = np.argsort(key, kind="stable")
            cells = []
            for c in chunks_list:
                for ur in unrolls:
                    p = paid_steps(used, order, c, ur)
                    cells.append(f"c{c}/u{ur}={p/usum:5.2f}x")
            print(f"    {strat:22s} " + " ".join(cells))

    # camera batch
    used = z["cam_pops"]
    o, d = z["cam_o"], z["cam_d"]
    mk = morton_key(o, d, bmin, bmax)
    live = z["cam_active"]
    hint = used  # perfect temporal prediction (static scene)

    def banded(band, mk, live):
        k = band.astype(np.int64) * (1 << 15) + mk
        return np.where(live, k, 1 << 40)

    zero_mk = np.zeros_like(mk)  # stable sort keeps raster order within band
    keys = {
        "morton-only": banded(np.zeros_like(used), mk, live),
        "banded-hint (current)": banded(np.clip(hint // 2, 0, 62) + 1, mk, live),
        "banded-hint-fine": banded(np.clip(hint, 0, 1000) + 1, mk, live),
        "fine-no-morton": banded(np.clip(hint, 0, 1000) + 1, zero_mk, live),
        "cur-no-morton": banded(np.clip(hint // 2, 0, 62) + 1, zero_mk, live),
        "oracle": np.where(live, used.astype(np.int64), 1 << 40),
    }
    report("camera (P lanes)", used, keys)

    def voxel_cell(o, d, bmin, bmax, res=16):
        ext = np.maximum(bmax - bmin, 1e-6)
        q = np.clip((o - bmin) / ext, 0.0, 0.999)
        vx = (q * res).astype(np.int64)
        octant = ((d[:, 0] < 0).astype(np.int64) + 2 * (d[:, 1] < 0)
                  + 4 * (d[:, 2] < 0))
        return ((vx[:, 0] * res + vx[:, 1]) * res + vx[:, 2]) * 8 + octant

    for b in (0, 1):
        used = z[f"b{b}_pops"]
        o, d = z[f"b{b}_o"], z[f"b{b}_d"]
        live = z[f"b{b}_active"]
        sh = z[f"b{b}_shadow"]
        par = z[f"b{b}_parent_pops"]
        mk = morton_key(o, d, bmin, bmax)
        hq_par = np.clip(par // 2, 0, 62) + 1

        # spatial predictor: mean used pops of this lane's (voxel, octant)
        # cell -- the stationary-statistics upper bound on a per-frame
        # EMA-updated cost grid
        cell = voxel_cell(o, d, bmin, bmax)
        sums = np.bincount(cell, weights=used * live, minlength=16**3 * 8)
        cnts = np.maximum(np.bincount(cell, weights=live.astype(np.float64),
                                      minlength=16**3 * 8), 1)
        vox_hint = (sums / cnts)[cell].astype(np.int64)
        hq_vox = np.clip(vox_hint // 2, 0, 62) + 1

        cur_band = np.where(sh, 0, 64)  # current: shadow 0 | bounce unknown 64
        roll_band = np.where(sh, 0, hq_par)  # bounce banded by parent pops
        both_band = np.where(sh, hq_par + 64, hq_par)  # shadow banded too, above
        vox_band = np.where(sh, hq_vox + 64, hq_vox)
        keys = {
            "current (sh0|bounce64)": banded(cur_band, mk, live),
            "cur-no-morton": banded(cur_band, np.zeros_like(mk), live),
            "bounce-par-hint": banded(roll_band, mk, live),
            "both-par-hint": banded(both_band, mk, live),
            "voxel-mean-hint": banded(vox_band, mk, live),
            "voxel-fine": banded(np.where(sh, vox_hint + 1024, vox_hint), mk, live),
            "oracle": np.where(live, used.astype(np.int64), 1 << 40),
        }
        if b == 0 and "b0_alt_pops" in z:
            # previous-SAMPLE pops as the hint for the bounce half; shadow
            # half hinted by the same lane's alt pops scaled down
            ap = z["b0_alt_pops"]
            alt2 = np.concatenate([ap, ap]).astype(np.int64)
            hq_alt = np.clip(alt2 // 2, 0, 62) + 1
            keys["prev-sample-hint"] = banded(
                np.where(sh, hq_alt + 64, hq_alt), mk, live)
            bl = live[: len(ap)]
            if bl.any():
                cc = np.corrcoef(ap[bl], used[: len(ap)][bl])[0, 1]
                print(f"    [bounce cost corr: prev-sample r={cc:.3f}]")
        # decomposition: where does the waste live?
        for nm, m_ in (("bounce", ~sh & live), ("shadow", sh & live)):
            if m_.any():
                u_ = used[m_]
                print(f"    [{nm}: lanes={m_.sum()} used={u_.sum()} "
                      f"mean={u_.mean():.1f} p50={np.percentile(u_,50):.0f} "
                      f"p90={np.percentile(u_,90):.0f} max={u_.max()}]")
        report(f"bounce{b} mixed (2P lanes)", used, keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/occ_capture.npz")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--capture-only", action="store_true")
    ap.add_argument("--sim-only", action="store_true")
    args = ap.parse_args()
    if not args.sim_only:
        capture(args.size, args.npz)
    if not args.capture_only:
        simulate(args.npz)


if __name__ == "__main__":
    main()
