"""Bisect the Mosaic-internal compile failure of kernels/atrous.py on TPU
(docs/PERF.md round 3d: HTTP 500 / tpu_compile_helper exit 1, while
kernels/present.py compiles fine in the same window).

Compiles a ladder of kernel variants, simplest first, each adding one
suspect construct; prints PASS/FAIL per rung so the failing construct is
the first FAIL. Each variant runs in-process (compile failures raise,
they don't wedge the device).

Run: timeout 1200 python scripts/atrous_bisect.py [--tile 64]
"""

import argparse
import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 512


def run(name, kernel, tile, pad, n_in=8, n_out=4, use_dma=True):
    h_pad = ((H + tile - 1) // tile) * tile
    planes = jnp.zeros((n_in, h_pad + 2 * pad, W + 2 * pad), jnp.float32)
    n_tiles = h_pad // tile
    try:
        if use_dma:
            out = pl.pallas_call(
                functools.partial(kernel, tile=tile, pad=pad),
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((n_out, tile, W), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_out, h_pad, W), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((n_in, tile + 2 * pad, W + 2 * pad), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )(planes)
        else:
            out = pl.pallas_call(
                functools.partial(kernel, tile=tile, pad=pad),
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((n_in, tile + 2 * pad, W + 2 * pad),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((n_out, tile, W), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_out, h_pad, W), jnp.float32),
            )(planes)
        np.asarray(out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        if os.environ.get("MRT_BISECT_VERBOSE"):
            traceback.print_exc()
        return False


# ---- rung kernels (DMA variants take (in_hbm, out_ref, scratch, sem)) ----

def k_copy(in_hbm, out_ref, scratch, sem, *, tile, pad):
    """DMA a halo'd row slab, write the center back (no taps)."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * pad), :], scratch, sem)
    dma.start(); dma.wait()
    w = out_ref.shape[2]
    for c in range(4):
        out_ref[c] = scratch[c, pad:pad + tile, pad:pad + w]


def k_rowtaps(in_hbm, out_ref, scratch, sem, *, tile, pad):
    """Sublane-offset (row) taps only."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * pad), :], scratch, sem)
    dma.start(); dma.wait()
    w = out_ref.shape[2]
    step = pad // 2
    for c in range(4):
        acc = jnp.zeros((tile, w), jnp.float32)
        for dr in (-2 * step, -step, 0, step, 2 * step):
            acc += scratch[c, pad + dr:pad + dr + tile, pad:pad + w]
        out_ref[c] = acc


def k_coltaps(in_hbm, out_ref, scratch, sem, *, tile, pad):
    """Lane-offset (column) taps only — the unaligned-lane-shift suspect."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * pad), :], scratch, sem)
    dma.start(); dma.wait()
    w = out_ref.shape[2]
    step = pad // 2
    for c in range(4):
        acc = jnp.zeros((tile, w), jnp.float32)
        for dc in (-2 * step, -step, 0, step, 2 * step):
            acc += scratch[c, pad:pad + tile, pad + dc:pad + dc + w]
        out_ref[c] = acc


def k_cross(in_hbm, out_ref, scratch, sem, *, tile, pad):
    """5x5 grid of row+col taps, plain sum (no weights)."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * pad), :], scratch, sem)
    dma.start(); dma.wait()
    w = out_ref.shape[2]
    step = pad // 2
    offs = (-2 * step, -step, 0, step, 2 * step)
    for c in range(4):
        acc = jnp.zeros((tile, w), jnp.float32)
        for dr in offs:
            for dc in offs:
                acc += scratch[c, pad + dr:pad + dr + tile,
                               pad + dc:pad + dc + w]
        out_ref[c] = acc


def k_weights(in_hbm, out_ref, scratch, sem, *, tile, pad):
    """Add the data-dependent weight math (exp, **32, rsqrt) on 2 planes."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * pad), :], scratch, sem)
    dma.start(); dma.wait()
    w = out_ref.shape[2]
    step = pad // 2
    offs = (-2 * step, -step, 0, step, 2 * step)
    center = scratch[0, pad:pad + tile, pad:pad + w]
    cz = scratch[1, pad:pad + tile, pad:pad + w]
    sigma = jnp.sqrt(jnp.maximum(center, 0.0)) * 4.0 + 1e-4
    inv = 1.0 / sigma
    for c in range(4):
        acc = jnp.zeros((tile, w), jnp.float32)
        wsum = jnp.zeros((tile, w), jnp.float32)
        for dr in offs:
            for dc in offs:
                v = scratch[c, pad + dr:pad + dr + tile, pad + dc:pad + dc + w]
                z = scratch[1, pad + dr:pad + dr + tile, pad + dc:pad + dc + w]
                wgt = jnp.clip(v, 0.0, 1.0) ** 32 * jnp.exp(-jnp.abs(z - cz) * inv)
                acc += v * wgt
                wsum += wgt
        out_ref[c] = acc / jnp.maximum(wsum, 1e-6)
    del center


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--step", type=int, default=2)
    args = ap.parse_args()
    pad = 2 * args.step
    print(f"devices: {jax.devices()}")

    run("dma_copy", k_copy, args.tile, pad)
    run("row_taps", k_rowtaps, args.tile, pad)
    run("col_taps", k_coltaps, args.tile, pad)
    run("cross_25", k_cross, args.tile, pad)
    run("weights", k_weights, args.tile, pad)

    # the real kernel at this shape, then at cfg5 shape
    from mrt_tpu.kernels.atrous import atrous_pass_pallas
    for (h, w) in ((256, 512), (540, 960)):
        try:
            rng = np.random.default_rng(0)
            demod = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
            var = jnp.asarray(rng.random((h, w)), jnp.float32)
            nrm = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)
            depth = jnp.asarray(1 + rng.random((h, w)), jnp.float32)
            out = atrous_pass_pallas(demod, var, nrm, depth,
                                     step=args.step, tile=args.tile)
            np.asarray(out[0])
            print(f"PASS full_kernel {h}x{w}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL full_kernel {h}x{w}: {type(e).__name__}: "
                  + str(e).replace(chr(10), ' | ')[:300])


if __name__ == "__main__":
    main()
