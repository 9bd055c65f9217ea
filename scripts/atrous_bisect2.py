"""Structural bisect for the Mosaic remote-compile failure (see
atrous_bisect.py — even a trivial DMA-copy kernel fails, so the tap math
is innocent). Rungs isolate: 3D blocks, VMEM scratch, DMA semaphores,
memory_space=ANY + manual async copy.

Run: timeout 900 python scripts/atrous_bisect2.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, W = 256, 512
TILE = 64


def attempt(name, fn):
    try:
        np.asarray(fn())
        print(f"PASS {name}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:200])


def main():
    print(f"devices: {jax.devices()}")
    x2 = jnp.ones((ROWS, W), jnp.float32)
    x3 = jnp.ones((4, ROWS, W), jnp.float32)

    def k_copy2(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    attempt("2d_vmem", lambda: pl.pallas_call(
        k_copy2,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32))(x2))

    def k_copy3(x_ref, o_ref):
        for c in range(4):
            o_ref[c] = x_ref[c] * 2.0

    attempt("3d_vmem_blocks", lambda: pl.pallas_call(
        k_copy3,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((4, TILE, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, TILE, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ROWS, W), jnp.float32))(x3))

    def k_scratch(x_ref, o_ref, scr):
        scr[:] = x_ref[:] * 2.0
        o_ref[:] = scr[:]

    attempt("2d_vmem_scratch", lambda: pl.pallas_call(
        k_scratch,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, W), jnp.float32)])(x2))

    def k_dma2(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TILE, TILE), :], scr, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scr[:] * 2.0

    attempt("2d_any_dma_sem", lambda: pl.pallas_call(
        k_dma2,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, W), jnp.float32),
                        pltpu.SemaphoreType.DMA])(x2))

    def k_halo(x_ref, o_ref):
        # 3D block + static sub-slices with nonzero offsets (no DMA)
        acc = jnp.zeros((TILE, W - 8), jnp.float32)
        for dc in (0, 2, 4, 6, 8):
            acc += x_ref[0, :, dc:dc + W - 8]
        o_ref[0] = acc

    attempt("3d_vmem_lane_slices", lambda: pl.pallas_call(
        k_halo,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((1, TILE, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TILE, W - 8), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ROWS, W - 8), jnp.float32))(x3[:1]))


if __name__ == "__main__":
    main()
