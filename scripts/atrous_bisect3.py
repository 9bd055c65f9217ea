"""Third bisect rung-set: atrous_bisect2 passed everything, so isolate
(a) non-128-multiple lane dims in VMEM scratch / DMA,
(b) DMA with a dynamic offset on the MIDDLE dim of a 3D ref,
(c) unaligned lane-dim slices out of a wider scratch,
in combinations approaching what kernels/atrous.py does.

Run: timeout 900 python scripts/atrous_bisect3.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE, PAD = 64, 4
ROWS = 256


def attempt(name, fn):
    try:
        np.asarray(fn())
        print(f"PASS {name}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:160])


def dma_case(n_planes, w_pad, col_off):
    """DMA (n_planes, TILE+2PAD, w_pad) slab from a 3D HBM ref with a
    dynamic offset on the middle dim; write scr[0, PAD:, col_off:] out."""
    x = jnp.ones((n_planes, ROWS + 2 * PAD, w_pad), jnp.float32)
    w_out = w_pad - 2 * PAD if col_off else w_pad

    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * TILE, TILE + 2 * PAD), :], scr, sem)
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, PAD:PAD + TILE, col_off:col_off + w_out]

    return lambda: pl.pallas_call(
        k,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TILE, w_out), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ROWS, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_planes, TILE + 2 * PAD, w_pad), jnp.float32),
                        pltpu.SemaphoreType.DMA])(x)


def main():
    print(f"devices: {jax.devices()}")
    # lane dim 512 (aligned), no column offset: pure "3D DMA mid-dim dynamic"
    attempt("dma3d_lane512_nocol", dma_case(2, 512, 0))
    # lane dim 640 (aligned), unaligned column slice
    attempt("dma3d_lane640_coloff", dma_case(2, 640, PAD))
    # lane dim 520 (NOT 128-multiple), no column offset
    attempt("dma3d_lane520_nocol", dma_case(2, 520, 0))
    # lane dim 520 + unaligned column slice (= the atrous shape)
    attempt("dma3d_lane520_coloff", dma_case(2, 520, PAD))
    # 8 planes like atrous
    attempt("dma3d_8planes_lane520_coloff", dma_case(8, 520, PAD))

    # VMEM-blocks-only with lane 520 (no DMA): is 520-lane VMEM itself ok?
    x520 = jnp.ones((ROWS, 520), jnp.float32)

    def k_520(x_ref, o_ref):
        o_ref[:] = x_ref[:, PAD:PAD + 512]

    attempt("vmem_block_lane520_slice", lambda: pl.pallas_call(
        k_520,
        grid=(ROWS // TILE,),
        in_specs=[pl.BlockSpec((TILE, 520), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 512), jnp.float32))(x520))


if __name__ == "__main__":
    main()
