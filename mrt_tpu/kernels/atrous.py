"""Halo-tiled Pallas kernel for the SVGF à-trous wavelet pass.

The XLA formulation (upscale/denoise._atrous_pass) materializes 25
shifted (H, W) windows of 5 padded planes per pass — each neighbor tap
re-reads the padded arrays from HBM. This kernel DMAs each row tile's
halo once into VMEM and computes all 25 taps from the resident tile:
one HBM read + one write per plane per pass (FramePresenter.swift:302-363
is the closed-source component this denoiser chain replaces; ROADMAP #4).

Layout: channel PLANES (C, H, W) so the tap arithmetic runs on (TILE, W)
slabs at full 128-lane width (W is the minor dim). Input is edge-padded
by the caller once per pass (pad = 2*step rows/cols); every tap slice is
then in-bounds and static.

Input planes (8): demod r/g/b, variance, normal x/y/z, depth.
Output planes (4): filtered r/g/b, filtered variance.

Weights match _atrous_pass exactly: B3 cross (1/16,1/4,3/8,1/4,1/16) per
axis, normal^32 edge stop, relative-depth exp, luminance exp with
sigma = 4*sqrt(var)+1e-4 from the CENTER pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LUMA_R, _LUMA_G, _LUMA_B = 0.2126, 0.7152, 0.0722
_B3 = ((-2, 1 / 16), (-1, 1 / 4), (0, 3 / 8), (1, 1 / 4), (2, 1 / 16))


def _kernel(in_hbm, out_ref, scratch, sem, *, step: int, tile: int,
            pad_r: int):
    """One row-tile of the à-trous pass. in_hbm: (8, Hp, Wp) padded planes
    in ANY/HBM; out_ref: (4, tile, W) VMEM block; scratch: (8, tile+2*pad_r,
    Wp). pad_r >= 2*step is the row halo, rounded so the DMA'd slice height
    tile+2*pad_r is a multiple of the f32 sublane tiling (8) — Mosaic
    rejects e.g. 12-row HBM->VMEM slices ("must be aligned to tiling (8)")."""
    pad = 2 * step
    i = pl.program_id(0)
    row0 = i * tile  # top of this tile's halo window in padded coords

    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(row0, tile + 2 * pad_r), :], scratch, sem)
    dma.start()
    dma.wait()

    w = out_ref.shape[2]

    def plane(c, dr, dc):
        return scratch[c, pad_r + dr : pad_r + dr + tile,
                       pad + dc : pad + dc + w]

    def luma(r, g, b):
        return _LUMA_R * r + _LUMA_G * g + _LUMA_B * b

    c_r, c_g, c_b = plane(0, 0, 0), plane(1, 0, 0), plane(2, 0, 0)
    c_var = plane(3, 0, 0)
    c_nx, c_ny, c_nz = plane(4, 0, 0), plane(5, 0, 0), plane(6, 0, 0)
    c_z = plane(7, 0, 0)
    c_lum = luma(c_r, c_g, c_b)
    sigma_l = jnp.sqrt(jnp.maximum(c_var, 0.0)) * 4.0 + 1e-4
    inv_sigma = 1.0 / sigma_l
    inv_z = 1.0 / (0.1 * jnp.maximum(c_z, 1e-3))

    acc_r = jnp.zeros_like(c_r)
    acc_g = jnp.zeros_like(c_r)
    acc_b = jnp.zeros_like(c_r)
    acc_v = jnp.zeros_like(c_r)
    wsum = jnp.zeros_like(c_r)
    for drb, wr in _B3:
        for dcb, wc in _B3:
            dr, dc = drb * step, dcb * step
            n_r, n_g, n_b = plane(0, dr, dc), plane(1, dr, dc), plane(2, dr, dc)
            n_v = plane(3, dr, dc)
            ndot = (plane(4, dr, dc) * c_nx + plane(5, dr, dc) * c_ny
                    + plane(6, dr, dc) * c_nz)
            w_n = jnp.clip(ndot, 0.0, 1.0) ** 32
            w_z = jnp.exp(-jnp.abs(plane(7, dr, dc) - c_z) * inv_z)
            w_l = jnp.exp(-jnp.abs(luma(n_r, n_g, n_b) - c_lum) * inv_sigma)
            wgt = (wr * wc) * w_n * w_z * w_l
            acc_r += n_r * wgt
            acc_g += n_g * wgt
            acc_b += n_b * wgt
            acc_v += n_v * wgt * wgt
            wsum += wgt
    out_ref[0] = acc_r / jnp.maximum(wsum, 1e-6)
    out_ref[1] = acc_g / jnp.maximum(wsum, 1e-6)
    out_ref[2] = acc_b / jnp.maximum(wsum, 1e-6)
    out_ref[3] = acc_v / jnp.maximum(wsum * wsum, 1e-6)


@functools.partial(jax.jit, static_argnames=("step", "tile", "interpret"))
def atrous_pass_pallas(demod, var, normal, depth, *, step: int,
                       tile: int = 64, interpret: bool = False):
    """One à-trous pass. demod (H,W,3), var (H,W), normal (H,W,3) decoded,
    depth (H,W) -> (filtered (H,W,3), filtered_var (H,W)). Matches
    upscale/denoise._atrous_pass (weights identical; summation order over
    the 25 taps identical; division folded into one reciprocal)."""
    h, w = var.shape
    pad = 2 * step
    planes = jnp.stack([
        demod[:, :, 0], demod[:, :, 1], demod[:, :, 2], var,
        normal[:, :, 0], normal[:, :, 1], normal[:, :, 2], depth,
    ])  # (8, H, W)
    n_tiles = pl.cdiv(h, tile)
    h_pad = n_tiles * tile
    # Mosaic alignment rules discovered on-device (PERF.md round 4f):
    # - the DMA'd VMEM scratch's LANE dim must be a multiple of 128 (e.g.
    #   520-lane scratch DMAs crash the remote compile; 512 and 640 fine —
    #   scripts/atrous_bisect3.py), and
    # - the DMA slice HEIGHT (sublane dim) must be a multiple of 8 (step=1's
    #   tile+4 rows -> "Slice shape along dimension 1 must be aligned to
    #   tiling (8)"). Round the row halo up to a multiple of 4 so
    #   tile+2*pad_r stays 8-aligned; the extra rows/columns are never read.
    pad_r = -(-pad // 4) * 4
    w_dma = -(-(w + 2 * pad) // 128) * 128
    planes = jnp.pad(planes, ((0, 0), (pad_r, pad_r + (h_pad - h)),
                              (pad, w_dma - w - pad)), mode="edge")

    out = pl.pallas_call(
        functools.partial(_kernel, step=step, tile=tile, pad_r=pad_r),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, tile, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, h_pad, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, tile + 2 * pad_r, w_dma), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(planes)
    filtered = jnp.stack([out[0, :h], out[1, :h], out[2, :h]], axis=-1)
    return filtered, out[3, :h]
