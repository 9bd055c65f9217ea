"""Denoiser — the MetalFX ``MTLFXTemporalDenoisedScaler`` replacement
(FramePresenter.swift:302-363 with the G-buffer inputs the kernel exports at
Raytracing.metal:506-515,824-829).

SVGF-lite: albedo demodulation, motion-reprojected temporal accumulation of
the demodulated signal with depth/normal validity tests, per-pixel luminance
moments -> variance estimate, variance-guided edge-aware à-trous wavelet
filtering, remodulation. Runs at render resolution before the temporal
upscaler in the denoised chain (denoised > temporal > spatial priority,
FramePresenter.swift:381-403).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .temporal import bilinear_sample

_LUMA = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)

# à-trous backend: XLA only. A halo-tiled Pallas kernel (one VMEM-resident
# DMA per row tile, all 25 taps computed resident) was built, debugged
# through two Mosaic alignment failures, and measured on TPU: it LOSES
# 2.2x to this XLA formulation at 540x960 (0.381 vs 0.174 ms/pass, honest
# 40-pass chained slope) and OOMs scoped VMEM at 1080p — XLA's fusion of
# the 25 shifted windows is already the right TPU program. PERF.md round
# 4f; the kernel lives in git history (kernels/atrous.py, deleted).


class DenoiseState(NamedTuple):
    """Temporal state at render resolution."""

    demod: jnp.ndarray  # (h,w,3) integrated demodulated radiance
    m1: jnp.ndarray  # (h,w) integrated luminance
    m2: jnp.ndarray  # (h,w) integrated luminance^2
    history_length: jnp.ndarray  # (h,w) frames accumulated (capped)
    depth: jnp.ndarray  # (h,w) last frame's depth
    normal: jnp.ndarray  # (h,w,3) last frame's shading normal (decoded)


def init_state(h: int, w: int) -> DenoiseState:
    return DenoiseState(
        demod=jnp.zeros((h, w, 3), jnp.float32),
        m1=jnp.zeros((h, w), jnp.float32),
        m2=jnp.zeros((h, w), jnp.float32),
        history_length=jnp.zeros((h, w), jnp.float32),
        depth=jnp.full((h, w), 1.0e8, jnp.float32),
        normal=jnp.zeros((h, w, 3), jnp.float32),
    )


def _atrous_pass(demod, var, lum, normal, depth, step: int, h: int, w: int):
    """One edge-aware à-trous pass (5-tap B3 cross per axis, dilation=step)."""
    taps = [(-2 * step, 1 / 16), (-step, 1 / 4), (0, 3 / 8), (step, 1 / 4), (2 * step, 1 / 16)]
    sigma_l = jnp.sqrt(jnp.maximum(var, 0.0)) * 4.0 + 1e-4
    acc = jnp.zeros_like(demod)
    acc_var = jnp.zeros_like(var)
    wsum = jnp.zeros_like(var)
    pad = 2 * step
    dp = jnp.pad(demod, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    vp = jnp.pad(var, ((pad, pad), (pad, pad)), mode="edge")
    lp = jnp.pad(lum, ((pad, pad), (pad, pad)), mode="edge")
    np_ = jnp.pad(normal, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    zp = jnp.pad(depth, ((pad, pad), (pad, pad)), mode="edge")
    for dr, wr in taps:
        for dc, wc in taps:
            r0 = pad + dr
            c0 = pad + dc
            nb = dp[r0 : r0 + h, c0 : c0 + w]
            nv = vp[r0 : r0 + h, c0 : c0 + w]
            nl = lp[r0 : r0 + h, c0 : c0 + w]
            nn = np_[r0 : r0 + h, c0 : c0 + w]
            nz = zp[r0 : r0 + h, c0 : c0 + w]
            w_n = jnp.clip(jnp.sum(nn * normal, axis=-1), 0.0, 1.0) ** 32
            w_z = jnp.exp(-jnp.abs(nz - depth) / (0.1 * jnp.maximum(depth, 1e-3)))
            w_l = jnp.exp(-jnp.abs(nl - lum) / sigma_l)
            wgt = (wr * wc) * w_n * w_z * w_l
            acc = acc + nb * wgt[..., None]
            acc_var = acc_var + nv * wgt * wgt
            wsum = wsum + wgt
    out = acc / jnp.maximum(wsum[..., None], 1e-6)
    out_var = acc_var / jnp.maximum(wsum * wsum, 1e-6)
    return out, out_var


def svgf_filter(
    color: jnp.ndarray,  # (h,w,3) current-frame radiance (1..few spp)
    gbuffer: dict,  # diffuse_albedo/specular_albedo/normal(enc)/roughness
    depth: jnp.ndarray,  # (h,w)
    motion: jnp.ndarray,  # (h,w,2) pixels, +Y down (display)
    state: DenoiseState,
    n_passes: int = 3,
):
    """Returns (denoised color (h,w,3), new DenoiseState)."""
    h, w = color.shape[0], color.shape[1]
    albedo = jnp.maximum(gbuffer["diffuse_albedo"] + gbuffer["specular_albedo"], 1e-3)
    normal = gbuffer["normal"] * 2.0 - 1.0
    demod = color / albedo
    lum = demod @ _LUMA

    # --- temporal reprojection (display +Y down == -row, see temporal.py) ----
    out_rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    out_cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    prev_r = out_rows + motion[..., 1]
    prev_c = out_cols - motion[..., 0]
    # ONE packed-quad bilinear gather for all six temporal-state fields
    # (docs/PERF.md round 4k): the six separate samples compiled to 12
    # per-pixel HBM-rate row gathers — ~200 ms/frame at the config-5 render
    # res. Packing the whole DenoiseState into a 10-channel image makes the
    # reprojection a single row gather per pixel (the same transform round
    # 4j applied to the temporal upscaler); per-field taps and blend
    # arithmetic are unchanged, so every field is bit-identical.
    packed = jnp.concatenate(
        [
            state.demod,
            state.m1[..., None],
            state.m2[..., None],
            state.history_length[..., None],
            state.depth[..., None],
            state.normal,
        ],
        axis=-1,
    )
    prev, in_b = bilinear_sample(packed, prev_r, prev_c)
    prev_demod = prev[..., 0:3]
    prev_m1 = prev[..., 3]
    prev_m2 = prev[..., 4]
    prev_len = prev[..., 5]
    prev_depth = prev[..., 6]
    prev_normal = prev[..., 7:10]

    depth_ok = jnp.abs(prev_depth - depth) <= 0.1 * jnp.maximum(depth, 1e-3)
    normal_ok = jnp.sum(prev_normal * normal, axis=-1) > 0.8
    valid = in_b & depth_ok & normal_ok

    hist_len = jnp.where(valid, jnp.minimum(prev_len + 1.0, 32.0), 1.0)
    alpha = jnp.maximum(1.0 / hist_len, 0.2)

    demod_i = jnp.where(
        valid[..., None], prev_demod + (demod - prev_demod) * alpha[..., None], demod
    )
    m1 = jnp.where(valid, prev_m1 + (lum - prev_m1) * alpha, lum)
    m2 = jnp.where(valid, prev_m2 + (lum * lum - prev_m2) * alpha, lum * lum)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    # young pixels have unreliable moments: inflate variance so the spatial
    # filter works harder until history builds up
    var = var * jnp.clip(4.0 / hist_len, 1.0, 4.0)

    new_state = DenoiseState(
        demod=demod_i, m1=m1, m2=m2, history_length=hist_len,
        depth=depth, normal=normal,
    )

    # --- variance-guided à-trous wavelet filtering ---------------------------
    filtered = demod_i
    fvar = var
    flum = filtered @ _LUMA
    for i in range(n_passes):
        filtered, fvar = _atrous_pass(filtered, fvar, flum, normal, depth, 1 << i, h, w)
        flum = filtered @ _LUMA

    return filtered * albedo, new_state


def demodulate_filter(color: jnp.ndarray, gbuffer: dict, radius: int = 2) -> jnp.ndarray:
    """Single-frame fallback (no temporal state): albedo demodulation +
    edge-aware cross-bilateral, remodulation. Kept for stateless callers."""
    albedo = gbuffer["diffuse_albedo"] + gbuffer["specular_albedo"]
    albedo = jnp.maximum(albedo, 1e-3)
    normal = gbuffer["normal"] * 2.0 - 1.0

    demod = color / albedo

    h, w = color.shape[0], color.shape[1]
    acc = jnp.zeros_like(demod)
    wsum = jnp.zeros((h, w, 1), demod.dtype)
    pad = radius
    demod_p = jnp.pad(demod, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    normal_p = jnp.pad(normal, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            nb = demod_p[pad + dr : pad + dr + h, pad + dc : pad + dc + w]
            nn = normal_p[pad + dr : pad + dr + h, pad + dc : pad + dc + w]
            w_spatial = jnp.exp(-(dr * dr + dc * dc) / (2.0 * radius * radius))
            n_dot = jnp.clip(jnp.sum(nn * normal, axis=-1, keepdims=True), 0.0, 1.0)
            w_normal = n_dot**8
            wgt = w_spatial * w_normal
            acc = acc + nb * wgt
            wsum = wsum + wgt
    filtered = acc / jnp.maximum(wsum, 1e-6)
    return filtered * albedo
