"""Denoiser — the MetalFX ``MTLFXTemporalDenoisedScaler`` stand-in
(FramePresenter.swift:302-363 with the G-buffer inputs the kernel exports at
Raytracing.metal:506-515,824-829): albedo demodulation, edge-aware spatial
filter guided by normal/roughness, remodulation. Runs before the temporal
upscaler in the denoised mode chain (denoised > temporal > spatial priority,
FramePresenter.swift:381-403).
"""

from __future__ import annotations

import jax.numpy as jnp


def demodulate_filter(color: jnp.ndarray, gbuffer: dict, radius: int = 2) -> jnp.ndarray:
    """color: (H,W,3). gbuffer: dict with diffuse_albedo/specular_albedo/
    normal (encoded *0.5+0.5)/roughness. Returns filtered (H,W,3)."""
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
