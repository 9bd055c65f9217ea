"""Spatial upscaler — the MetalFX ``MTLFXSpatialScaler`` replacement
(FramePresenter.swift:40-101,302-363). Pure JAX resampling (Lanczos-3 by
default, bilinear optional); runs on-device and fuses with the tonemap."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upscale(color: jnp.ndarray, out_height: int, out_width: int, method: str = "lanczos3") -> jnp.ndarray:
    """color: (H,W,3) linear radiance -> (out_height,out_width,3)."""
    if color.shape[0] == out_height and color.shape[1] == out_width:
        return color
    out = jax.image.resize(color, (out_height, out_width, color.shape[2]), method=method)
    # Lanczos ringing can undershoot below zero; radiance must stay >= 0.
    return jnp.maximum(out, 0.0)
