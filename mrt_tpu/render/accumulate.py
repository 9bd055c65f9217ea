"""Temporal accumulation — EMA blend with history, motion-adaptive weight
(Raytracing.metal:796-817). The accumulation buffer pair lives as a device
array passed through the jitted frame step (the ping-pong texture analog,
Renderer.swift:1492-1494); "reset accumulation" = frame_index 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import types as T


def accumulate(
    settings: T.RenderSettings,
    uniforms: T.FrameUniforms,
    color: jnp.ndarray,  # (..., 3) this frame's averaged radiance
    motion: jnp.ndarray,  # (..., 2) this frame's motion (pixels)
    prev_motion: jnp.ndarray,  # (..., 2) previous frame's motion
    prev_accum: jnp.ndarray,  # (..., 3) history
) -> jnp.ndarray:
    history_weight = jnp.clip(uniforms.accumulation_weight, 0.0, 0.95)
    if settings.enable_motion_adaptive_accumulation:
        motion_mag = jnp.maximum(
            jnp.linalg.norm(motion, axis=-1), jnp.linalg.norm(prev_motion, axis=-1)
        )
        low = jnp.maximum(uniforms.motion_accum_low_px, 0.0)
        high = jnp.maximum(uniforms.motion_accum_high_px, low + 1e-3)
        t = jnp.clip((motion_mag - low) / (high - low), 0.0, 1.0)
        min_weight = jnp.clip(uniforms.motion_accum_min_weight, 0.0, 0.95)
        min_weight = jnp.minimum(min_weight, history_weight)
        history_weight = history_weight + (min_weight - history_weight) * t
        history_weight = history_weight[..., None]
    blended = color + (prev_accum - color) * history_weight
    return jnp.where(uniforms.frame_index > 0, blended, color)
