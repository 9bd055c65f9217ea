"""Presenter — upscale + tonemap + image-sink, replacing the FramePresenter
protocol + full-screen blit (FramePresenter.swift:528-547, Shaders.metal:30-52).

There is no swapchain on TPU: "present" = produce a uint8 image (PNG/stream).
The scaler priority chain denoised > temporal > spatial mirrors
FramePresenter.swift:381-403. The denoised chain is SVGF-lite at render res
(denoise.py) feeding the temporal upscaler — the single-object analog of
``MTLFXTemporalDenoisedScaler`` (FramePresenter.swift:302-363).

History lifecycle: the renderer clears ``_upscale_history`` and
``_denoise_state`` whenever accumulation restarts (``frame_index = 0``), so a
camera orbit or knob change cannot ghost stale output-res history into the
new view — the didSet reset idiom extended to presenter state.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.present import tonemap_quantize
from . import denoise, spatial, temporal


@partial(jax.jit, static_argnums=(1, 2, 3))
def _present_spatial(color, out_h, out_w, method):
    up = spatial.upscale(color, out_h, out_w, method=method)
    return tonemap_quantize(up)  # fused Pallas tonemap+quantize on TPU


@partial(jax.jit, static_argnums=(5, 6))
def _present_temporal(color, depth, motion, history, history_weight, out_h, out_w):
    up, new_history = temporal.temporal_upscale(
        color, depth, motion, history, out_h, out_w, history_weight=history_weight
    )
    return tonemap_quantize(up), new_history


@partial(jax.jit, static_argnums=(7, 8))
def _present_denoised(color, gbuffer, depth, motion, dstate, history, history_weight,
                      out_h, out_w):
    den, new_dstate = denoise.svgf_filter(color, gbuffer, depth, motion, dstate)
    up, new_history = temporal.temporal_upscale(
        den, depth, motion, history, out_h, out_w, history_weight=history_weight
    )
    return tonemap_quantize(up), new_history, new_dstate


def present_device(renderer) -> jnp.ndarray:
    """Device-side present: upscale + tonemap + quantize, returning the uint8
    image ON DEVICE (texture row order, not yet flipped). The interactive
    frame loop uses this so presenting does not force a host sync — the
    frames-in-flight analog of the reference's triple-buffered drawable
    (Renderer.swift:207,1405-1503): the host may prepare and dispatch frame
    N+1 while the device is still rendering/presenting frame N. Use
    ``present`` when the pixels are actually needed on host."""
    from ..engine import renderer as R

    mode = renderer.upscaler_mode
    out_h, out_w = renderer.output_height, renderer.output_width

    if mode in (R.UPSCALER_TEMPORAL, R.UPSCALER_DENOISED):
        color = renderer.accum
        history = getattr(renderer, "_upscale_history", None)
        fresh = history is None or history.shape != (out_h, out_w, 4)
        if fresh:
            history = jnp.zeros((out_h, out_w, 4), jnp.float32)
        # first frame after a reset contributes fully; afterwards the blend
        # follows the renderer's accumulation weight (Renderer.swift:117)
        weight = jnp.asarray(
            0.0 if fresh else float(renderer.accumulation_weight), jnp.float32
        )
        if mode == R.UPSCALER_DENOISED and renderer.gbuffer is not None:
            h, w = color.shape[0], color.shape[1]
            dstate = getattr(renderer, "_denoise_state", None)
            if dstate is None or dstate.demod.shape != (h, w, 3):
                dstate = denoise.init_state(h, w)
            img, new_history, new_dstate = _present_denoised(
                color, renderer.gbuffer, renderer.depth, renderer.motion,
                dstate, history, weight, out_h, out_w,
            )
            object.__setattr__(renderer, "_denoise_state", new_dstate)
        else:
            img, new_history = _present_temporal(
                color, renderer.depth, renderer.motion, history, weight, out_h, out_w
            )
        object.__setattr__(renderer, "_upscale_history", new_history)
    else:
        img = _present_spatial(renderer.accum, out_h, out_w, "lanczos3")

    return img


def present(renderer) -> np.ndarray:
    """Tonemapped uint8 RGB at output resolution, on host. Rows are flipped so
    row 0 is the top of the image (the render buffer is in texture order:
    row 0 has uv.y = -1, which the reference's blit quad places at the screen
    bottom)."""
    return np.asarray(present_device(renderer))[::-1]


def write_png(path: str, image_u8: np.ndarray):
    from PIL import Image

    Image.fromarray(image_u8, "RGB").save(path)
