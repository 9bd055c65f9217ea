"""Temporal upscaler — the MetalFX ``MTLFXTemporalScaler`` replacement
(FramePresenter.swift:302-363): history reprojection through the motion/depth
targets the render kernel already produces (color rgba16F, depth r32F, motion
rg16F input contract, FramePresenter.swift:319-337).

The camera's per-frame Halton AA jitter (Raytracing.metal:272-275) makes
successive frames sample different sub-pixel positions, so blending the
reprojected history at output resolution reconstructs detail above render
resolution — the same principle MetalFX relies on.

Motion convention (Raytracing.metal:378-387): pixels, +X right, +Y down in
*display* space; render rows store v bottom-up, so a +Y (downward) motion is
a -row motion. Reprojection therefore samples history at row + motion.y.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray):
    """Sample (H,W,C) at fractional (rows, cols); clamp addressing.
    Returns (vals, in_bounds_mask).

    TPU codegen (docs/PERF.md round 4j): XLA gather cost is per ROW, nearly
    width-independent to 128 f32 — the naive four-tap formulation compiled
    to TWO per-pixel row gathers (taps sharing a row fuse into one) at the
    ~8.7 ns/row HBM rate, 16 ms/frame at 720p output. Packing the 2x2 tap
    quad into ONE wide row of a shifted-copy table makes the whole bilinear
    sample a single gather — and because the packed table is born as an
    in-program intermediate, XLA's memory-space assignment may serve it
    from VMEM at the ~1.6 ns/row in-frame rate when it fits. Taps and
    blend arithmetic are unchanged — output is bit-identical to the
    four-indexed-reads form.
    """
    h, w = img.shape[0], img.shape[1]
    c_ch = img.shape[2]
    in_bounds = (rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1)
    r = jnp.clip(rows, 0.0, h - 1.0)
    c = jnp.clip(cols, 0.0, w - 1.0)
    r0 = jnp.floor(r)
    c0 = jnp.floor(c)
    fr = (r - r0)[..., None]
    fc = (c - c0)[..., None]
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    # Shifted copies with edge clamp reproduce the min(+1, end) taps: the
    # packed row at (r0, c0) is [v00 | v01 | v10 | v11].
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    quad = jnp.concatenate([img, right, down, down_right], axis=-1)
    flat = quad.reshape(h * w, 4 * c_ch)
    taps = jnp.take(flat, r0i * w + c0i, axis=0)
    shape = r0i.shape + (c_ch,)
    v00 = taps[..., 0 * c_ch : 1 * c_ch].reshape(shape)
    v01 = taps[..., 1 * c_ch : 2 * c_ch].reshape(shape)
    v10 = taps[..., 2 * c_ch : 3 * c_ch].reshape(shape)
    v11 = taps[..., 3 * c_ch : 4 * c_ch].reshape(shape)
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr) + bot * fr, in_bounds


def temporal_upscale(
    color: jnp.ndarray,  # (h,w,3) render-res radiance
    depth: jnp.ndarray,  # (h,w)
    motion: jnp.ndarray,  # (h,w,2) pixels at render res, +Y down (display)
    history: jnp.ndarray,  # (H,W,4) output-res history: rgb + depth
    out_h: int,
    out_w: int,
    history_weight=0.9,  # scalar; pass 0.0 on the first frame / history reset
):
    """Returns (output (H,W,3), new_history (H,W,4)).

    History carries last frame's depth so reprojection can reject
    disocclusions: a history texel whose stored depth disagrees with the
    current surface is stale background/foreground, not the same surface —
    the role of the ``depthTexture`` input MetalFX declares for its temporal
    scalers (FramePresenter.swift:189,205,319-337).
    """
    h, w = color.shape[0], color.shape[1]
    sy = out_h / h
    sx = out_w / w

    # Upsample current color + depth + motion to output res. These are
    # FIXED-ratio resamples: jax.image.resize lowers to convolutions instead
    # of 8M+ per-pixel gathers (measured seconds per 4K frame, PERF.md r2).
    import jax

    cur = jax.image.resize(color, (out_h, out_w, 3), method="bilinear")
    dep = jax.image.resize(depth[..., None], (out_h, out_w, 1), method="bilinear")
    mot = jax.image.resize(motion, (out_h, out_w, 2), method="bilinear")
    mot = mot * jnp.asarray([sx, sy], jnp.float32)  # motion in output pixels

    # Reproject history: display +Y down == -row in our bottom-up buffers.
    out_rows = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    out_cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    prev_r = out_rows + mot[..., 1]
    prev_c = out_cols - mot[..., 0]
    hist4, valid = bilinear_sample(history, prev_r, prev_c)
    hist = hist4[..., :3]
    hist_depth = hist4[..., 3:4]

    # Depth disocclusion: reject history whose stored depth disagrees with
    # the current surface by more than 10% (relative; both are view-space
    # distances from the primary-hit depth target, Raytracing.metal:355).
    depth_ok = jnp.abs(hist_depth - dep) <= 0.1 * jnp.maximum(dep, 1e-3)

    # Neighborhood clamp (3x3 min/max of current) suppresses residual ghosting.
    pad = jnp.pad(cur, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack(
        [pad[dr : dr + out_h, dc : dc + out_w] for dr in range(3) for dc in range(3)]
    )
    nmin = stack.min(axis=0)
    nmax = stack.max(axis=0)
    hist = jnp.clip(hist, nmin, nmax)

    # Motion-aware blend: fast motion trusts current frame more.
    mag = jnp.linalg.norm(mot, axis=-1, keepdims=True)
    weight = history_weight * jnp.clip(1.0 - mag / 16.0, 0.25, 1.0)
    weight = jnp.where(valid[..., None] & depth_ok, weight, 0.0)
    out = cur + (hist - cur) * weight
    return out, jnp.concatenate([out, dep], axis=-1)
