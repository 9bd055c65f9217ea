"""Upscaler chain tests (the MetalFX-replacement stack, FramePresenter analog)."""

import jax.numpy as jnp
import numpy as np

from mrt_tpu.render.shade import reinhard_tonemap
from mrt_tpu.upscale import denoise, spatial, temporal


def test_spatial_identity_when_same_size():
    img = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)), jnp.float32)
    out = spatial.upscale(img, 16, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_spatial_upscale_preserves_flat_regions():
    img = jnp.full((8, 8, 3), 0.25, jnp.float32)
    out = np.asarray(spatial.upscale(img, 16, 16))
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out, 0.25, atol=1e-3)
    assert (out >= 0).all()  # no ringing undershoot


def test_temporal_static_scene_converges_to_current():
    rng = np.random.default_rng(1)
    color = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
    depth = jnp.ones((8, 8), jnp.float32)
    motion = jnp.zeros((8, 8, 2), jnp.float32)
    history = jnp.zeros((16, 16, 3), jnp.float32)
    # first frame: history weight 0 -> pure upsampled current
    out, hist = temporal.temporal_upscale(color, depth, motion, history, 16, 16, history_weight=0.0)
    assert out.shape == (16, 16, 3)
    up = np.asarray(spatial.upscale(color, 16, 16, method="bilinear"))
    np.testing.assert_allclose(np.asarray(out), up, atol=1e-5)
    # feeding history back with a static scene is stable and stays near current
    for _ in range(5):
        out, hist = temporal.temporal_upscale(color, depth, motion, hist, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), up, atol=0.1)


def test_temporal_reprojection_shifts_history():
    # history has a bright column at 4; motion says +2px right. Current frame
    # carries structure (bright column at 6) so the neighborhood clamp admits
    # the reprojected history there: history must REINFORCE column 6.
    h = np.zeros((8, 8, 3), np.float32)
    h[:, 4] = 1.0
    history = jnp.asarray(h)
    c = np.full((8, 8, 3), 0.2, np.float32)
    c[:, 6] = 0.6
    c[:, 2] = 0.6  # control column: same current value, no history behind it
    color = jnp.asarray(c)
    motion = jnp.zeros((8, 8, 2), jnp.float32).at[:, :, 0].set(2.0)
    depth = jnp.ones((8, 8), jnp.float32)
    out, _ = temporal.temporal_upscale(color, depth, motion, history, 8, 8)
    o = np.asarray(out)
    # reprojected history (bright col 4 shifted to 6) boosts column 6 over the
    # structurally-identical control column 2
    assert o[:, 6].mean() > o[:, 2].mean() + 0.05


def test_denoiser_smooths_but_preserves_albedo():
    rng = np.random.default_rng(2)
    h = w = 16
    albedo = np.full((h, w, 3), 0.5, np.float32)
    noise = rng.random((h, w, 3)).astype(np.float32)
    gbuffer = dict(
        diffuse_albedo=jnp.asarray(albedo),
        specular_albedo=jnp.zeros((h, w, 3), jnp.float32),
        normal=jnp.full((h, w, 3), 0.5, jnp.float32).at[:, :, 1].set(1.0),  # flat normals
        roughness=jnp.ones((h, w), jnp.float32),
    )
    color = jnp.asarray(albedo * noise)
    out = np.asarray(denoise.demodulate_filter(color, gbuffer))
    # variance reduced
    assert out.std() < np.asarray(color).std() * 0.6
    # mean brightness preserved (demodulate/remodulate round trip)
    np.testing.assert_allclose(out.mean(), np.asarray(color).mean(), rtol=0.1)


def test_reinhard_tonemap():
    c = jnp.asarray([0.0, 1.0, 3.0, 1e6])
    out = np.asarray(reinhard_tonemap(c))
    np.testing.assert_allclose(out, [0.0, 0.5, 0.75, 1.0], atol=1e-4)
