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
    history = jnp.zeros((16, 16, 4), jnp.float32)
    # first frame: history weight 0 -> pure upsampled current
    out, hist = temporal.temporal_upscale(color, depth, motion, history, 16, 16, history_weight=0.0)
    assert out.shape == (16, 16, 3)
    assert hist.shape == (16, 16, 4)
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
    h = np.zeros((8, 8, 4), np.float32)
    h[:, 4, :3] = 1.0
    h[:, :, 3] = 1.0  # history depth matches current -> no disocclusion
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


def test_temporal_depth_disocclusion_rejects_history():
    # identical setup to the reprojection test, but the history depth channel
    # disagrees with the current surface -> the depth test must reject it
    # (the depthTexture role, FramePresenter.swift:189,205)
    h = np.zeros((8, 8, 4), np.float32)
    h[:, 4, :3] = 1.0
    h[:, :, 3] = 5.0  # stale surface far behind the current one
    c = np.full((8, 8, 3), 0.2, np.float32)
    c[:, 6] = 0.6
    c[:, 2] = 0.6
    motion = jnp.zeros((8, 8, 2), jnp.float32).at[:, :, 0].set(2.0)
    depth = jnp.ones((8, 8), jnp.float32)
    out, _ = temporal.temporal_upscale(jnp.asarray(c), depth, motion, jnp.asarray(h), 8, 8)
    o = np.asarray(out)
    # with history rejected, columns 6 and 2 are indistinguishable
    np.testing.assert_allclose(o[:, 6], o[:, 2], atol=1e-5)


def test_presenter_history_cleared_on_orbit():
    """Ghosting regression: an orbit resets accumulation AND the output-res
    upscale history, so the first presented frame after the orbit equals a
    history-free present of the same buffers."""
    from mrt_tpu.engine.renderer import UPSCALER_TEMPORAL, Renderer
    from mrt_tpu.engine.scene import Model, Scene

    scene = Scene(width=32, height=32)
    scene.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5),
                    Model("plane", scale=6)]
    r = Renderer(scene, output_width=32, output_height=32)
    r.upscaler_mode = UPSCALER_TEMPORAL
    r.samples_per_pixel = 1
    r.max_bounces = 1
    for _ in range(3):
        r.draw()
        r.output_image()
    assert getattr(r, "_upscale_history", None) is not None
    r.orbit(200.0, 0.0)  # mid-sequence camera move
    assert getattr(r, "_upscale_history", None) is None  # history dropped
    r.draw()
    img_after = r.output_image()
    # a second renderer-free present of the same frame with no history at all
    r._clear_presenter_history()
    img_fresh = r.output_image()
    np.testing.assert_array_equal(img_after, img_fresh)


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


def _flat_gbuffer(h, w, albedo=0.5):
    return dict(
        diffuse_albedo=jnp.full((h, w, 3), albedo, jnp.float32),
        specular_albedo=jnp.zeros((h, w, 3), jnp.float32),
        normal=jnp.full((h, w, 3), 0.5, jnp.float32).at[:, :, 1].set(1.0),
        roughness=jnp.ones((h, w), jnp.float32),
    )


def test_svgf_reduces_rmse_on_noisy_input():
    """SVGF-lite must beat the noisy 1-spp input against the clean signal
    (VERDICT round-1 ask: an RMSE-improvement assertion for the denoiser)."""
    rng = np.random.default_rng(3)
    h = w = 24
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = np.stack([0.2 + 0.6 * xx / w, 0.3 + 0.4 * yy / h, np.full((h, w), 0.5)], -1)
    clean = clean.astype(np.float32) * 0.5  # modulated by albedo 0.5
    gbuffer = _flat_gbuffer(h, w)
    depth = jnp.ones((h, w), jnp.float32)
    motion = jnp.zeros((h, w, 2), jnp.float32)

    state = denoise.init_state(h, w)
    rmse_noisy = []
    for _ in range(6):
        noisy = clean * rng.exponential(1.0, (h, w, 3)).astype(np.float32)
        rmse_noisy.append(np.sqrt(((noisy - clean) ** 2).mean()))
        out, state = denoise.svgf_filter(jnp.asarray(noisy), gbuffer, depth, motion, state)
    rmse_out = np.sqrt((np.asarray(out - clean) ** 2).mean())
    assert rmse_out < 0.5 * np.mean(rmse_noisy), (rmse_out, np.mean(rmse_noisy))
    # brightness roughly preserved
    np.testing.assert_allclose(np.asarray(out).mean(), clean.mean(), rtol=0.25)


def test_svgf_disocclusion_resets_history():
    h = w = 8
    gbuffer = _flat_gbuffer(h, w)
    motion = jnp.zeros((h, w, 2), jnp.float32)
    color = jnp.full((h, w, 3), 0.25, jnp.float32)
    state = denoise.init_state(h, w)
    for _ in range(4):
        _, state = denoise.svgf_filter(color, gbuffer, jnp.ones((h, w)), motion, state)
    assert np.asarray(state.history_length).min() >= 4
    # depth jumps -> history invalid -> length back to 1
    _, state = denoise.svgf_filter(color, gbuffer, jnp.full((h, w), 3.0), motion, state)
    np.testing.assert_array_equal(np.asarray(state.history_length), 1.0)


def test_reinhard_tonemap():
    c = jnp.asarray([0.0, 1.0, 3.0, 1e6])
    out = np.asarray(reinhard_tonemap(c))
    np.testing.assert_allclose(out, [0.0, 0.5, 0.75, 1.0], atol=1e-4)


def test_bilinear_packed_quad_matches_naive_taps():
    """The round-4j one-gather packed-quad bilinear must be BIT-identical to
    the naive four-indexed-reads formulation (same taps, same blend order),
    including at the clamped image edges and out-of-bounds coordinates."""
    import jax.numpy as jnp
    import numpy as np

    from mrt_tpu.upscale.temporal import bilinear_sample

    def naive(img, rows, cols):
        h, w = img.shape[0], img.shape[1]
        in_bounds = (rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1)
        r = jnp.clip(rows, 0.0, h - 1.0)
        c = jnp.clip(cols, 0.0, w - 1.0)
        r0 = jnp.floor(r)
        c0 = jnp.floor(c)
        fr = (r - r0)[..., None]
        fc = (c - c0)[..., None]
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)
        r1i = jnp.minimum(r0i + 1, h - 1)
        c1i = jnp.minimum(c0i + 1, w - 1)
        v00 = img[r0i, c0i]
        v01 = img[r0i, c1i]
        v10 = img[r1i, c0i]
        v11 = img[r1i, c1i]
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        return top * (1 - fr) + bot * fr, in_bounds

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(17, 23, 4)).astype(np.float32))
    rows = jnp.asarray(rng.uniform(-3, 20, size=(9, 13)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(-3, 26, size=(9, 13)).astype(np.float32))
    got, got_ok = bilinear_sample(img, rows, cols)
    want, want_ok = naive(img, rows, cols)
    assert (np.asarray(got) == np.asarray(want)).all()
    assert (np.asarray(got_ok) == np.asarray(want_ok)).all()
