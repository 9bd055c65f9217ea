"""Auxiliary engine subsystems: environment light, checkpoint/resume, stats,
view presets (SURVEY.md §5 coverage)."""

import numpy as np
import pytest

from mrt_tpu.assets import hdr
from mrt_tpu.engine import checkpoint
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _renderer(size=48, env=None):
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    if env is not None:
        scene.set_environment(env, intensity=1.0)
    r = Renderer(scene, output_width=size, output_height=size)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    return r


def test_environment_light_brightens_miss_pixels():
    sky = hdr.procedural_sky(16, 32, sun_sharpness=50.0)
    r_dark = _renderer()
    r_sky = _renderer(env=sky)
    assert not r_dark.statics.has_environment
    assert r_sky.statics.has_environment
    a = np.asarray(r_dark.draw())
    b = np.asarray(r_sky.draw())
    # miss pixels (upper rows in texture order are sky here) must be lit now
    assert b.mean() > a.mean() + 0.01
    assert np.isfinite(b).all()


def test_procedural_sky_properties():
    sky = hdr.procedural_sky(32, 64)
    assert sky.shape == (32, 64, 3)
    assert np.isfinite(sky).all() and (sky >= 0).all()
    # zenith bluer than ground
    assert sky[0, :, 2].mean() > sky[-1, :, 2].mean()


def test_hdr_decoder_flat_scanlines(tmp_path):
    # Write a tiny flat (non-RLE) RGBE file and read it back.
    h, w = 2, 4
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 128  # r mantissa
    rgbe[..., 3] = 129  # exponent -> scale 2^(129-136) = 1/128 -> r ~ 1.0
    p = tmp_path / "t.hdr"
    p.write_bytes(header + rgbe.tobytes())
    img = hdr.load_hdr(str(p))
    assert img is not None and img.shape == (h, w, 3)
    np.testing.assert_allclose(img[..., 0], (128 + 0.5) / 128, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    r = _renderer()
    for _ in range(3):
        r.draw()
    r.orbit(120.0, 30.0)
    r.draw()
    path = str(tmp_path / "state.npz")
    checkpoint.save(r, path)
    want_accum = np.asarray(r.accum)
    want_frame = r.frame_index

    r2 = _renderer()
    checkpoint.restore(r2, path)
    np.testing.assert_array_equal(np.asarray(r2.accum), want_accum)
    assert r2.frame_index == want_frame
    assert r2.camera_azimuth == r.camera_azimuth
    # resumed render continues identically to the original
    a = np.asarray(r.draw())
    b = np.asarray(r2.draw())
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_checkpoint_shape_mismatch_raises(tmp_path):
    r = _renderer(48)
    r.draw()
    path = str(tmp_path / "s.npz")
    checkpoint.save(r, path)
    r2 = _renderer(32)
    with pytest.raises(ValueError):
        checkpoint.restore(r2, path)


def test_frame_stats():
    r = _renderer()
    for _ in range(3):
        r.draw()
    rep = r.stats.report()
    assert rep["frames"] == 3
    assert rep["total_rays"] > 0
    assert rep["frame_ms"] is None or rep["frame_ms"] > 0


def test_frame_stats_no_int32_overflow():
    """total_rays must stay exact past 2^31: the deferred device counters are
    int32 (x64 off), so summing them ON DEVICE would wrap after ~60 1080p
    frames; report() must sum on host in int64."""
    import jax.numpy as jnp

    from mrt_tpu.engine.renderer import FrameStats

    st = FrameStats()
    for _ in range(3):
        st.record(jnp.asarray(2_000_000_000, jnp.int32))
    rep = st.report()
    assert rep["total_rays"] == 6_000_000_000
    # the >=1024 collapse path must also stay exact and mixable with scalars
    st2 = FrameStats()
    for _ in range(1025):
        st2.record(jnp.asarray(2_000_000_000, jnp.int32))
    assert st2.report()["total_rays"] == 1025 * 2_000_000_000


def test_view_presets():
    r = _renderer()
    r.draw()
    r.apply_view_preset("isometric")
    assert r.frame_index == 0
    assert r.camera_azimuth == pytest.approx(np.pi / 4)
    r.apply_view_preset("top")
    assert r.camera_elevation == pytest.approx(r.camera_elevation_limit)
    img = np.asarray(r.draw())
    assert np.isfinite(img).all()


def test_tps_camera_mode_follows_player():
    r = _renderer()
    r.view_mode = "tps"
    r.player_model_index = 0
    r.draw()
    t0 = r.camera_target.copy()
    # orbit is disabled in TPS (Renderer.swift:1328-1329)
    az = r.camera_azimuth
    r.orbit(100.0, 0.0)
    assert r.camera_azimuth == az
    # moving the player moves the camera target
    r.scene.move_model(0, forward=0.5)
    r.draw()
    assert not np.allclose(r.camera_target, t0)
    r.view_mode = "world"


def test_zoom_clamps_to_distance_limits():
    r = _renderer()
    for _ in range(50):
        r.zoom(0.9)  # zoom in hard
    assert r.camera_distance >= r.min_camera_distance
    for _ in range(50):
        r.zoom(-5.0)
    assert r.camera_distance <= r.max_camera_distance


def test_bench_schema():
    """bench.py must keep printing the driver's JSON schema."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench

    r = bench.build_renderer(32, 32)
    assert r.samples_per_pixel == 2 and r.max_bounces == 4
    # the run helper returns (per-frame DEVICE ray counters, seconds); the
    # caller sums/reads them back only after ALL timed work is done (one
    # D2H readback poisons axon dispatch ~300x, docs/PERF.md round 2j)
    counts, dt = bench.run(32, 32, 1)
    assert sum(int(c) for c in counts) > 0 and dt > 0


def test_bench_device_guard_skips_on_cpu(monkeypatch):
    """The tunnel-down fail-fast guard must no-op when CPU is forced —
    otherwise it would subprocess-probe (or exit) in every test/CI run."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._device_guard(timeout_s=1) is None


def test_package_import_honors_platform_env():
    """JAX_PLATFORMS=cpu must actually select CPU after `import mrt_tpu` —
    the image's sitecustomize overrides the env var via jax.config, and the
    package re-applies non-axon values (a CPU-forced run must never dial the
    axon tunnel: it hangs forever when the tunnel is down)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import mrt_tpu, jax; print(jax.devices()[0].platform)"],
        cwd=repo, env=env, timeout=120, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


def test_graft_entry_single_chip():
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    accum = np.asarray(out[0])
    assert accum.shape[-1] == 3 and np.isfinite(accum).all()


def test_checkpoint_roundtrip_animated(tmp_path):
    """Resume of an ANIMATED scene must be bit-identical: clip times, the 60Hz
    throttle clock, and the skinned pose buffers are all part of the state."""
    from mrt_tpu.engine.renderer import Renderer as R2
    from mrt_tpu import make_app_scene

    def build():
        r = R2(make_app_scene(width=32, height=32), output_width=32, output_height=32)
        r.upscaler_mode = "off"
        r.samples_per_pixel = 1
        r.max_bounces = 1
        r.use_motion_adaptive_sampling = False
        return r

    ra = build()
    for _ in range(4):
        ra.draw(1 / 30)
    p = str(tmp_path / "anim.npz")
    checkpoint.save(ra, p)
    rb = build()
    checkpoint.restore(rb, p)
    x = np.asarray(ra.draw(1 / 30))
    y = np.asarray(rb.draw(1 / 30))
    np.testing.assert_allclose(x, y, atol=1e-6)


def test_rebuild_bvh_sees_current_pose():
    """rebuild_bvh must rebuild from the LIVE model transforms, not the
    compile-time host mirror (its purpose is repairing tree quality after
    large moves — code-review round 3)."""
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.engine.scene import Model, Scene

    scene = Scene(width=32, height=32)
    scene.models = [Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
                    Model("plane", scale=4)]
    r = Renderer(scene, output_width=32, output_height=32)
    r.upscaler_mode = UPSCALER_OFF
    r.two_level = False  # flat world-space rebuild path

    scene.models[0].position = np.asarray([50.0, 0.5, 0.0], np.float32)
    r._sync_scene()
    r.rebuild_bvh()
    root = np.asarray(r.bvh.table[0])
    from mrt_tpu.bvh import wide
    A = wide.ARITY
    bmax_x = np.nanmax(root[3 * A:4 * A])
    assert bmax_x > 40.0, bmax_x  # tree bounds cover the moved sphere
