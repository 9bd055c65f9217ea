"""The staged frame path (prepare / per-tile trace / accumulate as separate
programs) must be semantically identical to the monolithic ``_render_frame``
— same trace_tile under the hood, different program boundaries."""

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _renderer(staged, tile_pixels=None):
    scene = Scene(width=72, height=56)  # non-square, non-tile-aligned
    scene.models = [
        Model("sphere", position=[0, 0.5, 0], scale=0.5),
        Model("plane", scale=8),
    ]
    r = Renderer(scene, output_width=72, output_height=56, seed=3)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r.staged_frame = staged
    if tile_pixels:
        r.tile_pixels = tile_pixels  # force multiple tiles + padding
    return r


def test_staged_matches_monolithic():
    rm = _renderer(False)
    rs = _renderer(True, tile_pixels=1024)  # 72*56=4032 -> 4 tiles, padded
    for _ in range(3):
        am = np.asarray(rm.draw())
        as_ = np.asarray(rs.draw())
    assert np.allclose(am, as_, atol=1e-6), np.abs(am - as_).max()
    assert np.allclose(np.asarray(rm.depth), np.asarray(rs.depth), atol=1e-5)
    assert np.allclose(np.asarray(rm.motion), np.asarray(rs.motion), atol=1e-5)
    assert int(rm.last_rays_traced) == int(rs.last_rays_traced)


def test_staged_primes_roundtrip():
    r = _renderer(True, tile_pixels=1024)
    r.hit_priming = True
    for _ in range(3):
        img = np.asarray(r.draw())
    assert np.isfinite(img).all()
    pp = np.asarray(r.prime_primary)
    assert pp.shape == (56, 72)
    assert (pp >= 0).any()  # primary hits cached


def test_staged_with_gbuffer_and_skinned_robot():
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import UPSCALER_DENOISED

    scene = make_app_scene(width=64, height=64, include_robot=True)
    r = Renderer(scene, output_width=64, output_height=64)
    r.upscaler_mode = UPSCALER_DENOISED
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    r.staged_frame = True
    r.tile_pixels = 2048
    for _ in range(2):
        r.draw(1 / 30.0)
    assert r.gbuffer is not None
    assert np.isfinite(np.asarray(r.gbuffer["normal"])).all()


def test_prepare_cache_hits_static_and_invalidates_on_change(monkeypatch):
    """Static frames skip the prepare program; any geometry-affecting change
    (model move, light change, bvh rebuild) re-runs it — mirroring the
    reference's skip-when-not-dirty gate (SkinningPass.swift:288-312)."""
    import mrt_tpu.engine.renderer as R

    calls = {"n": 0}
    real = R._prepare_frame

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(R, "_prepare_frame", counting)

    r = _renderer(True, tile_pixels=1024)
    r.draw()
    assert calls["n"] == 1
    r.draw()
    r.draw()
    assert calls["n"] == 1  # static frames reuse cached prepare outputs

    r.scene.move_model(0, forward=0.25)
    r.draw()
    assert calls["n"] == 2  # instance transform changed
    # the frame AFTER a move still differs (prev transform catches up)
    r.draw()
    assert calls["n"] == 3
    r.draw()
    assert calls["n"] == 3  # steady again

    r.scene.set_light_intensity(2.0)
    r.draw()
    assert calls["n"] == 4

    r.rebuild_bvh()
    r.draw()
    assert calls["n"] == 5

    # cached path must render identically to an uncached renderer replaying
    # the same edits
    r2 = _renderer(True, tile_pixels=1024)
    [r2.draw() for _ in range(3)]
    r2.scene.move_model(0, forward=0.25)
    [r2.draw() for _ in range(3)]
    r2.scene.set_light_intensity(2.0)
    r2.draw()
    r2.rebuild_bvh()
    r2.draw()  # same number of accumulated frames as r
    a = np.asarray(r.draw())
    b = np.asarray(r2.draw())
    assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()


def test_workload_sort_populates_hint_and_is_bit_exact():
    """The workload-predictive lane sort (docs/PERF.md round 2g) reorders
    traversal lanes only — results must be bit-exact vs workload_sort=False,
    and the per-pixel camera step-hint map must populate after a frame."""
    ra = _renderer(True, tile_pixels=1024)
    rb = _renderer(True, tile_pixels=1024)
    ra.workload_sort = True
    rb.workload_sort = False
    for _ in range(3):
        a = np.asarray(ra.draw())
        b = np.asarray(rb.draw())
    assert np.array_equal(a, b), np.abs(a - b).max()
    hint = np.asarray(ra.step_hint)
    assert hint.shape == (56, 72)
    assert (hint > 0).any()  # camera-ray step counts recorded
    # hints are hints, not history: they survive an accumulation reset
    ra.orbit(5.0, 0.0)
    ra.draw()
    assert (np.asarray(ra.step_hint) > 0).any()
