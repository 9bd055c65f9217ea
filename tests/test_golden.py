"""Golden-image regression tests (SURVEY.md §4): tiny scenes, fixed seeds,
compared by relative RMSE against committed renders. Guards the whole
pipeline's numerics (camera, Halton schedule, traversal, shading,
accumulation) against silent drift.
"""

from pathlib import Path

import numpy as np
import pytest

from mrt_tpu import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene
from mrt_tpu.utils import image as I

GOLDENS = Path(__file__).parent / "goldens"

# CPU float reassociation may differ across XLA versions; 1% relative RMSE is
# the BASELINE fidelity bar.
TOL = 0.01


def _config1_renderer():
    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=64, output_height=64, seed=1234)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    return r


def test_config1_sphere_plane_golden():
    r = _config1_renderer()
    for _ in range(8):
        r.draw()
    golden = I.load_golden(GOLDENS / "config1_sphere_plane.npz")
    rel = I.relative_rmse(np.asarray(r.accum), golden)
    assert rel < TOL, f"relative RMSE {rel:.4f} exceeds {TOL}"


def test_config2_environment_golden():
    from mrt_tpu.assets import hdr

    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    scene.set_environment(hdr.procedural_sky(32, 64), intensity=0.5)
    r = Renderer(scene, output_width=64, output_height=64, seed=1234)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    for _ in range(8):
        r.draw()
    golden = I.load_golden(GOLDENS / "config2_env.npz")
    rel = I.relative_rmse(np.asarray(r.accum), golden)
    assert rel < TOL, f"relative RMSE {rel:.4f} exceeds {TOL}"


def test_config3_full_shading_golden():
    """Config-3 class: glass + base-color/normal textures + emission + all
    four light types at 128² — the union of Raytracing.metal:221-831 shading
    branches in one image. Oracle-cross-checked once at generation time
    (scripts/make_goldens.py), then frozen."""
    from golden_scenes import config3_renderer

    r = config3_renderer(size=128)
    for _ in range(6):
        r.draw()
    golden = I.load_golden(GOLDENS / "config3_full_shading.npz")
    rel = I.relative_rmse(np.asarray(r.accum), golden)
    assert rel < TOL, f"relative RMSE {rel:.4f} exceeds {TOL}"


def test_config4_skinned_motion_golden():
    """Config-4 class: skinned robot + per-frame BVH refit over two frames,
    with the motion and depth buffers frozen alongside the image (the
    reference's skinned-refit split, Renderer.swift:464-606, and motion
    G-buffer). Refit-vs-rebuild equivalence checked at generation time."""
    from golden_scenes import config4_renderer

    r = config4_renderer(size=64)
    r.draw(1 / 30.0)
    r.draw(1 / 30.0)
    g = np.load(GOLDENS / "config4_skinned_motion.npz")
    rel = I.relative_rmse(np.asarray(r.accum), g["image"])
    assert rel < TOL, f"image relative RMSE {rel:.4f} exceeds {TOL}"
    # motion/depth are geometric quantities: compare absolutely
    assert np.allclose(np.asarray(r.motion), g["motion"], atol=1e-3)
    d, gd = np.asarray(r.depth), g["depth"]
    finite = np.isfinite(gd) & (gd < 1e7)
    assert np.allclose(d[finite], gd[finite], atol=1e-3)
    # the animated robot must actually be moving in the frozen buffers
    assert (np.linalg.norm(g["motion"], axis=-1) > 0.05).any()


def test_rmse_helpers():
    a = np.zeros((4, 4))
    b = np.ones((4, 4))
    assert I.rmse(a, b) == pytest.approx(1.0)
    assert I.relative_rmse(b * 1.01, b) == pytest.approx(0.01, rel=1e-6)
    with pytest.raises(ValueError):
        I.rmse(a, np.zeros((2, 2)))
