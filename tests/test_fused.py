"""fuse_shadow_rays (deferred-shadow mixed traversal) must match the unfused
path on both traversal backends. Occlusion answers are order-independent;
contributions accumulate in a different iteration order, so tolerances are
float-sum loose rather than bit-exact."""

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _render(fused, two_level):
    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[0, 0.5, 0], scale=0.5),
        Model("sphere", position=[0.8, 0.3, 0.4], scale=0.3),
        Model("plane", scale=8),
    ]
    r = Renderer(scene, output_width=64, output_height=64, seed=5)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r.two_level = two_level
    r.fuse_shadow_rays = fused
    for _ in range(3):
        r.draw()
    return np.asarray(r.accum), int(r.last_rays_traced)


def test_fused_matches_unfused_twolevel():
    a, ra = _render(False, True)
    b, rb = _render(True, True)
    assert np.allclose(a, b, atol=2e-5), np.abs(a - b).max()
    assert ra == rb  # same honest ray count


def test_fused_matches_unfused_flat():
    a, ra = _render(False, False)
    b, rb = _render(True, False)
    assert np.allclose(a, b, atol=2e-5), np.abs(a - b).max()
    assert ra == rb
