"""The persistent-lane sample driver (lane respawns into its next sample when
its path dies) must be BIT-equal to the sample-loop driver: same per-lane QMC
streams, same per-sample radiance flush order, same honest ray counts."""

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_DENOISED, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, ModelMaterialOverride, Scene


def _render(persistent, spp=2, bounces=3, glass=False):
    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[0, 0.5, 0], scale=0.5,
              material_override=ModelMaterialOverride.glass() if glass else None),
        Model("sphere", position=[0.8, 0.3, 0.5], scale=0.3),
        Model("plane", scale=8),
    ]
    r = Renderer(scene, output_width=64, output_height=64, seed=7)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = spp
    r.max_bounces = bounces
    r.use_motion_adaptive_sampling = False
    r.persistent_samples = persistent
    for _ in range(2):
        r.draw()
    return np.asarray(r.accum), np.asarray(r.depth), np.asarray(r.motion), int(r.last_rays_traced)


def test_persistent_bit_equal():
    a = _render(False)
    b = _render(True)
    assert np.array_equal(a[0], b[0]), np.abs(a[0] - b[0]).max()
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(a[2], b[2])
    assert a[3] == b[3]


def test_persistent_bit_equal_glass():
    a = _render(False, spp=3, bounces=2, glass=True)
    b = _render(True, spp=3, bounces=2, glass=True)
    assert np.array_equal(a[0], b[0]), np.abs(a[0] - b[0]).max()
    assert a[3] == b[3]


def test_persistent_gbuffer_and_appscene():
    from mrt_tpu.engine.appscene import make_app_scene

    imgs = []
    for persistent in (False, True):
        scene = make_app_scene(width=48, height=48, include_robot=False)
        r = Renderer(scene, output_width=48, output_height=48)
        r.upscaler_mode = UPSCALER_DENOISED
        r.samples_per_pixel = 2
        r.max_bounces = 2
        r.use_motion_adaptive_sampling = False
        r.persistent_samples = persistent
        r.draw()
        imgs.append((np.asarray(r.accum), np.asarray(r.gbuffer["normal"])))
    assert np.array_equal(imgs[0][0], imgs[1][0])
    assert np.array_equal(imgs[0][1], imgs[1][1])
