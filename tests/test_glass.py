"""Glass/transparency branch tests (Raytracing.metal:517-576 semantics)."""

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, ModelMaterialOverride, Scene


def _renderer(override=None, bounces=3):
    scene = Scene(width=48, height=48)
    scene.models = [
        Model("sphere", position=[0.0, 0.6, 1.5], scale=0.5, material_override=override),
        Model("sphere", position=[0.0, 0.5, -0.5], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=48, output_height=48)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = bounces
    r.use_motion_adaptive_sampling = False
    return r


def test_glass_override_enables_refraction_path():
    r_opaque = _renderer()
    assert not r_opaque.statics.has_refraction
    r_glass = _renderer(ModelMaterialOverride.glass())
    assert r_glass.statics.has_refraction
    # glass() values from Model.swift:22-27
    mats = r_glass.scene_data.materials
    assert float(np.asarray(mats.refraction_index).max()) == np.float32(1.52)
    assert abs(float(np.asarray(mats.opacity).min()) - 0.08) < 1e-6


def test_glass_sphere_transmits_background():
    """A glass sphere in front of a lit diffuse sphere must show light through
    it (refraction path carries radiance); an opaque sphere blocks it."""
    r_glass = _renderer(ModelMaterialOverride.glass())
    r_opaque = _renderer(ModelMaterialOverride(base_color=(0.01, 0.01, 0.01)))
    for _ in range(12):
        a = np.asarray(r_glass.draw())
        b = np.asarray(r_opaque.draw())
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # center region (the front sphere) is brighter through glass
    ca = a[16:32, 16:32].mean()
    cb = b[16:32, 16:32].mean()
    assert ca > cb * 1.5


def test_ior_only_material_triggers_glass_branch():
    r = _renderer(ModelMaterialOverride(refraction_index=1.5))  # opacity stays 1
    assert r.statics.has_refraction
    img = np.asarray(r.draw())
    assert np.isfinite(img).all()
