"""End-to-end textured rendering: base-color / roughness-metallic / normal /
emission / opacity maps through the atlas (Raytracing.metal:399-456 path)."""

import numpy as np
import pytest
from PIL import Image

from mrt_tpu.assets.obj import MaterialDef
from mrt_tpu.assets.procedural import plane
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _png(tmp_path, name, arr):
    p = tmp_path / name
    Image.fromarray(arr.astype(np.uint8), "RGB").save(p)
    return str(p)


def _scene_with(tmp_path, **maps):
    tex_plane = plane(material=MaterialDef(name="tex", base_color=(1, 1, 1), **maps))
    scene = Scene(width=48, height=48)
    scene.models = [Model("floor", mesh=tex_plane, position=[0, 0, 0], scale=6)]
    r = Renderer(scene, output_width=48, output_height=48)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    r.apply_view_preset("top")  # look straight down at the textured floor
    return r


def test_base_color_texture_shows_pattern(tmp_path):
    check = np.zeros((8, 8, 3))
    check[::2, ::2] = 255
    check[1::2, 1::2] = 255
    path = _png(tmp_path, "check.png", check)
    r = _scene_with(tmp_path, map_base_color=path)
    assert r.statics.any_map[0]
    for _ in range(8):
        img = np.asarray(r.draw())
    # texture creates spatial variance the flat material wouldn't have
    lit = img[img.sum(-1) > 1e-4]
    assert lit.size > 0
    assert img.std() > 0.005

    r2 = _scene_with(tmp_path)  # no texture: flat white
    for _ in range(8):
        img2 = np.asarray(r2.draw())
    # half the checker is black -> textured render is darker overall and
    # differs pointwise (lighting gradients exist in both, so compare means)
    assert img.mean() < img2.mean() * 0.75
    assert np.abs(img - img2).mean() > 0.005


def test_emission_texture_lights_pixels(tmp_path):
    glow = np.zeros((4, 4, 3))
    glow[:2] = [0, 255, 0]
    path = _png(tmp_path, "glow.png", glow)
    r = _scene_with(tmp_path, map_emission=path)
    img = np.asarray(r.draw())
    # emissive texels radiate green regardless of lights
    assert img[..., 1].max() > 0.2


def test_opacity_texture_triggers_glass_branch(tmp_path):
    holes = np.zeros((4, 4, 3))
    holes[:, :2] = 255
    path = _png(tmp_path, "holes.png", holes)
    r = _scene_with(tmp_path, map_opacity=path)
    assert r.statics.any_map[5]
    img = np.asarray(r.draw())
    assert np.isfinite(img).all()


def test_normal_map_changes_shading(tmp_path):
    flat = np.full((4, 4, 3), [128, 128, 255], dtype=np.float64)
    bump = np.array(np.random.default_rng(0).integers(0, 255, (8, 8, 3)), np.float64)
    p_flat = _png(tmp_path, "nflat.png", flat)
    p_bump = _png(tmp_path, "nbump.png", bump)
    r_flat = _scene_with(tmp_path, map_normal=p_flat)
    r_bump = _scene_with(tmp_path, map_normal=p_bump)
    for _ in range(6):
        a = np.asarray(r_flat.draw())
        b = np.asarray(r_bump.draw())
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).mean() > 1e-5  # perturbed normals changed shading
