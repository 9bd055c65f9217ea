"""Shared scene builders for the config-3 / config-4 golden renders.

Used by both scripts/make_goldens.py (one-time generation + oracle
cross-check, then frozen) and tests/test_golden.py (regression compare).
Config numbering follows BASELINE.md: config 3 = full shading feature set
(glass + textures + multi-light, the Raytracing.metal:221-831 union),
config 4 = skinned animation + per-frame BVH refit + motion vectors
(Renderer.swift:464-606 refit split; Raytracing.metal motion G-buffer).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from mrt_tpu import Renderer, UPSCALER_OFF
from mrt_tpu.assets import procedural
from mrt_tpu.assets.obj import MaterialDef
from mrt_tpu.core import types as T
from mrt_tpu.engine.scene import Model, ModelMaterialOverride, Scene

_TEX_DIR: Path | None = None


def _texture_dir() -> Path:
    """Deterministic checker + normal-map PNGs (content is fixed arrays, so
    the golden does not depend on any committed binary blob)."""
    global _TEX_DIR
    if _TEX_DIR is not None and _TEX_DIR.exists():
        return _TEX_DIR
    from PIL import Image

    d = Path(tempfile.mkdtemp(prefix="mrt_golden_tex_"))
    check = np.zeros((16, 16, 3), np.uint8)
    check[::2, ::2] = (230, 210, 160)
    check[1::2, 1::2] = (230, 210, 160)
    check[::2, 1::2] = (40, 60, 90)
    check[1::2, ::2] = (40, 60, 90)
    Image.fromarray(check, "RGB").save(d / "check.png")
    rng = np.random.default_rng(42)
    bump = np.full((8, 8, 3), 128.0)
    bump[..., :2] += rng.uniform(-60, 60, (8, 8, 2))
    bump[..., 2] = 255
    Image.fromarray(bump.astype(np.uint8), "RGB").save(d / "bump.png")
    _TEX_DIR = d
    return d


def add_extra_lights(scene: Scene) -> None:
    """Default area+spot (Scene.swift:82-91) plus a point and a sun: all
    four light types (ShaderTypes.h LightType) in one scene."""
    scene.lights = T.concat_lights(
        scene.lights,
        T.point_light(position=(1.5, 2.5, 1.0), color=(2.0, 1.8, 1.4)),
        T.sun_light(direction=(-0.3, -1.0, -0.2), color=(0.25, 0.25, 0.3)),
    )


def config3_models(textured: bool = True, sphere_res=(12, 24)) -> list[Model]:
    """Glass sphere + diffuse/emissive spheres over a textured checker floor."""
    tex = {}
    if textured:
        d = _texture_dir()
        tex = dict(map_base_color=str(d / "check.png"), map_normal=str(d / "bump.png"))
    floor = procedural.plane(
        material=MaterialDef(name="checker", base_color=(1.0, 1.0, 1.0), **tex)
    )
    glass = Model(
        "glass",
        mesh=procedural.uv_sphere(*sphere_res),
        position=[0.0, 0.6, 1.2],
        scale=0.5,
        material_override=ModelMaterialOverride.glass(),
    )
    red = Model(
        "red",
        mesh=procedural.uv_sphere(*sphere_res),
        position=[-0.1, 0.5, -0.6],
        scale=0.5,
        material_override=ModelMaterialOverride(base_color=(0.75, 0.12, 0.1)),
    )
    glow = Model(
        "glow",
        mesh=procedural.uv_sphere(
            *sphere_res,
            material=MaterialDef(
                name="glow", base_color=(0.1, 0.1, 0.1), emission=(0.4, 1.2, 0.5)
            ),
        ),
        position=[0.9, 0.25, 0.2],
        scale=0.22,
    )
    return [glass, red, glow, Model("floor", mesh=floor, position=[0, 0, 0], scale=10)]


def config3_renderer(size: int = 128, textured: bool = True, spp: int = 1,
                     bounces: int = 3, **sphere_kw):
    scene = Scene(width=size, height=size)
    scene.models = config3_models(textured=textured, **sphere_kw)
    add_extra_lights(scene)
    r = Renderer(scene, output_width=size, output_height=size, seed=1234)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = spp
    r.max_bounces = bounces
    r.use_motion_adaptive_sampling = False
    return r


def config4_renderer(size: int = 64):
    """Skinned robot (swing rig) in the app scene: per-frame LBS skinning,
    BVH refit across frames, and a non-trivial motion buffer."""
    from mrt_tpu.engine.appscene import make_app_scene

    scene = make_app_scene(width=size, height=size, include_robot=True)
    r = Renderer(scene, output_width=size, output_height=size, seed=1234)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    return r
