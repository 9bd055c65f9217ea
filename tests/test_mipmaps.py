"""Mipmapped texture sampling with ray-cone LODs — beyond-reference feature
(the Metal compute kernel has no derivatives and reads LOD 0,
Raytracing.metal:421; mip GENERATION matches generateMipmaps,
SubMesh.swift:189-206). Default OFF keeps reference-exact output."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from mrt_tpu.assets import texture as tex


def _checker(n=64):
    img = np.zeros((n, n, 3), np.float32)
    img[::2, ::2] = 1.0
    img[1::2, 1::2] = 1.0
    return img


def _atlas_with_checker(n=64):
    b = tex.AtlasBuilder()
    rid = b.add_resource({tex.MAP_ROUGHNESS: _checker(n)})  # linear map: no sRGB
    return b.build(), rid


def test_mip_chain_levels_halve():
    atlas, rid = _atlas_with_checker(64)
    nl = int(atlas.n_levels[rid, tex.MAP_ROUGHNESS])
    assert nl == 7  # 64 -> 32 -> ... -> 1
    rects = np.asarray(atlas.mip_rects[rid, tex.MAP_ROUGHNESS])
    for level in range(nl):
        assert rects[level, 2] == max(64 >> level, 1)
        assert rects[level, 3] == max(64 >> level, 1)
    # levels beyond the chain clamp to the last
    assert tuple(rects[tex.MAX_MIPS - 1]) == tuple(rects[nl - 1])


def test_mip_level1_is_box_average():
    atlas, rid = _atlas_with_checker(4)
    x0, y0, w, h = np.asarray(atlas.mip_rects[rid, tex.MAP_ROUGHNESS][1])
    lvl1 = np.asarray(atlas.texels)[y0 : y0 + h, x0 : x0 + w]
    assert lvl1.shape[:2] == (2, 2)
    assert np.allclose(lvl1, 0.5, atol=1e-6)  # 2x2 checker box-averages to gray


def test_trilinear_lod0_matches_bilinear():
    atlas, rid = _atlas_with_checker(16)
    uv = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 2)), jnp.float32)
    res = jnp.full((32,), rid, jnp.int32)
    a = np.asarray(tex.sample_bilinear(atlas, res, tex.MAP_ROUGHNESS, uv))
    b = np.asarray(
        tex.sample_trilinear(atlas, res, tex.MAP_ROUGHNESS, uv, jnp.full((32,), -40.0))
    )
    assert np.allclose(a, b, atol=1e-6)


def test_trilinear_max_lod_is_image_mean():
    atlas, rid = _atlas_with_checker(16)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 2)), jnp.float32)
    res = jnp.full((32,), rid, jnp.int32)
    b = np.asarray(
        tex.sample_trilinear(atlas, res, tex.MAP_ROUGHNESS, uv, jnp.full((32,), 40.0))
    )
    assert np.allclose(b, 0.5, atol=1e-3)


def test_fallback_maps_have_one_level():
    b = tex.AtlasBuilder()
    rid = b.add_resource({})
    atlas = b.build()
    assert int(atlas.n_levels[rid, tex.MAP_BASECOLOR]) == 1


def test_render_with_mipmaps(tmp_path):
    """End-to-end: a checker-floored scene renders finitely with mipmapping
    on, preserves mean energy vs LOD-0, and reduces minification variance."""
    from mrt_tpu.assets.obj import MaterialDef
    from mrt_tpu.assets.procedural import plane
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.engine.scene import Model, Scene

    check = np.zeros((64, 64, 3))
    check[::2, ::2] = 255
    check[1::2, 1::2] = 255
    p = tmp_path / "check.png"
    Image.fromarray(check.astype(np.uint8), "RGB").save(p)

    def render(use_mips):
        mesh = plane(material=MaterialDef(name="t", base_color=(1, 1, 1),
                                          map_base_color=str(p)))
        scene = Scene(width=48, height=48)
        scene.models = [Model("floor", mesh=mesh, position=[0, 0, 0], scale=6)]
        r = Renderer(scene, output_width=48, output_height=48)
        r.upscaler_mode = UPSCALER_OFF
        r.samples_per_pixel = 1
        r.max_bounces = 1
        r.use_motion_adaptive_sampling = False
        r.use_mipmaps = use_mips
        r.apply_view_preset("top")
        for _ in range(4):
            img = np.asarray(r.draw())
        return img

    base = render(False)
    mip = render(True)
    assert np.all(np.isfinite(mip))
    assert mip.std() > 0  # still textured
    lit = base.sum(-1) > 1e-4
    assert lit.any()
    # energy preserved within a few percent (box filter is mean-preserving)
    assert abs(mip[lit].mean() - base[lit].mean()) < 0.15 * max(base[lit].mean(), 1e-6)
