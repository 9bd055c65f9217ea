"""Asset pipeline tests: OBJ/MTL loaders against the checked-in reference
assets (SURVEY.md §4), procedural meshes, texture atlas sampling."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from mrt_tpu.assets import obj, procedural
from mrt_tpu.assets import texture as tex

ASSETS = Path("/root/reference/AssetResources")


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets not mounted")
@pytest.mark.parametrize(
    "name,tris",
    # triangulated counts (SURVEY.md quotes face counts; quads split in two)
    [("sphere", 4900), ("teapot", 15704), ("train", 3624), ("treefir", 352), ("plane", 2), ("plane-back", 2)],
)
def test_load_reference_objs(name, tris):
    mesh = obj.load_obj(ASSETS / f"{name}.obj")
    assert mesh.triangle_count == tris
    assert mesh.positions.shape[1] == 3
    assert np.isfinite(mesh.positions).all()
    assert mesh.normals.shape == mesh.positions.shape
    # normals ~unit
    n = np.linalg.norm(mesh.normals, axis=1)
    assert (np.abs(n - 1) < 1e-3).mean() > 0.99
    for sub in mesh.submeshes:
        assert sub.indices.min() >= 0
        assert sub.indices.max() < mesh.positions.shape[0]


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets not mounted")
def test_mtl_material_parsing():
    mesh = obj.load_obj(ASSETS / "sphere.obj")
    m = mesh.submeshes[0].material
    # sphere.mtl: Kd 1.0 1.0 0.5, Ks 0.8, Ns 32, d 1
    np.testing.assert_allclose(m.base_color, (1.0, 1.0, 0.5))
    np.testing.assert_allclose(m.specular, (0.8, 0.8, 0.8))
    assert m.specular_exponent == 32
    assert m.opacity == 1.0


@pytest.mark.skipif(not (ASSETS / "coatball").exists(), reason="coatball not mounted")
def test_coatball_loads():
    mesh = obj.load_obj(ASSETS / "coatball" / "coatball.obj")
    assert mesh.triangle_count > 20000  # 23,408 faces per SURVEY (all tris)
    m = mesh.submeshes[0].material
    # coatball.mtl comments out all map_* lines -> no textures discovered
    assert m.map_base_color is None


def test_procedural_meshes_are_closed_and_finite():
    for mesh in (procedural.uv_sphere(8, 16), procedural.plane(), procedural.box(), procedural.blob(2)):
        assert np.isfinite(mesh.positions).all()
        assert mesh.triangle_count > 0
        idx = np.concatenate([s.indices for s in mesh.submeshes])
        assert idx.max() < mesh.positions.shape[0]


def test_atlas_pack_and_bilinear_sample():
    b = tex.AtlasBuilder()
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 1, 4)[None, :]  # red ramp in x
    rid = b.add_resource({tex.MAP_BASECOLOR: None, tex.MAP_ROUGHNESS: img})
    atlas = b.build()
    assert not bool(np.asarray(atlas.has_map)[rid, tex.MAP_BASECOLOR])
    assert bool(np.asarray(atlas.has_map)[rid, tex.MAP_ROUGHNESS])

    res = jnp.zeros((3,), jnp.int32)
    uv = jnp.asarray([[0.125, 0.5], [0.625, 0.5], [0.125 + 1.0, 0.5]])  # wrap
    out = np.asarray(tex.sample_bilinear(atlas, res, tex.MAP_ROUGHNESS, uv))
    # texel centers at u=1/8,3/8,5/8,7/8 with values 0,1/3,2/3,1
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[1, 0], 2 / 3, atol=1e-5)
    np.testing.assert_allclose(out[2], out[0], atol=1e-6)  # repeat addressing

    # fallback sampling returns the 1x1 fallback color (white for basecolor)
    out_fb = np.asarray(tex.sample_bilinear(atlas, res, tex.MAP_BASECOLOR, uv))
    np.testing.assert_allclose(out_fb, 1.0, atol=1e-6)


def test_srgb_decode():
    c = np.array([0.0, 0.04045, 0.5, 1.0], np.float32)
    lin = tex.srgb_to_linear(c)
    assert lin[0] == 0
    np.testing.assert_allclose(lin[3], 1.0, atol=1e-6)
    assert lin[2] < 0.5  # sRGB is brighter than linear


def test_obj_negative_indices_and_quads(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4 -3 -2 -1
""")
    mesh = obj.load_obj(p)
    assert mesh.triangle_count == 2  # fan triangulation
    assert mesh.positions.shape[0] == 4


def test_native_obj_parser_matches_python():
    from mrt_tpu.utils import native

    if not native.available() or not ASSETS.exists():
        pytest.skip("native lib or assets unavailable")
    p = str(ASSETS / "teapot.obj")
    mesh = obj.load_obj(p)
    out = native.parse_obj_geometry(p)
    assert out is not None
    pos, uv, nrm, idx = out
    assert pos.shape[0] == mesh.positions.shape[0]
    assert idx.shape[0] == mesh.triangle_count
    # same geometry content (vertex order matches: both dedupe in face order)
    np.testing.assert_allclose(pos, mesh.positions, atol=1e-6)
    np.testing.assert_array_equal(idx, np.concatenate([s.indices for s in mesh.submeshes]))
