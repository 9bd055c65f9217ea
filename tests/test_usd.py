"""USDZ/USDA loader tests (Model.swift:63-122 analog): container + usda
parsing, skeleton/animation extraction, SkinData render integration, and
USDZ-preferred asset resolution."""

import numpy as np
import pytest

from mrt_tpu.assets.usd import load_usda_text, load_usdz

FIXTURE = "tests/fixtures/tube.usdz"


def test_usdz_fixture_loads():
    mesh, skin = load_usdz(FIXTURE)
    assert mesh.positions.shape == (56, 3)
    assert mesh.triangle_count == 96  # 48 quads fan-triangulated
    assert skin is not None
    sk = skin["skeleton"]
    assert sk.joint_paths == ["base", "base/top"]
    np.testing.assert_array_equal(sk.parent_indices, [-1, 0])
    # bind/rest round trip: inverse_bind @ bind == identity
    binds = np.linalg.inv(sk.inverse_bind_transforms)
    np.testing.assert_allclose(binds[1, :3, 3], [0, 1, 0], atol=1e-5)
    clip = skin["animation"]
    assert clip.duration == pytest.approx(1.0)  # 24 timeCodes @ 24/s
    assert skin["joint_indices"].shape == (56, 4)
    np.testing.assert_allclose(skin["joint_weights"].sum(axis=1), 1.0, atol=1e-3)


def test_usdz_renders_and_animates():
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.engine.scene import Model, Scene, SkinData

    mesh, skin = load_usdz(FIXTURE)
    scene = Scene(width=48, height=48)
    tube = Model("tube", mesh=mesh, position=[0, 0, 0], scale=0.5)
    tube.skin = SkinData(
        joint_indices=skin["joint_indices"],
        joint_weights=skin["joint_weights"],
        rest_joints=skin["rest_joints"],
        skeleton=skin["skeleton"],
        animation=skin["animation"],
        geometry_bind=skin["geometry_bind"],
    )
    scene.models = [tube, Model("plane", scale=6)]
    r = Renderer(scene, output_width=48, output_height=48)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False

    r.draw()
    pose0 = np.asarray(r.scene_data.positions_obj)
    for _ in range(8):
        r.draw(delta_time=0.1)
    pose1 = np.asarray(r.scene_data.positions_obj)
    assert np.isfinite(np.asarray(r.accum)).all()
    # the clip visibly moves the tube's top vertices
    assert np.abs(pose1 - pose0).max() > 0.05


def test_usda_multi_mesh_merges_submeshes():
    usda = """#usda 1.0
(
    upAxis = "Y"
)

def Xform "root"
{
    def Mesh "a"
    {
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0, 1, 2]
        point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    }
    def Mesh "b"
    {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
        color3f[] primvars:displayColor = [(1, 0, 0)]
    }
}
"""
    mesh, skin = load_usda_text(usda)
    assert skin is None
    assert mesh.positions.shape == (7, 3)
    assert len(mesh.submeshes) == 2
    assert mesh.submeshes[0].indices.shape == (1, 3)
    assert mesh.submeshes[1].indices.shape == (2, 3)  # quad fan
    np.testing.assert_allclose(mesh.submeshes[1].material.base_color, (1, 0, 0))


def test_usdz_preferred_resolution(tmp_path, monkeypatch):
    """Model name resolution prefers .usdz over .obj (Model.swift:63-67)."""
    import shutil

    from mrt_tpu.engine import scene as scene_mod

    shutil.copy(FIXTURE, tmp_path / "tube.usdz")
    (tmp_path / "tube.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    monkeypatch.setattr(scene_mod, "ASSET_SEARCH_PATHS",
                        [tmp_path] + scene_mod.ASSET_SEARCH_PATHS)
    scene_mod._MESH_CACHE.pop("tube", None)
    try:
        m = scene_mod.Model("tube")
        assert m.mesh.positions.shape == (56, 3)  # the usdz, not the 3-vert obj
        assert m.skin is not None and m.skin.animation is not None
    finally:
        scene_mod._MESH_CACHE.pop("tube", None)


def test_usdc_crate_matches_usda_fixture():
    """The binary crate reader (assets/usdc.py) must decode the crate-encoded
    tube to the same mesh/skeleton/animation as the text fixture."""
    from mrt_tpu.skinning.animation import compute_joint_matrices

    mesh_c, skin_c = load_usdz("tests/fixtures/tube_crate.usdz")
    mesh_a, skin_a = load_usdz(FIXTURE)
    np.testing.assert_allclose(mesh_c.positions, mesh_a.positions, atol=1e-5)
    assert mesh_c.triangle_count == mesh_a.triangle_count
    assert skin_c["skeleton"].joint_paths == skin_a["skeleton"].joint_paths
    np.testing.assert_allclose(
        skin_c["joint_weights"], skin_a["joint_weights"], atol=1e-4
    )
    for t in (0.0, 0.3, 0.8):
        np.testing.assert_allclose(
            compute_joint_matrices(skin_c["skeleton"], skin_c["animation"], t),
            compute_joint_matrices(skin_a["skeleton"], skin_a["animation"], t),
            atol=2e-3,  # usda fixture quantizes rotations to 6 decimals
        )


def test_usdc_roundtrip_primitives():
    """Writer->reader round trip of the crate building blocks."""
    import numpy as np

    from mrt_tpu.assets import usdc

    # lz4 + TfFastCompression framing
    for payload in (b"", b"a", b"hello world" * 50, bytes(range(256)) * 7):
        assert usdc.tf_decompress(usdc.tf_compress(payload), len(payload)) == payload
    # integer codec
    rng = np.random.default_rng(0)
    vals = rng.integers(-(2**30), 2**30, 257)
    dec = usdc.decode_integers(usdc.encode_integers(vals), len(vals))
    np.testing.assert_array_equal(dec, vals)
