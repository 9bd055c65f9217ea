"""Cross-validation of the full JAX wavefront against the independent scalar
NumPy oracle (tests/oracle_renderer.py) — the stand-in for comparing against
the (unavailable) Metal reference. BASELINE's fidelity bar: 1% relative RMSE.
"""

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene
from mrt_tpu.utils import image as I

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_renderer import render_oracle


def test_wavefront_matches_independent_oracle():
    size = 24  # tiny: the oracle is O(pixels * tris) scalar NumPy
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    # procedural sphere at default res is 4k tris; shrink for the oracle
    from mrt_tpu.assets import procedural

    scene.models[0].mesh = procedural.uv_sphere(8, 16)

    r = Renderer(scene, output_width=size, output_height=size, seed=7)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    got = np.asarray(r.draw())  # frame 0: no accumulation blend

    # --- oracle inputs straight from the compiled scene ----------------------
    data = r.scene_data
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos = np.asarray(data.positions_obj)
    verts_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    normals_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], np.asarray(data.normals_obj))
    cam_j = r.current_camera()
    camera = dict(
        position=np.asarray(cam_j.position, np.float64),
        right=np.asarray(cam_j.right, np.float64),
        up=np.asarray(cam_j.up, np.float64),
        forward=np.asarray(cam_j.forward, np.float64),
    )
    L = data.lights
    lights = [
        dict(
            type=int(np.asarray(L.type)[i]),
            position=np.asarray(L.position)[i].astype(np.float64),
            color=np.asarray(L.color)[i].astype(np.float64),
            forward=np.asarray(L.forward)[i].astype(np.float64),
            right=np.asarray(L.right)[i].astype(np.float64),
            up=np.asarray(L.up)[i].astype(np.float64),
            cone_angle=float(np.asarray(L.cone_angle)[i]),
            direction=np.asarray(L.direction)[i].astype(np.float64),
        )
        for i in range(L.type.shape[0])
    ]

    want = render_oracle(
        size,
        size,
        camera,
        np.asarray(r.offsets),
        verts_w,
        normals_w,
        np.asarray(data.indices),
        np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color),
        np.asarray(data.materials.emission),
        lights,
        spp=2,
        max_bounces=2,
        frame_index=0,
    )

    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"wavefront vs independent oracle relative RMSE {rel:.4f}"


def _oracle_inputs(r):
    data = r.scene_data
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos = np.asarray(data.positions_obj)
    verts_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    normals_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], np.asarray(data.normals_obj))
    cam_j = r.current_camera()
    camera = dict(
        position=np.asarray(cam_j.position, np.float64),
        right=np.asarray(cam_j.right, np.float64),
        up=np.asarray(cam_j.up, np.float64),
        forward=np.asarray(cam_j.forward, np.float64),
    )
    L = data.lights
    lights = [
        dict(
            type=int(np.asarray(L.type)[i]),
            position=np.asarray(L.position)[i].astype(np.float64),
            color=np.asarray(L.color)[i].astype(np.float64),
            forward=np.asarray(L.forward)[i].astype(np.float64),
            right=np.asarray(L.right)[i].astype(np.float64),
            up=np.asarray(L.up)[i].astype(np.float64),
            cone_angle=float(np.asarray(L.cone_angle)[i]),
            direction=np.asarray(L.direction)[i].astype(np.float64),
        )
        for i in range(L.type.shape[0])
    ]
    return data, camera, verts_w, normals_w, lights


def _small_renderer(scene, size, **knobs):
    r = Renderer(scene, output_width=size, output_height=size, seed=7)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = knobs.get("spp", 1)
    r.max_bounces = knobs.get("bounces", 2)
    r.use_motion_adaptive_sampling = False
    if knobs.get("legacy"):
        from mrt_tpu.core import types as T

        r.shading_mode = T.SHADING_MODE_LEGACY
    return r


def test_glass_branch_matches_oracle():
    from mrt_tpu.assets import procedural
    from mrt_tpu.engine.scene import ModelMaterialOverride

    size = 20
    scene = Scene(width=size, height=size)
    glass_sphere = Model(
        "g", mesh=procedural.uv_sphere(6, 12), position=[0, 0.6, 0.8], scale=0.5,
        material_override=ModelMaterialOverride.glass(),
    )
    scene.models = [
        glass_sphere,
        Model("back", mesh=procedural.uv_sphere(6, 12), position=[0, 0.5, -0.8], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = _small_renderer(scene, size, spp=2, bounces=2)
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=2, max_bounces=2, frame_index=0,
        opacity=np.asarray(data.materials.opacity),
        ior=np.asarray(data.materials.refraction_index),
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"glass branch vs oracle relative RMSE {rel:.4f}"


def test_legacy_and_env_match_oracle():
    from mrt_tpu.assets import hdr, procedural

    size = 20
    sky = hdr.procedural_sky(16, 32, sun_sharpness=30.0)
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("s", mesh=procedural.uv_sphere(6, 12), position=[0, 0.5, 0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    scene.set_environment(sky, intensity=0.5)
    r = _small_renderer(scene, size, spp=1, bounces=2, legacy=True)
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=1, max_bounces=2, frame_index=0,
        env_map=np.asarray(sky, np.float64), env_intensity=0.5, legacy=True,
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"legacy+env vs oracle relative RMSE {rel:.4f}"


def test_all_light_types_match_oracle():
    """Area + spot + point + sun in one scene, with glass and emission —
    point/sun sampling previously had no independent cross-check
    (Raytracing.metal light-type switch, cf. Scene.swift:172-209)."""
    import golden_scenes as GS

    size = 16
    r = GS.config3_renderer(size=size, textured=False, spp=1, bounces=2,
                            sphere_res=(6, 12))
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    assert sorted(L["type"] for L in lights) == [1, 2, 3, 4]  # sun/spot/point/area
    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=1, max_bounces=2, frame_index=0,
        opacity=np.asarray(data.materials.opacity),
        ior=np.asarray(data.materials.refraction_index),
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"all-light-types vs oracle relative RMSE {rel:.4f}"


def test_base_color_texture_matches_oracle(tmp_path):
    """Base-color texture sampling (repeat, half-pixel centers, y-flip,
    sRGB decode at pack time — Raytracing.metal:399-456): previously
    validated only by self-consistent tests, never independently."""
    from PIL import Image

    from mrt_tpu.assets.obj import MaterialDef
    from mrt_tpu.assets import procedural

    rng_img = np.random.default_rng(3)
    px = rng_img.integers(30, 255, (8, 8, 3)).astype(np.uint8)
    path = tmp_path / "tex.png"
    Image.fromarray(px, "RGB").save(path)

    size = 20
    floor = procedural.plane(
        material=MaterialDef(name="t", base_color=(0.9, 0.8, 0.7),
                             map_base_color=str(path)))
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("s", mesh=procedural.uv_sphere(6, 12), position=[0, 0.5, 0.8], scale=0.4),
        Model("floor", mesh=floor, position=[0, 0, 0], scale=10),
    ]
    r = _small_renderer(scene, size, spp=2, bounces=2)
    r.use_mipmaps = False  # oracle samples LOD 0
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    # per-resource LINEAR base-color images (sRGB-decoded like the packer)
    srgb = px.astype(np.float64) / 255.0
    lin = np.where(srgb <= 0.04045, srgb / 12.92, ((srgb + 0.055) / 1.055) ** 2.4)
    flags = np.asarray(data.materials.texture_flags)
    from mrt_tpu.core import types as T

    tex_base = [lin if (f & T.MATERIAL_TEXTURE_BASECOLOR) else None for f in flags]
    assert any(t is not None for t in tex_base)
    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=2, max_bounces=2, frame_index=0,
        uvs=np.asarray(data.uvs), tex_base=tex_base,
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"textured base-color vs oracle relative RMSE {rel:.4f}"


def test_skinned_render_matches_oracle():
    """End-to-end skinned pipeline (LBS -> vertex-pool scatter -> BVH refit ->
    trace -> shade) against the oracle, with the posed vertices computed BY
    HAND in this test (plain numpy 4x4s + the naive LBS loop from
    test_skinning) — nothing shared with the production animation code."""
    import numpy as np

    from mrt_tpu.assets.procedural import _mesh
    from mrt_tpu.engine.scene import SkinData
    from mrt_tpu.skinning import animation as anim
    from oracle_renderer import render_oracle  # noqa: F811
    from test_skinning import naive_lbs

    # hand-built "flag": 2x6 vertex strip in the XY plane, bottom at y=0
    xs = np.array([-0.25, 0.25], np.float32)
    ys = np.linspace(0.0, 1.0, 6).astype(np.float32)
    P = np.array([[x, y, 0.0] for y in ys for x in xs], np.float32)
    quads = []
    for rrow in range(5):
        a, b = 2 * rrow, 2 * rrow + 1
        c, d = 2 * rrow + 2, 2 * rrow + 3
        quads += [(a, b, d), (a, d, c)]
    idx = np.asarray(quads, np.int32)
    mesh = _mesh(P, idx)

    # 2-joint chain: j0 at origin, j1 at (0, 0.5, 0); hard+blended weights
    rest = np.array([[0, 0, 0], [0, 0.5, 0]], np.float32)
    ji = np.zeros((P.shape[0], 4), np.int32)
    jw = np.zeros((P.shape[0], 4), np.float32)
    for v in range(P.shape[0]):
        y = P[v, 1]
        if abs(y - 0.4) < 1e-3 or abs(y - 0.6) < 1e-3:
            ji[v, :2] = [0, 1]
            jw[v, :2] = [0.5, 0.5]  # blended band exercises real LBS mixing
        elif y < 0.5:
            jw[v, 0] = 1.0
        else:
            ji[v, 0] = 1
            jw[v, 0] = 1.0

    # constant-pose clip: joint1 bent 0.5 rad about Z at every key
    theta = 0.5
    q1 = np.array([0, 0, np.sin(theta / 2), np.cos(theta / 2)], np.float32)
    times = np.array([0.0, 1.0], np.float32)
    trans = np.zeros((2, 2, 3), np.float32)
    trans[:, 0] = rest[0]
    trans[:, 1] = rest[1] - rest[0]  # local offset
    rots = np.zeros((2, 2, 4), np.float32)
    rots[:, 0] = [0, 0, 0, 1]
    rots[:, 1] = q1
    scales = np.ones((2, 2, 3), np.float32)
    paths = ["root/joint0", "root/joint0/joint1"]  # matches _attach_swing_rig
    clip = anim.AnimationClip(joint_paths=paths, times=times,
                              translations=trans, rotations=rots, scales=scales)

    def T4(v):
        m = np.eye(4, dtype=np.float64)
        m[:3, 3] = v
        return m

    def Rz(a):
        m = np.eye(4, dtype=np.float64)
        c, s = np.cos(a), np.sin(a)
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
        return m

    # expected joint matrices, composed by hand:
    # global0 = T(rest0) = I; global1 = global0 @ T(off1) @ Rz(theta)
    # skin_j  = global_j @ T(-rest_j)
    g0 = T4(rest[0])
    g1 = g0 @ T4(rest[1] - rest[0]) @ Rz(theta)
    mats = np.stack([g0 @ T4(-rest[0]), g1 @ T4(-rest[1])])
    want_pos, want_nrm = naive_lbs(P, mesh.normals, ji, jw, mats)

    size = 20
    scene = Scene(width=size, height=size)
    flag = Model("flag", mesh=mesh, position=[0, 0.2, 0.5])
    flag.skin = SkinData(joint_indices=ji, joint_weights=jw, rest_joints=rest)
    from mrt_tpu.engine.appscene import _attach_swing_rig  # skeleton builder
    # build the skeleton exactly like a rigged asset would, then pin the clip
    _attach_swing_rig(flag)
    flag.skin.animation = clip
    scene.models = [flag, Model("plane", position=[0, 0, 0], scale=10)]

    r = _small_renderer(scene, size, spp=2, bounces=2)
    got = np.asarray(r.draw(1 / 60.0))

    data, camera, _verts, _normals, lights = _oracle_inputs(r)
    # replace the flag's slice of the world pool with the HAND-POSED verts
    inst, start, count = r.statics.skin_slices[0]
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos = np.asarray(data.positions_obj).copy()
    nrm = np.asarray(data.normals_obj).copy()
    pos[start : start + count] = want_pos
    nrm[start : start + count] = want_nrm
    verts_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    normals_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], nrm)

    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=2, max_bounces=2, frame_index=0,
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"skinned e2e vs oracle relative RMSE {rel:.4f}"


def test_normal_map_matches_oracle(tmp_path):
    """Tangent-basis normal mapping (Raytracing.metal:185-218,492-504): the
    uv-gradient tangent, Gram-Schmidt orthonormalization, and TBN transform
    must match the oracle's scalar reimplementation on a bumpy floor."""
    from PIL import Image

    from mrt_tpu.assets.obj import MaterialDef
    from mrt_tpu.assets import procedural

    rng_img = np.random.default_rng(9)
    nm = np.full((8, 8, 3), 128.0)
    nm[..., :2] += rng_img.uniform(-80, 80, (8, 8, 2))
    nm[..., 2] = 255
    nm8 = np.clip(nm, 0, 255).astype(np.uint8)
    path = tmp_path / "nmap.png"
    Image.fromarray(nm8, "RGB").save(path)

    size = 20
    floor = procedural.plane(
        material=MaterialDef(name="bumpy", base_color=(0.8, 0.8, 0.8),
                             map_normal=str(path)))
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("s", mesh=procedural.uv_sphere(6, 12), position=[0, 0.5, 0.8], scale=0.4),
        Model("floor", mesh=floor, position=[0, 0, 0], scale=10),
    ]
    r = _small_renderer(scene, size, spp=2, bounces=2)
    r.use_mipmaps = False
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    from mrt_tpu.core import types as T

    flags = np.asarray(data.materials.texture_flags)
    lin = nm8.astype(np.float64) / 255.0  # normal maps are linear (not sRGB)
    tex_normal = [lin if (f & T.MATERIAL_TEXTURE_NORMAL) else None for f in flags]
    assert any(t is not None for t in tex_normal)
    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=2, max_bounces=2, frame_index=0,
        uvs=np.asarray(data.uvs), tex_normal=tex_normal,
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"normal mapping vs oracle relative RMSE {rel:.4f}"


def test_pbr_and_opacity_maps_match_oracle(tmp_path):
    """Roughness/metallic/opacity/emission maps through the full shade path
    (Raytracing.metal:399-456 sampling + :692-748 GGX/throughput + :517-576
    sampled-opacity glass): GGX at non-default roughness/metallic and the
    opacity-map-only transparency case had no independent check. Also guards
    the has_refraction fix (opacity MAP with constant opacity 1.0 must
    compile the glass branch in)."""
    from PIL import Image

    from mrt_tpu.assets.obj import MaterialDef
    from mrt_tpu.assets import procedural
    from mrt_tpu.core import types as T

    rng_img = np.random.default_rng(21)

    def png(name, arr):
        pth = tmp_path / name
        Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), "RGB").save(pth)
        return str(pth), np.clip(arr, 0, 255) / 255.0

    rough_p, rough_lin = png("rough.png", rng_img.uniform(40, 250, (8, 8, 3)))
    metal_p, metal_lin = png("metal.png", np.where(
        rng_img.random((8, 8, 3)) > 0.5, 230.0, 10.0))
    op = np.full((8, 8, 3), 255.0)
    op[::2, ::2] = 150.0  # translucent texels; constant opacity stays 1.0
    op_p, op_lin = png("op.png", op)
    emis = np.zeros((8, 8, 3))
    emis[:4] = [40.0, 220.0, 90.0]
    emis_p, emis_srgb = png("emis.png", emis)
    emis_lin = np.where(emis_srgb <= 0.04045, emis_srgb / 12.92,
                        ((emis_srgb + 0.055) / 1.055) ** 2.4)

    size = 20
    floor = procedural.plane(material=MaterialDef(
        name="pbr", base_color=(0.8, 0.75, 0.7),
        map_roughness=rough_p, map_metallic=metal_p, map_opacity=op_p))
    glow = procedural.uv_sphere(6, 12, material=MaterialDef(
        name="glow", base_color=(0.2, 0.2, 0.2), map_emission=emis_p))
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("g", mesh=glow, position=[0, 0.5, 0.6], scale=0.4),
        Model("floor", mesh=floor, position=[0, 0, 0], scale=10),
    ]
    r = _small_renderer(scene, size, spp=2, bounces=2)
    r.use_mipmaps = False
    assert r.statics.has_refraction  # opacity MAP alone must enable glass
    got = np.asarray(r.draw())

    data, camera, verts_w, normals_w, lights = _oracle_inputs(r)
    flags = np.asarray(data.materials.texture_flags)

    def per_res(bit, img):
        return [img if (f & bit) else None for f in flags]

    want = render_oracle(
        size, size, camera, np.asarray(r.offsets), verts_w, normals_w,
        np.asarray(data.indices), np.asarray(data.tri_resource),
        np.asarray(data.materials.base_color), np.asarray(data.materials.emission),
        lights, spp=2, max_bounces=2, frame_index=0,
        opacity=np.asarray(data.materials.opacity),
        ior=np.asarray(data.materials.refraction_index),
        uvs=np.asarray(data.uvs),
        tex_rough=per_res(T.MATERIAL_TEXTURE_ROUGHNESS, rough_lin),
        tex_metal=per_res(T.MATERIAL_TEXTURE_METALLIC, metal_lin),
        tex_opacity=per_res(T.MATERIAL_TEXTURE_OPACITY, op_lin),
        tex_emission=per_res(T.MATERIAL_TEXTURE_EMISSION, emis_lin),
    )
    rel = I.relative_rmse(got, want)
    assert rel < 0.01, f"pbr/opacity maps vs oracle relative RMSE {rel:.4f}"
