"""glTF 2.0 loader tests — the rigged-asset pipeline (USDZ-role replacement)."""

import base64
import json
import struct

import numpy as np
import pytest

from mrt_tpu.assets.gltf import load_gltf


def _make_skinned_gltf(tmp_path):
    """Two-triangle vertical quad skinned to a 2-joint chain with a rotation
    animation on the second joint."""
    positions = np.array(
        [[-0.5, 0, 0], [0.5, 0, 0], [-0.5, 1, 0], [0.5, 1, 0]], np.float32
    )
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    joints = np.array([[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.uint8)
    weights = np.array([[1, 0, 0, 0]] * 4, np.float32)
    indices = np.array([0, 1, 2, 2, 1, 3], np.uint16)
    # joint1 sits 1 above joint0; inverse binds undo the global rest transforms
    ibm = np.stack(
        [np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)]
    )
    ibm[1, 3, 1] = -1.0  # column-major storage: translation row
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array(
        [[0, 0, 0, 1], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]], np.float32
    )

    blobs = [positions, normals, joints, weights, indices, ibm, times, rots]
    buf = b""
    views = []
    accessors = []
    comp = {np.float32: 5126, np.uint8: 5121, np.uint16: 5123}
    types = {1: "SCALAR", 2: "VEC2", 3: "VEC3", 4: "VEC4", 16: "MAT4"}
    for arr in blobs:
        start = len(buf)
        raw = arr.tobytes()
        buf += raw + b"\0" * (-len(raw) % 4)
        views.append({"buffer": 0, "byteOffset": start, "byteLength": len(raw)})
        n = 1 if arr.ndim == 1 else int(np.prod(arr.shape[1:]))
        accessors.append(
            {
                "bufferView": len(views) - 1,
                "componentType": comp[arr.dtype.type],
                "count": int(arr.shape[0]),
                "type": types[n],
            }
        )

    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode(),
            }
        ],
        "bufferViews": views,
        "accessors": accessors,
        "nodes": [
            {"name": "mesh", "mesh": 0, "skin": 0},
            {"name": "root_joint", "children": [2]},
            {"name": "tip_joint", "translation": [0, 1, 0]},
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "JOINTS_0": 2, "WEIGHTS_0": 3},
                        "indices": 4,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {"name": "skin_mat", "pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.2, 0.1, 1.0]}}
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 5}],
        "animations": [
            {
                "channels": [{"sampler": 0, "target": {"node": 2, "path": "rotation"}}],
                "samplers": [{"input": 6, "output": 7}],
            }
        ],
        "scenes": [{"nodes": [0, 1]}],
    }
    p = tmp_path / "rig.gltf"
    p.write_text(json.dumps(doc))
    return p


def test_load_skinned_gltf(tmp_path):
    p = _make_skinned_gltf(tmp_path)
    mesh, skin = load_gltf(p)
    assert mesh.positions.shape == (4, 3)
    assert mesh.triangle_count == 2
    np.testing.assert_allclose(mesh.submeshes[0].material.base_color, (0.8, 0.2, 0.1))
    assert skin is not None
    assert skin["joint_indices"].shape == (4, 4)
    sk = skin["skeleton"]
    assert sk.n_joints == 2
    assert list(sk.parent_indices) == [-1, 0]
    clip = skin["animation"]
    assert clip is not None
    assert clip.duration == pytest.approx(1.0)
    t, r, s = clip.sample(1.0)
    np.testing.assert_allclose(r[1], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-6)


def test_skinned_gltf_renders_and_animates(tmp_path):
    import jax

    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.engine.scene import Model, Scene

    p = _make_skinned_gltf(tmp_path)
    from mrt_tpu.assets.gltf import load_gltf
    from mrt_tpu.engine.scene import SkinData

    mesh, si = load_gltf(p)
    model = Model("rig", mesh=mesh, position=[0, 0, 0], scale=1.0,
                  skin=SkinData(**si))
    scene = Scene(width=32, height=32)
    scene.models = [model, Model("plane", scale=10)]
    r = Renderer(scene, output_width=32, output_height=32)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    img0 = np.asarray(r.draw(1 / 60))
    for _ in range(10):
        r.draw(1 / 10)  # the quad's top half swings via the animated joint
    img1 = np.asarray(r.accum)
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).mean() > 1e-6


def test_glb_container(tmp_path):
    # wrap the same JSON doc into a .glb binary container
    src = _make_skinned_gltf(tmp_path)
    doc = json.loads(src.read_text())
    uri = doc["buffers"][0].pop("uri")
    blob = base64.b64decode(uri.split(",", 1)[1])
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\0" * (-len(blob) % 4)
    glb = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8 + len(blob))
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(blob), 0x004E4942) + blob
    p = tmp_path / "rig.glb"
    p.write_bytes(glb)
    mesh, skin = load_gltf(p)
    assert mesh.triangle_count == 2 and skin is not None
