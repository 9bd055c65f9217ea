"""Generate tests/fixtures/tube_crate.usdz — the same rigged tube as
tube.usdz but stored as a BINARY usdc crate layer (assets/usdc.py writer),
exercising the crate decode path end-to-end."""

import io
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrt_tpu.assets import usdc
from scripts.make_usdz_fixture import tube_geometry


def build_crate() -> bytes:
    pts, faces, ji, jw = tube_geometry()
    w = usdc.CrateWriter()

    ident = np.eye(4)
    bind1 = np.eye(4)
    bind1[3, 1] = 1.0  # USD row-vector convention: translation in row 3

    # pseudo-root spec with stage metadata
    w.add_spec("/", usdc.SPEC_PSEUDO_ROOT, {
        "timeCodesPerSecond": w.rep_scalar(usdc.T_DOUBLE, 24.0),
        "upAxis": w.rep_token("Y"),
        "defaultPrim": w.rep_token("root"),
    })
    w.add_spec("/root", usdc.SPEC_PRIM, {
        "typeName": w.rep_token("Xform"),
        "specifier": (usdc.T_SPECIFIER << 48) | usdc._INLINED_BIT | 0,
    })
    w.add_spec("/root/tube", usdc.SPEC_PRIM, {
        "typeName": w.rep_token("Mesh"),
        "specifier": (usdc.T_SPECIFIER << 48) | usdc._INLINED_BIT | 0,
    })
    mesh_attrs = {
        "points": w.rep_array(usdc.T_VEC3F, np.asarray(pts, np.float32)),
        "faceVertexCounts": w.rep_array(
            usdc.T_INT, np.full(len(faces), 4, np.int32)),
        "faceVertexIndices": w.rep_array(
            usdc.T_INT, np.asarray(faces, np.int32).reshape(-1)),
        "primvars:displayColor": w.rep_array(
            usdc.T_VEC3F, np.asarray([[0.8, 0.5, 0.2]], np.float32)),
        "primvars:skel:jointIndices": w.rep_array(
            usdc.T_INT, np.asarray(ji, np.int32).reshape(-1)),
        "primvars:skel:jointWeights": w.rep_array(
            usdc.T_FLOAT, np.asarray(jw, np.float32).reshape(-1)),
        "primvars:skel:geomBindTransform": w.rep_matrix4d(ident),
    }
    for name, rep in mesh_attrs.items():
        fields = {"default": rep}
        if name == "primvars:skel:jointIndices":
            # elementSize rides as field metadata on the attribute spec
            fields["elementSize"] = w.rep_scalar(usdc.T_INT, 4)
        w.add_spec(f"/root/tube.{name}", usdc.SPEC_ATTRIBUTE, fields)

    w.add_spec("/root/skel", usdc.SPEC_PRIM, {
        "typeName": w.rep_token("Skeleton"),
        "specifier": (usdc.T_SPECIFIER << 48) | usdc._INLINED_BIT | 0,
    })
    w.add_spec("/root/skel.joints", usdc.SPEC_ATTRIBUTE, {
        "default": w.rep_token_array(["base", "base/top"]),
    })
    w.add_spec("/root/skel.bindTransforms", usdc.SPEC_ATTRIBUTE, {
        "default": w.rep_array(usdc.T_MATRIX4D, np.stack([ident, bind1])),
    })
    w.add_spec("/root/skel.restTransforms", usdc.SPEC_ATTRIBUTE, {
        "default": w.rep_array(usdc.T_MATRIX4D, np.stack([ident, bind1])),
    })

    w.add_spec("/root/skel/anim", usdc.SPEC_PRIM, {
        "typeName": w.rep_token("SkelAnimation"),
        "specifier": (usdc.T_SPECIFIER << 48) | usdc._INLINED_BIT | 0,
    })
    w.add_spec("/root/skel/anim.joints", usdc.SPEC_ATTRIBUTE, {
        "default": w.rep_token_array(["base", "base/top"]),
    })
    times = np.linspace(0, 24, 9)
    rot_samples = {}
    trans_samples = {}
    for k, t in enumerate(times):
        ang = 0.6 * np.sin(2 * np.pi * k / 8)
        rot_samples[float(t)] = np.asarray(
            [[1, 0, 0, 0], [np.cos(ang / 2), 0, 0, np.sin(ang / 2)]], np.float32)
        trans_samples[float(t)] = np.asarray([[0, 0, 0], [0, 1, 0]], np.float32)
    w.add_spec("/root/skel/anim.rotations", usdc.SPEC_ATTRIBUTE, {
        "timeSamples": w.rep_time_samples(rot_samples, usdc.T_QUATF),
    })
    w.add_spec("/root/skel/anim.translations", usdc.SPEC_ATTRIBUTE, {
        "timeSamples": w.rep_time_samples(trans_samples, usdc.T_VEC3F),
    })
    w.add_spec("/root/skel/anim.scales", usdc.SPEC_ATTRIBUTE, {
        "timeSamples": w.rep_time_samples(
            {0.0: np.ones((2, 3), np.float32), 24.0: np.ones((2, 3), np.float32)},
            usdc.T_VEC3H),
    })
    return w.tobytes()


def main(out_path="tests/fixtures/tube_crate.usdz"):
    crate = build_crate()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("tube.usdc", crate)
    with open(out_path, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main(*sys.argv[1:])
