"""Generate tests/fixtures/tube.usdz — a small rigged, animated tube used by
the USDZ loader tests (the robot.usdz stand-in fixture, Model.swift:63-122).

The archive follows the usdz spec: a single uncompressed (stored) usda layer.
"""

import io
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tube_geometry(segments_h=6, segments_r=8, height=2.0, radius=0.25):
    pts = []
    ji = []
    jw = []
    for h in range(segments_h + 1):
        y = height * h / segments_h
        t = h / segments_h
        for r in range(segments_r):
            a = 2 * np.pi * r / segments_r
            pts.append((radius * np.cos(a), y, radius * np.sin(a)))
            # blend between joint0 (base) and joint1 (top)
            w1 = t
            ji.append((0, 1, 0, 0))
            jw.append((1.0 - w1, w1, 0.0, 0.0))
    faces = []
    for h in range(segments_h):
        for r in range(segments_r):
            a = h * segments_r + r
            b = h * segments_r + (r + 1) % segments_r
            c = (h + 1) * segments_r + (r + 1) % segments_r
            d = (h + 1) * segments_r + r
            faces.append((a, b, c, d))
    return pts, faces, ji, jw


def fmt_pts(pts):
    return ", ".join(f"({p[0]:.5f}, {p[1]:.5f}, {p[2]:.5f})" for p in pts)


def main(out_path="tests/fixtures/tube.usdz"):
    pts, faces, ji, jw = tube_geometry()
    counts = ", ".join("4" for _ in faces)
    indices = ", ".join(str(i) for f in faces for i in f)
    ji_flat = ", ".join(str(i) for v in ji for i in v)
    jw_flat = ", ".join(f"{w:.4f}" for v in jw for w in v)

    # two-joint chain along +Y; bind = rest (world)
    ident = "( (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1) )"
    bind1 = "( (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 1, 0, 1) )"
    rest1 = bind1  # local == world for a chain with identity root

    # swing animation: joint1 rotates about Z, quats are (w, x, y, z) in USD
    keys = []
    for k, t in enumerate(np.linspace(0, 24, 9)):
        ang = 0.6 * np.sin(2 * np.pi * k / 8)
        w, z = np.cos(ang / 2), np.sin(ang / 2)
        keys.append((t, w, z))
    rot_samples = ",\n            ".join(
        f"{t:g}: [(1, 0, 0, 0), ({w:.6f}, 0, 0, {z:.6f})]" for t, w, z in keys
    )
    trans_samples = ",\n            ".join(
        f"{t:g}: [(0, 0, 0), (0, 1, 0)]" for t, _, _ in keys
    )

    usda = f"""#usda 1.0
(
    defaultPrim = "root"
    timeCodesPerSecond = 24
    upAxis = "Y"
)

def Xform "root"
{{
    def Mesh "tube" (
        prepend apiSchemas = ["SkelBindingAPI"]
    )
    {{
        int[] faceVertexCounts = [{counts}]
        int[] faceVertexIndices = [{indices}]
        point3f[] points = [{fmt_pts(pts)}]
        color3f[] primvars:displayColor = [(0.8, 0.5, 0.2)]
        int[] primvars:skel:jointIndices = [{ji_flat}] (
            elementSize = 4
            interpolation = "vertex"
        )
        float[] primvars:skel:jointWeights = [{jw_flat}] (
            elementSize = 4
            interpolation = "vertex"
        )
        matrix4d primvars:skel:geomBindTransform = {ident}
        rel skel:skeleton = </root/skel>
    }}

    def Skeleton "skel"
    {{
        uniform token[] joints = ["base", "base/top"]
        uniform matrix4d[] bindTransforms = [{ident}, {bind1}]
        uniform matrix4d[] restTransforms = [{ident}, {rest1}]

        def SkelAnimation "anim"
        {{
            uniform token[] joints = ["base", "base/top"]
            float3[] translations.timeSamples = {{
            {trans_samples}
            }}
            quatf[] rotations.timeSamples = {{
            {rot_samples}
            }}
            half3[] scales.timeSamples = {{
            {keys[0][0]:g}: [(1, 1, 1), (1, 1, 1)],
            {keys[-1][0]:g}: [(1, 1, 1), (1, 1, 1)]
            }}
        }}
    }}
}}
"""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("tube.usda", usda)
    with open(out_path, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main(*sys.argv[1:])
