"""Independent validation of primary depth + motion vectors
(Raytracing.metal:342-389 semantics): a scalar numpy reimplementation from
the spec — camera-ray gen with the sample-0 Halton jitter, brute-force
intersection, projection into current and previous cameras — must match the
renderer's depth/motion buffers after a camera orbit. These buffers drive
the temporal upscaler's reprojection; a sign or scale error would silently
ghost every temporal mode.
"""

import numpy as np

from mrt_tpu import Renderer, UPSCALER_OFF
from mrt_tpu.core.halton import halton_np
from mrt_tpu.engine.scene import Model, Scene
from mrt_tpu.assets import procedural

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_renderer import _intersect_all  # noqa: E402


def _cam_np(c):
    return {k: np.asarray(getattr(c, k), np.float64)
            for k in ("position", "right", "up", "forward")}


def _project_np(cam, p):
    view = p - cam["position"]
    sx = view @ cam["right"]
    sy = view @ cam["up"]
    depth = view @ cam["forward"]
    denom = max(depth, 0.001)
    return sx / denom, sy / denom, depth


def test_depth_and_motion_match_independent_projection():
    size = 24
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("s", mesh=procedural.uv_sphere(8, 16), position=[0, 0.5, 0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=size, output_height=size, seed=11)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False

    r.draw()
    cam_prev = _cam_np(r.current_camera())
    r.orbit(4.0, 2.0)  # camera moves; accumulation resets (frame_index = 0)
    cam_cur = _cam_np(r.current_camera())
    r.draw()
    depth = np.asarray(r.depth)
    motion = np.asarray(r.motion)
    offsets = np.asarray(r.offsets)

    # static scene: current and previous world geometry are identical
    data = r.scene_data
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos = np.asarray(data.positions_obj)
    verts_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    idx = np.asarray(data.indices)
    v0, v1, v2 = verts_w[idx[:, 0]], verts_w[idx[:, 1]], verts_w[idx[:, 2]]

    checked = 0
    for y in range(size):
        for x in range(size):
            i_h = int(offsets[y, x])  # frame_index 0, sample 0
            r0, r1 = halton_np(i_h, 0), halton_np(i_h, 1)
            u = (x + r0) / size * 2.0 - 1.0
            v = (y + r1) / size * 2.0 - 1.0
            ro = cam_cur["position"]
            rd = u * cam_cur["right"] + v * cam_cur["up"] + cam_cur["forward"]
            rd = rd / np.linalg.norm(rd)
            tri, t, bu, bv = _intersect_all(ro, rd, v0, v1, v2, 0.0, np.inf)
            if tri < 0:
                continue
            p = ro + rd * t
            sx, sy, d = _project_np(cam_cur, p)
            psx, psy, _ = _project_np(cam_prev, p)
            mx = (sx - psx) * size / (2.0 * np.linalg.norm(cam_cur["right"]))
            my = -(sy - psy) * size / (2.0 * np.linalg.norm(cam_cur["up"]))
            assert abs(depth[y, x] - max(d, 1e-3)) < 1e-2 * max(1.0, d), (y, x)
            assert abs(motion[y, x, 0] - mx) < 0.05, (y, x, motion[y, x], mx, my)
            assert abs(motion[y, x, 1] - my) < 0.05, (y, x, motion[y, x], mx, my)
            checked += 1
    assert checked > size * size // 3  # most pixels hit geometry
    # the orbit must produce real motion somewhere (sign/scale can't be
    # validated by an all-zero field)
    assert np.abs(motion).max() > 0.5
