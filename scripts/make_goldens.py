"""One-time generation of the config-3 / config-4 goldens (VERDICT r2 item 7).

Protocol: cross-check the renderer against independent evidence FIRST, and
only if every check passes, freeze the golden renders into tests/goldens/.
After generation the committed tests compare against the frozen arrays only
(tests/test_golden.py); regenerate exclusively on intentional semantic change.

Cross-checks performed here (once):
  * config 3 (glass + textures + 4 light types): the scalar NumPy oracle
    (tests/oracle_renderer.py) on the SAME scene minus textures — the oracle
    deliberately has no texture path, so texture behavior is covered by the
    committed tests/test_textured_render.py suite instead.
  * config 4 (skinned robot + refit + motion): LBS itself is oracle-checked
    in tests/test_skinning.py (naive_lbs); here we check frame-2 refit
    equals a from-scratch BVH rebuild on the deformed geometry, and that the
    motion buffer is non-zero on the animated robot but zero on the static
    background.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))

from golden_scenes import config3_renderer, config4_renderer  # noqa: E402
from oracle_renderer import render_oracle  # noqa: E402

from mrt_tpu.utils import image as I  # noqa: E402

GOLDENS = REPO / "tests" / "goldens"


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


def crosscheck_config3():
    size = 20
    r = config3_renderer(size=size, textured=False, spp=2, bounces=2,
                         sphere_res=(6, 12))
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
    print(f"config3 cross-check (glass + emission + 4 light types, {size}^2): "
          f"relative RMSE vs oracle = {rel:.4f}")
    assert rel < 0.01, "config3 scene disagrees with the independent oracle"


def make_config3():
    r = config3_renderer(size=128)
    for _ in range(6):
        img = np.asarray(r.draw())
    assert np.isfinite(img).all()
    acc = np.asarray(r.accum)
    I.save_golden(str(GOLDENS / "config3_full_shading.npz"), acc)
    print(f"config3 golden saved: mean={acc.mean():.4f} max={acc.max():.4f}")


def crosscheck_and_make_config4():
    r = config4_renderer(size=64)
    r.draw(1 / 30.0)
    img2 = np.asarray(r.draw(1 / 30.0))
    assert np.isfinite(img2).all()
    accum_refit = np.asarray(r.accum)
    motion = np.asarray(r.motion)
    depth = np.asarray(r.depth)

    # motion sanity: the swinging robot moves, the floor does not
    speed = np.linalg.norm(motion, axis=-1)
    moving = speed > 0.05
    assert moving.any(), "no motion detected on the animated robot"
    assert (speed < 1e-3).sum() > moving.sum(), "static background should dominate"

    # refit-vs-rebuild: a from-scratch BVH over the deformed frame-2 geometry
    # must render the same image as the per-frame refit path
    r2 = config4_renderer(size=64)
    r2.draw(1 / 30.0)
    r2.rebuild_bvh()
    r2.draw(1 / 30.0)
    rel = I.relative_rmse(np.asarray(r2.accum), accum_refit)
    print(f"config4 refit-vs-rebuild relative RMSE = {rel:.5f}")
    assert rel < 1e-3, "refit diverges from a full rebuild on deformed geometry"

    np.savez_compressed(
        GOLDENS / "config4_skinned_motion.npz",
        image=accum_refit.astype(np.float32),
        motion=motion.astype(np.float32),
        depth=depth.astype(np.float32),
    )
    print(f"config4 golden saved: mean={accum_refit.mean():.4f} "
          f"moving_px={int(moving.sum())}")


if __name__ == "__main__":
    crosscheck_config3()
    make_config3()
    crosscheck_and_make_config4()
    print("all goldens written to", GOLDENS)
