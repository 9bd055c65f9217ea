"""Skinning + animation tests (skinningKernel semantics, Skinning.metal:7-49;
Model.update pipeline, Model.swift:207-261)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mrt_tpu.skinning import animation as anim
from mrt_tpu.skinning import lbs
from mrt_tpu.utils import math3d


def naive_lbs(positions, normals, ji, jw, mats):
    """Direct port of the Metal kernel loop — the oracle."""
    out_p = np.zeros_like(positions)
    out_n = np.zeros_like(normals)
    for v in range(positions.shape[0]):
        w = jw[v].astype(np.float64)
        if w.sum() < 1e-4:
            w = np.array([1.0, 0.0, 0.0, 0.0])
        p = np.zeros(4)
        n = np.zeros(3)
        for k in range(4):
            m = mats[ji[v, k]]
            p += w[k] * (m @ np.append(positions[v], 1.0))
            n += w[k] * (m[:3, :3] @ normals[v])
        out_p[v] = p[:3]
        out_n[v] = n
    return out_p.astype(np.float32), out_n.astype(np.float32)


def test_lbs_matches_naive():
    rng = np.random.default_rng(0)
    V, J = 200, 7
    positions = rng.standard_normal((V, 3)).astype(np.float32)
    normals = rng.standard_normal((V, 3)).astype(np.float32)
    ji = rng.integers(0, J, (V, 4)).astype(np.int32)
    jw = rng.random((V, 4)).astype(np.float32)
    jw[:5] = 0.0  # exercise the zero-weight fallback
    mats = np.stack([math3d.trs(rng.standard_normal(3), rng.standard_normal(3) * 0.3, 1.0 + rng.random()) for _ in range(J)])

    dense = lbs.dense_weights(ji, jw, J)
    got_p, got_n = lbs.skin(jnp.asarray(dense), jnp.asarray(mats), jnp.asarray(positions), jnp.asarray(normals))
    want_p, want_n = naive_lbs(positions, normals, ji, jw, mats)
    np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_n), want_n, rtol=1e-4, atol=1e-4)


def test_weights_not_normalized():
    # weights sum to 2 -> doubled positions (used as authored)
    V, J = 4, 2
    positions = np.ones((V, 3), np.float32)
    normals = np.zeros((V, 3), np.float32)
    ji = np.zeros((V, 4), np.int32)
    jw = np.zeros((V, 4), np.float32)
    jw[:, 0] = 2.0
    dense = lbs.dense_weights(ji, jw, J)
    mats = np.stack([np.eye(4, dtype=np.float32)] * J)
    got_p, _ = lbs.skin(jnp.asarray(dense), jnp.asarray(mats), jnp.asarray(positions), jnp.asarray(normals))
    np.testing.assert_allclose(np.asarray(got_p), positions * 2.0, atol=1e-6)


def test_geometry_bind_composition():
    # SkinningPass.swift:150: gbInv @ skin @ gb
    rng = np.random.default_rng(1)
    skin_m = np.stack([math3d.trs(rng.standard_normal(3), [0.1, 0.2, 0.3], 1.5)])
    gb = math3d.trs([1, 2, 3], [0, 0.5, 0], 2.0)
    got = lbs.compose_final_matrices(skin_m, gb)
    want = np.linalg.inv(gb) @ skin_m[0] @ gb
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_joint_path_fuzzy_mapping():
    # Model.swift:439-499: exact, unique-suffix, unique-tail
    paths = ["/root/hips/spine", "/root/hips/leg_l", "/root/hips/leg_r"]
    p2i = anim.build_path_index_map(paths)
    t2i = anim.build_tail_index_map(paths)
    assert anim.map_joint_path("root/hips/spine", p2i, t2i) == 0
    assert anim.map_joint_path("hips/spine", p2i, t2i) == 0  # unique suffix
    assert anim.map_joint_path("other/prefix/leg_l", p2i, t2i) == 1  # unique tail
    assert anim.map_joint_path("nonexistent", p2i, t2i) == -1
    # ambiguous tail is NOT mapped
    paths2 = ["/a/j", "/b/j"]
    p2 = anim.build_path_index_map(paths2)
    t2 = anim.build_tail_index_map(paths2)
    assert anim.map_joint_path("c/j", p2, t2) == -1


def test_skeleton_global_transforms():
    # chain of 3 joints, each translated +1 in Y locally
    paths = ["r", "r/a", "r/a/b"]
    local = np.stack([math3d.translate([0, 1, 0])] * 3)
    sk = anim.Skeleton(joint_paths=paths, rest_transforms=local, inverse_bind_transforms=np.stack([np.eye(4, dtype=np.float32)] * 3))
    assert list(sk.parent_indices) == [-1, 0, 1]
    g = sk.compute_global_transforms(local)
    np.testing.assert_allclose(g[2][:3, 3], [0, 3, 0], atol=1e-6)


def test_clip_sampling_interp_and_duration():
    paths = ["r"]
    times = np.array([0.0, 1.0], np.float32)
    tr = np.array([[[0, 0, 0]], [[2, 0, 0]]], np.float32)
    ro = np.array([[[0, 0, 0, 1]], [[0, 0, 0, 1]]], np.float32)
    sc = np.ones((2, 1, 3), np.float32)
    clip = anim.AnimationClip(paths, times, tr, ro, sc)
    assert clip.duration == 1.0
    t, r, s = clip.sample(0.5)
    np.testing.assert_allclose(t[0], [1, 0, 0], atol=1e-6)
    # advance_time wraps (Model.swift:209-215)
    assert anim.advance_time(0.8, 0.5, 1.0) == pytest.approx(0.3)
    assert anim.advance_time(0.8, 0.5, 0.0) == 0.8  # no duration: unchanged


def test_skinned_render_end_to_end():
    """Config-4 shape: skinned tube + per-frame refit; pose change moves pixels."""
    import os

    from mrt_tpu.assets import procedural
    from mrt_tpu.engine.appscene import _attach_swing_rig
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.engine.scene import Model, Scene, SkinData

    mesh, ji, jw, rest = procedural.skinned_cylinder(segments_h=6, segments_r=6, n_joints=3)
    scene = Scene(width=48, height=48)
    robot = Model("tube", mesh=mesh, position=[0, 0, 0], scale=0.5)
    robot.skin = SkinData(joint_indices=ji, joint_weights=jw, rest_joints=rest)
    _attach_swing_rig(robot)
    scene.models = [robot, Model("plane", scale=10)]
    r = Renderer(scene, output_width=48, output_height=48)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    img0 = np.asarray(r.draw(1 / 60))
    for _ in range(15):
        r.draw(1 / 15)  # large steps -> visible pose change
    img1 = np.asarray(r.accum)
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).mean() > 1e-5
    assert np.abs(np.asarray(r.motion)).max() > 0.0
