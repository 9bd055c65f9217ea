"""Orbit camera parity with Scene.makeOrbitCamera (Scene.swift:126-159)."""

import numpy as np

from mrt_tpu.core import types as T


def test_default_camera_matches_reference_setup():
    # Scene.setupCamera: position (0, 1, 5.38), target origin, fov 45
    target = np.zeros(3)
    pos = np.array([0.0, 1.0, 5.38])
    dist = np.linalg.norm(pos - target)
    azimuth = np.arctan2(pos[0], pos[2])
    elevation = np.arcsin(pos[1] / dist)
    cam = T.orbit_camera(512, 512, target, azimuth, elevation, dist, 45.0)
    np.testing.assert_allclose(np.asarray(cam.position), pos, atol=1e-5)
    # forward is unit, towards target
    fwd = np.asarray(cam.forward)
    np.testing.assert_allclose(np.linalg.norm(fwd), 1.0, atol=1e-6)
    np.testing.assert_allclose(fwd, (target - pos) / dist, atol=1e-5)
    # right/up scaled by image plane half extents: square image, fov 45
    half = np.tan(np.radians(45.0) / 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cam.right)), half, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cam.up)), half, atol=1e-5)
    # orthogonality
    assert abs(np.dot(np.asarray(cam.right), fwd)) < 1e-6
    assert abs(np.dot(np.asarray(cam.up), fwd)) < 1e-6


def test_aspect_ratio_scales_right():
    cam = T.orbit_camera(1920, 1080, [0, 0, 0], 0.3, 0.2, 5.0, 45.0)
    half_h = np.tan(np.radians(45.0) / 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cam.up)), half_h, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.right)), half_h * 1920 / 1080, atol=1e-4
    )


def test_elevation_clamp():
    cam = T.orbit_camera(64, 64, [0, 0, 0], 0.0, np.pi, 5.0, 45.0)  # over the pole
    assert np.isfinite(np.asarray(cam.position)).all()
    # clamped elevation keeps camera just below the pole
    assert np.asarray(cam.position)[1] < 5.0


def test_degenerate_forward_parallel_up():
    # straight-down view: right falls back to (1,0,0) (Scene.swift:143-146)
    cam = T.orbit_camera(64, 64, [0, 0, 0], 0.0, np.pi / 2 - 0.0005, 5.0, 45.0)
    assert np.isfinite(np.asarray(cam.right)).all()
