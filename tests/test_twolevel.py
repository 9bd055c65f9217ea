"""Two-level BLAS/TLAS instancing tests: correctness vs brute force on the
flattened world geometry, shared-BLAS accounting, and large-move robustness
(the flattened design's rebuild_bvh footgun, VERDICT round-1 missing #4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mrt_tpu.bvh import intersect, twolevel
from mrt_tpu.core.types import Rays
from mrt_tpu.engine.scene import Model, Scene


def _scene():
    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[-1.0, 0.5, 0.0], scale=0.5),
        Model("sphere", position=[1.2, 0.7, 0.3], rotation=[0.3, 1.1, 0.0], scale=0.8),
        Model("plane", position=[0, 0, 0], scale=8),
        Model("sphere", position=[0.0, 1.4, -1.0], scale=0.3),
    ]
    return scene


def _world_tris(scene_data):
    from mrt_tpu.engine.scene import world_geometry

    pos_w, _, _ = world_geometry(scene_data)
    idx = scene_data.indices
    return (
        jnp.take(pos_w, idx[:, 0], axis=0),
        jnp.take(pos_w, idx[:, 1], axis=0),
        jnp.take(pos_w, idx[:, 2], axis=0),
    )


def _rays(n, rng, spread=5.0):
    origin = ((rng.random((n, 3)) * 2 - 1) * spread).astype(np.float32)
    origin[:, 1] = np.abs(origin[:, 1])  # above the plane
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(jnp.asarray(origin), jnp.asarray(d),
                jnp.full((n,), np.inf, jnp.float32))


def test_two_level_matches_brute_force():
    scene = _scene()
    data, statics = scene.compile()
    bvh = twolevel.build(scene.models, data, statics.skin_slices)

    # shared-mesh accounting: the three spheres share ONE BLAS group
    assert len(bvh.mesh_meta) == 2  # sphere group + plane group
    assert bvh.n_instances == 4

    rng = np.random.default_rng(3)
    rays = _rays(512, rng)
    v0, v1, v2 = _world_tris(data)
    want = intersect.brute_force_closest_hit(rays, v0, v1, v2)
    got = twolevel.closest_hit(bvh, rays, t_min=1e-4, stream_window=128,
                               refill_every=4)

    m = np.asarray(want.triangle >= 0)
    assert (np.asarray(got.triangle >= 0) == m).all()
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=2e-4, atol=1e-4
    )
    tie = np.isclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-4, atol=1e-5)
    assert (np.asarray(got.triangle)[m] == np.asarray(want.triangle)[m])[tie[m]].mean() > 0.99

    capped = rays._replace(max_distance=jnp.full_like(rays.max_distance, 4.0))
    occ = np.asarray(twolevel.any_hit(bvh, capped, t_min=1e-4, stream_window=128))
    occ_want = np.asarray(intersect.brute_force_any_hit(capped, v0, v1, v2))
    np.testing.assert_array_equal(occ, occ_want)


def test_two_level_large_move_no_rebuild():
    """Moving an instance far only updates its instance/TLAS rows — results
    must match brute force with NO rebuild call (Renderer.swift:1176-1201
    TLAS refit semantics)."""
    scene = _scene()
    data, statics = scene.compile()
    bvh = twolevel.build(scene.models, data, statics.skin_slices)

    scene.models[0].position = np.asarray([6.0, 2.0, -4.0], np.float32)
    new_tfm = jnp.asarray(scene.instance_transforms())
    data = data._replace(instance_transform=new_tfm)
    bvh = twolevel.refit(bvh, data.positions_obj, data.instance_transform)

    rng = np.random.default_rng(5)
    rays = _rays(384, rng, spread=8.0)
    v0, v1, v2 = _world_tris(data)
    want = intersect.brute_force_closest_hit(rays, v0, v1, v2)
    got = twolevel.closest_hit(bvh, rays, t_min=1e-4, stream_window=128)
    m = np.asarray(want.triangle >= 0)
    assert (np.asarray(got.triangle >= 0) == m).all()
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=2e-4, atol=1e-4
    )


def test_two_level_priming_is_exact():
    scene = _scene()
    data, statics = scene.compile()
    bvh = twolevel.build(scene.models, data, statics.skin_slices)
    rng = np.random.default_rng(7)
    rays = _rays(256, rng)
    v0, v1, v2 = _world_tris(data)
    tri_rows = jnp.concatenate([v0, v1, v2], axis=1)

    base = twolevel.closest_hit(bvh, rays, t_min=1e-4, stream_window=128)
    true_tri = np.asarray(base.triangle)
    n_tf = int(data.indices.shape[0])
    cand = np.where(
        rng.random(256) < 0.4, true_tri,
        np.where(rng.random(256) < 0.5, rng.integers(0, n_tf, 256), -1),
    ).astype(np.int32)
    primed = twolevel.closest_hit(
        bvh, rays, t_min=1e-4, stream_window=128,
        prime_tri=jnp.asarray(cand), tri_rows=tri_rows,
    )
    np.testing.assert_array_equal(np.asarray(primed.triangle), true_tri)

    capped = rays._replace(max_distance=jnp.full_like(rays.max_distance, 4.0))
    occ0 = np.asarray(twolevel.any_hit(bvh, capped, t_min=1e-4, stream_window=128))
    occ1, occ_tri = twolevel.any_hit(
        bvh, capped, t_min=1e-4, stream_window=128,
        prime_tri=jnp.asarray(cand), tri_rows=tri_rows, return_tri=True,
    )
    np.testing.assert_array_equal(np.asarray(occ1), occ0)
    ot = np.asarray(occ_tri)
    assert (ot[occ0] >= 0).all() and (ot[~occ0] == -1).all()


