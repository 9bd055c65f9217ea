"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
sharded vs single-chip equivalence)."""

import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mrt_tpu.core import halton as H
from mrt_tpu.core import types as T
from mrt_tpu.dist.sharding import DistributedRenderer, make_mesh
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _scene(w, h):
    s = Scene(width=w, height=h)
    s.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    return s


def _settings(w, h):
    return T.RenderSettings(
        width=w,
        height=h,
        samples_per_pixel=1,
        max_bounces=2,
        enable_motion_adaptive_sampling=False,
        tile_pixels=w * h // 4,
    )


def test_requires_8_devices():
    assert jax.device_count() >= 8


def test_dp_sharded_matches_single_chip():
    """dp-only sharding must be bit-identical (same Halton indices per pixel)."""
    w = h = 32
    mesh = make_mesh(n_devices=4, sp=1)
    dr = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    sharded = np.asarray(dr.draw())

    r = Renderer(_scene(w, h), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    # allocate state at the new render size FIRST, then pin identical
    # decorrelation offsets (allocation regenerates them)
    r._allocate_state()
    object.__setattr__(r, "offsets", dr.offsets)
    single = np.asarray(r.draw())

    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_dp_sp_sharded_runs_and_reduces_variance():
    """sp shards average decorrelated sample sets -> image is finite and the
    psum-mean actually mixes information (differs from sp=1)."""
    w = h = 32
    dr1 = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=make_mesh(n_devices=4, sp=1))
    dr2 = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=make_mesh(n_devices=8, sp=2))
    a = np.asarray(dr1.draw())
    b = np.asarray(dr2.draw())
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() > 1e-8  # extra samples changed the estimate
    assert np.abs(a - b).mean() < 0.5  # but it's the same image


def test_dp_sharded_skinned_scene_runs():
    """Full sharded step with skinning (the dryrun_multichip path) produces a
    finite image and motion once the pose changes."""
    import __graft_entry__ as g

    scene = g._tiny_scene(32, 32, skinned=True)
    settings = _settings(32, 32)
    dr = DistributedRenderer(scene, settings, mesh=make_mesh(n_devices=4, sp=1))
    a = np.asarray(dr.draw())
    assert np.isfinite(a).all()
    # drive a new pose through set_joint_matrices
    from mrt_tpu.skinning import animation as anim
    from mrt_tpu.skinning import lbs

    i, _, _ = dr.statics.skin_slices[0]
    sk = scene.models[i].skin
    m = anim.compute_joint_matrices(sk.skeleton, sk.animation, 0.4)
    dr.set_joint_matrices((jnp.asarray(lbs.compose_final_matrices(m, sk.geometry_bind)),))
    b = np.asarray(dr.draw())
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 0  # pose changed something


def test_geometry_sharded_matches_single_chip():
    """gp-sharded BVH (rays replicated, hits min-t-combined over ICI) must
    reproduce the single-chip image."""
    import dataclasses

    from mrt_tpu.dist import geometry as G

    w = h = 32
    scene = _scene(w, h)
    settings = _settings(w, h)
    data, statics = scene.compile()

    # single chip reference
    r = Renderer(_scene(w, h), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r._allocate_state()
    single = np.asarray(r.draw())

    # gp=4 sharded
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gp",))
    idx = np.asarray(data.indices)
    pos = np.asarray(data.positions_obj)
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    v0, v1, v2 = pos_w[idx[:, 0]], pos_w[idx[:, 1]], pos_w[idx[:, 2]]
    bvhs, gids, row_gids, shards = G.build_sharded_bvhs(v0, v1, v2, 4)
    assert sum(len(s) for s in shards) == idx.shape[0]
    # triangle-indexed rows are built SHARD-LOCAL inside the step: each
    # chip's shade/motion rows cover ~T/4 (+pad) triangles, not T
    assert gids.shape[1] <= (idx.shape[0] + 3) // 4 + 4

    step = G.build_gp_render_step(settings, statics, mesh)
    cam = r.current_camera()
    from mrt_tpu.core import types as T

    uniforms = T.make_frame_uniforms(camera=cam, frame_index=0)
    accum, depth, motion, _rays = step(
        data, bvhs, uniforms, r.offsets,
        jnp.zeros((h, w, 3), jnp.float32), jnp.zeros((h, w, 2), jnp.float32),
        gids=gids, row_gids=row_gids,
    )
    np.testing.assert_allclose(np.asarray(accum), single, atol=1e-5)


def test_gp_shard_builder_invariants():
    from mrt_tpu.bvh import wide
    from mrt_tpu.dist import geometry as G

    rng = np.random.default_rng(9)
    n = 1000
    base = (rng.random((n, 3)) * 2 - 1) * 3
    v0 = (base + rng.random((n, 3)) * 0.1).astype(np.float32)
    v1 = (base + rng.random((n, 3)) * 0.1).astype(np.float32)
    v2 = (base + rng.random((n, 3)) * 0.1).astype(np.float32)
    stacked, gids, row_gids, shards = G.build_sharded_bvhs(v0, v1, v2, 4)

    # exact partition of triangle ids
    all_ids = np.concatenate(shards)
    assert sorted(all_ids.tolist()) == list(range(n))
    # equalized shapes stack along the leading axis
    assert stacked.table.shape[0] == 4
    assert stacked.node_child.shape[0] == 4
    # leaf ids are shard-LOCAL (refit gathers shard verts); the parallel
    # row-id array carries the GLOBAL ids reported to shading
    leaves = np.asarray(stacked.leaf_tri)
    rg = np.asarray(row_gids)
    g = np.asarray(gids)
    for k in range(4):
        local = leaves[k][leaves[k] >= 0]
        assert local.max() < len(shards[k])
        glob = rg[k][rg[k] >= 0]
        assert set(glob.tolist()) == set(shards[k].tolist())
        # row ids = gids[local ids]
        np.testing.assert_array_equal(
            rg[k][leaves[k] >= 0], g[k][local]
        )


def test_gp_banded_atlas_matches_single_chip():
    """gp with the packed texture atlas row-band-sharded across chips
    (dist/geometry ``atlas_bands`` + texture.sample_packed_banded psum
    reconstruction) must reproduce the single-chip image — the atlas-pages
    follow-through of the gp memory story (VERDICT round-1 missing #6)."""
    from jax.sharding import Mesh

    from mrt_tpu.assets import procedural
    from mrt_tpu.assets import texture as tex
    from mrt_tpu.assets.obj import MaterialDef
    from mrt_tpu.dist import geometry as G

    w = h = 32
    rng = np.random.default_rng(3)
    img_a = rng.random((16, 16, 3)).astype(np.float32)
    img_b = (np.indices((24, 24)).sum(0) % 2).astype(np.float32)  # checker

    def _textured_scene():
        s = Scene(width=w, height=h)
        s.models = [
            Model("tex_sphere", position=[0.0, 0.5, 0.0], scale=0.5,
                  mesh=procedural.uv_sphere(
                      material=MaterialDef(name="a", map_base_color=img_a))),
            Model("tex_plane", position=[0, 0, 0], scale=10,
                  mesh=procedural.plane(
                      material=MaterialDef(name="b", map_base_color=img_b,
                                           map_roughness=img_b))),
        ]
        return s

    settings = _settings(w, h)
    data, statics = _textured_scene().compile()

    r = Renderer(_textured_scene(), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r._allocate_state()
    single = np.asarray(r.draw())

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gp",))
    idx = np.asarray(data.indices)
    pos = np.asarray(data.positions_obj)
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    v0, v1, v2 = pos_w[idx[:, 0]], pos_w[idx[:, 1]], pos_w[idx[:, 2]]
    bvhs, gids, row_gids, _ = G.build_sharded_bvhs(v0, v1, v2, 4)

    bands = tex.band_atlas(data.atlas, 4)
    hp = data.atlas.packed.shape[0]
    assert bands.shape[0] == 4 and bands.shape[1] == -(-hp // 4)

    step = G.build_gp_render_step(settings, statics, mesh, banded=True)
    cam = r.current_camera()
    uniforms = T.make_frame_uniforms(camera=cam, frame_index=0)
    accum, depth, motion, _rays = step(
        data, bvhs, uniforms, r.offsets,
        jnp.zeros((h, w, 3), jnp.float32), jnp.zeros((h, w, 2), jnp.float32),
        gids=gids, row_gids=row_gids, atlas_bands=bands,
    )
    np.testing.assert_allclose(np.asarray(accum), single, atol=1e-5)


def test_dp_gp_combined_mesh_matches_single_chip():
    """Combined ('dp','gp') mesh: image rows shard over dp while geometry +
    atlas bands shard over gp — the aggregate-scaling configuration."""
    from jax.sharding import Mesh

    from mrt_tpu.assets import texture as tex
    from mrt_tpu.dist import geometry as G

    w = h = 32
    scene = _scene(w, h)
    settings = _settings(w, h)
    data, statics = scene.compile()

    r = Renderer(_scene(w, h), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r._allocate_state()
    single = np.asarray(r.draw())

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "gp"))
    idx = np.asarray(data.indices)
    pos = np.asarray(data.positions_obj)
    tfm = np.asarray(data.instance_transform)[np.asarray(data.vertex_instance)]
    pos_w = np.einsum("vij,vj->vi", tfm[:, :3, :3], pos) + tfm[:, :3, 3]
    v0, v1, v2 = pos_w[idx[:, 0]], pos_w[idx[:, 1]], pos_w[idx[:, 2]]
    bvhs, gids, row_gids, _ = G.build_sharded_bvhs(v0, v1, v2, 4)
    bands = tex.band_atlas(data.atlas, 4)

    step = G.build_gp_render_step(settings, statics, mesh, banded=True)
    uniforms = T.make_frame_uniforms(camera=r.current_camera(), frame_index=0)
    accum, depth, motion, _rays = step(
        data, bvhs, uniforms, r.offsets,
        jnp.zeros((h, w, 3), jnp.float32), jnp.zeros((h, w, 2), jnp.float32),
        gids=gids, row_gids=row_gids, atlas_bands=bands,
    )
    np.testing.assert_allclose(np.asarray(accum), single, atol=1e-5)


def test_dp_staged_hint_threading_and_prepare_cache():
    """Round 5: the staged dist path must (a) reuse the prepare outputs for
    clean frames (identity cache), (b) thread live workload hints after the
    first frame, (c) keep state shardings stable across draws."""
    w = h = 32
    mesh = make_mesh(n_devices=4, sp=1)
    dr = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    dr.draw()
    cached1 = dr._prepare_cache[1]
    hint1 = np.asarray(dr.step_hint)
    assert hint1.max() > 0  # camera step counts came back through trace
    dr.draw()
    cached2 = dr._prepare_cache[1]
    for a, b in zip(jax.tree_util.tree_leaves(cached1),
                    jax.tree_util.tree_leaves(cached2)):
        assert a is b  # static scene: prepare skipped, outputs reused
    assert dr.accum.sharding.is_equivalent_to(dr._img_sharded, dr.accum.ndim)
    assert dr.step_hint.sharding.is_equivalent_to(
        dr._row_sharded, dr.step_hint.ndim)


def test_dp_checkpoint_roundtrip(tmp_path):
    """save_dist/restore_dist: a resumed dp-sharded accumulation must
    continue bit-identically to an uninterrupted one."""
    from mrt_tpu.engine import checkpoint as ckpt

    w = h = 32
    mesh = make_mesh(n_devices=4, sp=1)
    dr = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    dr.draw()
    dr.draw()
    path = tmp_path / "dist.npz"
    ckpt.save_dist(dr, str(path))
    dr.draw()
    uninterrupted = np.asarray(dr.accum)

    dr2 = DistributedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    ckpt.restore_dist(dr2, str(path))
    assert dr2.frame_index == 2
    dr2.draw()
    np.testing.assert_array_equal(np.asarray(dr2.accum), uninterrupted)


def test_sp_equals_mean_of_sample_windows():
    """EXACT sp semantics: an sp=2 frame's image equals the pmean of the two
    shards' disjoint Halton windows — reproduced here by running the
    single-chip trace twice with the shards' sample_bases and averaging.
    Pins the (frame_index * sp + sp_rank) * sample_stride contract."""
    import jax.numpy as jnp

    from mrt_tpu.core import types as T
    from mrt_tpu.engine import scene as scene_mod
    from mrt_tpu.render import wavefront as wf

    w = h = 32
    dr = DistributedRenderer(_scene(w, h), _settings(w, h),
                             mesh=make_mesh(n_devices=2, sp=2))
    sharded = np.asarray(dr.draw())  # frame 0: accumulate() passes color thru

    settings = dr.settings
    import dataclasses
    settings = dataclasses.replace(settings, hit_priming=False)
    scene2, geom, bvh2 = dr._prep(dr.scene_data, dr.bvh, dr.skin_bundle,
                                  dr._joint_matrices)
    cam = T.orbit_camera(w, h, dr.scene.camera_target,
                         dr.scene.camera_azimuth, dr.scene.camera_elevation,
                         dr.scene.camera_distance, dr.scene.camera_fov_degrees)
    uniforms = T.make_frame_uniforms(camera=cam, frame_index=0)
    stride = settings.sample_stride
    colors = []
    for rank in (0, 1):
        out = wf.trace_block(settings, dr.statics, scene2, bvh2, geom,
                             uniforms, dr.offsets,
                             jnp.zeros((h, w, 2), jnp.float32),
                             sample_base=rank * stride)
        colors.append(np.asarray(out.color))
    expect = (colors[0] + colors[1]) / 2
    np.testing.assert_allclose(sharded, expect, atol=1e-6)


def test_bench_multichip_cpu_smoke():
    """The driver-facing multichip bench harness runs end-to-end on the
    virtual CPU mesh and prints a schema-correct JSON line."""
    import json as _json

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "scripts/bench_multichip.py", "--dp", "2",
         "--width", "64", "--height", "64", "--frames", "1",
         "--skip-single"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert p.returncode == 0, p.stderr[-800:]
    line = _json.loads(p.stdout.strip().splitlines()[-1])
    assert line["metric"] == "Mrays/s" and line["value"] > 0
    assert line["detail"]["mesh"] == {"dp": 2, "sp": 1}


def test_gp_renderer_driver_matches_single_chip():
    """GeometryShardedRenderer (the gp frame driver, round 5): two frames
    over a gp=4 mesh match the single-chip Renderer's accumulation."""
    from jax.sharding import Mesh

    from mrt_tpu.dist.geometry import GeometryShardedRenderer

    w = h = 32
    r = Renderer(_scene(w, h), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r._allocate_state()

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gp",))
    gr = GeometryShardedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    object.__setattr__(r, "offsets", jax.device_get(gr.offsets))
    for _ in range(2):
        single = np.asarray(r.draw())
        sharded = np.asarray(gr.draw())
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    assert gr.frame_index == 2


def test_gp_renderer_driver_combined_dp_gp_mesh():
    """The gp frame driver on a combined ('dp','gp') mesh — the
    aggregate-scaling configuration — still matches single-chip."""
    from jax.sharding import Mesh

    from mrt_tpu.dist.geometry import GeometryShardedRenderer

    w = h = 32
    r = Renderer(_scene(w, h), output_width=w, output_height=h)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    r._allocate_state()

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "gp"))
    gr = GeometryShardedRenderer(_scene(w, h), _settings(w, h), mesh=mesh)
    object.__setattr__(r, "offsets", jax.device_get(gr.offsets))
    single = np.asarray(r.draw())
    sharded = np.asarray(gr.draw())
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    assert float(gr.last_rays_traced) > 0
