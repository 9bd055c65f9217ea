"""Geometry/ray-mask filtering (ShaderTypes.h:26-33; Raytracing.metal:317,
733-735): shadow rays carry RAY_MASK_SHADOW and must skip instances whose
mask is GEOMETRY_MASK_LIGHT only; bounce rays carry RAY_MASK_SECONDARY;
primary rays RAY_MASK_PRIMARY see everything.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mrt_tpu import Renderer, UPSCALER_OFF
from mrt_tpu.bvh import twolevel
from mrt_tpu.core import types as T
from mrt_tpu.engine.scene import Model, Scene


def _renderer(occluder_mask, fused=None, size=48):
    """Floor lit by the default area light (y=1.98) with a sphere hovering
    between light and floor — the occluder's mask decides if it shadows."""
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("sphere", position=[0.0, 1.3, 0.0], scale=0.3,
              geometry_mask=occluder_mask),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=size, output_height=size, seed=5)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    if fused is not None:
        r.fuse_shadow_rays = fused
    return r


def test_mask_plumbing_closest_hit():
    r = _renderer(T.GEOMETRY_MASK_LIGHT)
    bvh = r.bvh
    assert bvh.has_masks
    # rays aimed straight at the hovering (light-masked) sphere
    n = 8
    origin = jnp.tile(jnp.asarray([[0.0, 1.3, 3.0]], jnp.float32), (n, 1))
    direction = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    rays = T.Rays(origin, direction, jnp.full((n,), jnp.inf, jnp.float32))

    primary = jnp.full((n,), T.RAY_MASK_PRIMARY, jnp.int32)
    secondary = jnp.full((n,), T.RAY_MASK_SECONDARY, jnp.int32)

    h_primary = twolevel.closest_hit(bvh, rays, ray_mask=primary, chunks=1)
    h_secondary = twolevel.closest_hit(bvh, rays, ray_mask=secondary, chunks=1)
    h_unfiltered = twolevel.closest_hit(bvh, rays, chunks=1)

    assert bool(jnp.all(h_primary.triangle >= 0))      # PRIMARY sees LIGHT geo
    assert bool(jnp.all(h_secondary.triangle < 0))     # SECONDARY skips it
    assert bool(jnp.all(h_unfiltered.triangle >= 0))   # no mask = no filter

    occ_shadow = twolevel.any_hit(
        bvh, rays, ray_mask=jnp.full((n,), T.RAY_MASK_SHADOW, jnp.int32), chunks=1)
    occ_plain = twolevel.any_hit(bvh, rays, chunks=1)
    assert not bool(jnp.any(occ_shadow))               # SHADOW skips LIGHT geo
    assert bool(jnp.all(occ_plain))


@pytest.mark.parametrize("fused", [True, False])
def test_light_masked_instance_casts_no_shadow(fused):
    imgs = {}
    for mask in (T.GEOMETRY_MASK_GEOMETRY, T.GEOMETRY_MASK_LIGHT):
        r = _renderer(mask, fused=fused)
        for _ in range(8):
            img = np.asarray(r.draw())
        imgs[mask] = img
    # somewhere on the floor there is a patch that is dark with the default
    # GEOMETRY mask (sphere shadows it) and lit with the LIGHT mask (shadow
    # rays skip the sphere) — find it instead of hard-coding pixel regions
    geom_l = imgs[T.GEOMETRY_MASK_GEOMETRY].mean(-1)
    light_l = imgs[T.GEOMETRY_MASK_LIGHT].mean(-1)
    assert light_l.mean() > geom_l.mean()  # un-shadowing adds energy overall
    diff = light_l - geom_l
    y, x = np.unravel_index(np.argmax(diff), diff.shape)
    assert light_l[y, x] > 2.0 * geom_l[y, x] + 1e-4, (
        light_l[y, x], geom_l[y, x])
    # the sphere itself is still visible to primary rays in BOTH images
    # (RAY_MASK_PRIMARY includes the LIGHT bit): top half not black
    h = light_l.shape[0]
    assert imgs[T.GEOMETRY_MASK_LIGHT][: h // 2].max() > 0.01


def test_default_scene_compiles_mask_free():
    r = _renderer(T.GEOMETRY_MASK_GEOMETRY)
    assert not r.bvh.has_masks  # static gate: flagship path pays nothing


def test_masks_require_twolevel_backend():
    scene = Scene(width=16, height=16)
    scene.models = [
        Model("sphere", position=[0, 0.5, 0], scale=0.5,
              geometry_mask=T.GEOMETRY_MASK_LIGHT),
        Model("plane", scale=10),
    ]
    r = Renderer(scene, output_width=16, output_height=16)
    with pytest.raises(ValueError, match="two-level"):
        r.two_level = False  # flat backend rebuild must refuse
    # the failed switch must not corrupt the renderer: old value restored,
    # bvh still consistent, draw still works
    assert r.two_level is True
    img = np.asarray(r.draw())
    assert np.isfinite(img).all()


def test_unknown_backend_rejected_and_state_restored():
    scene = Scene(width=16, height=16)
    scene.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5),
                    Model("plane", scale=10)]
    r = Renderer(scene, output_width=16, output_height=16)
    with pytest.raises(ValueError, match="traversal_backend"):
        r.traversal_backend = "cluster"  # retired backend must not fall
    assert r.traversal_backend == "wide"  # through to a different engine
    assert np.isfinite(np.asarray(r.draw())).all()


def test_gp_step_refuses_masked_scene():
    import jax
    from jax.sharding import Mesh

    from mrt_tpu.core.types import RenderSettings
    from mrt_tpu.dist.geometry import build_gp_render_step

    scene = Scene(width=16, height=16)
    scene.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5,
                          geometry_mask=T.GEOMETRY_MASK_LIGHT),
                    Model("plane", scale=10)]
    _, statics = scene.compile()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gp",))
    with pytest.raises(ValueError, match="mask"):
        build_gp_render_step(RenderSettings(width=16, height=16), statics, mesh)
