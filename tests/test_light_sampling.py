"""Power-proportional light sampling (beyond-reference; the Metal kernel
picks uniformly 1-of-N with xN compensation, Raytracing.metal:587-647).
The power strategy must stay UNBIASED (same converged image) and cut
variance when lights are strongly unequal."""

import numpy as np

from mrt_tpu.core import types as T
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def _renderer(strategy, seed=0):
    scene = Scene(width=64, height=64)
    scene.models = [
        Model("sphere", position=[0, 0.5, 0], scale=0.5),
        Model("plane", scale=8),
    ]
    # two same-type area lights, 100:1 power: uniform sampling wastes half
    # its picks on the dim one (power-proportional pmf matches contribution
    # exactly here, the textbook variance-reduction case)
    bright = T.area_light(
        position=[0.0, 1.98, 0.0], forward=[0.0, -1.0, 0.0],
        right=[0.25, 0.0, 0.0], up=[0.0, 0.0, 0.25], color=[4.0, 4.0, 4.0],
    )
    dim = T.area_light(
        position=[1.5, 1.98, 1.5], forward=[0.0, -1.0, 0.0],
        right=[0.25, 0.0, 0.0], up=[0.0, 0.0, 0.25], color=[0.04, 0.04, 0.04],
    )
    scene.lights = T.concat_lights(bright, dim)
    r = Renderer(scene, output_width=64, output_height=64, seed=seed)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False
    r.light_sampling = strategy
    return r


def _single_frames(strategy, n=40):
    """n INDEPENDENT 1-spp frames (no accumulation, decorrelated halton
    windows) — their mean estimates the unbiased converged image with
    standard error ~ sigma/sqrt(n)."""
    imgs = []
    r = _renderer(strategy)
    r.accumulation_weight = 0.0
    for k in range(n):
        r.frame_index = k * 61 + 11
        imgs.append(np.asarray(r.draw()))
    return np.stack(imgs)


def test_power_sampling_unbiased_and_lower_variance():
    u = _single_frames("uniform")
    p = _single_frames("power")
    lit = u.mean(0).sum(-1) > 1e-4
    assert lit.any()
    # unbiased: the two estimators' global means agree (SE of the global
    # mean over ~40 frames x ~2k lit pixels is well under 5%)
    mu, mp = u.mean(0)[lit].mean(), p.mean(0)[lit].mean()
    assert abs(mu - mp) < 0.05 * max(mu, 1e-6), (mu, mp)
    # variance: a third of uniform picks hit a ~0.01-power light, so the
    # power strategy's per-frame noise must be clearly lower
    vu = u.std(axis=0)[lit].mean()
    vp = p.std(axis=0)[lit].mean()
    assert vp < vu * 0.9, (vp, vu)
