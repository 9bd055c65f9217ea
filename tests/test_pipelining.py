"""Frames-in-flight tests (VERDICT r2 item 6): the reference triple-buffers
with a semaphore (Renderer.swift:207,1405-1409); our analog is JAX async
dispatch — ``draw()`` must return with the device work still in flight, so
host-side frame N+1 preparation overlaps device frame N.
"""

import time

import jax
import numpy as np

from mrt_tpu import Renderer, UPSCALER_OFF, UPSCALER_TEMPORAL
from mrt_tpu.engine.scene import Model, Scene
from mrt_tpu.upscale import presenter


def _renderer(size=160, spp=1, bounces=3):
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("sphere", position=[0.0, 0.5, 0.0], scale=0.5),
        Model("sphere", position=[0.9, 0.3, 0.4], scale=0.3),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=size, output_height=size, seed=3)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = spp
    r.max_bounces = bounces
    r.use_motion_adaptive_sampling = False
    return r


def test_draw_returns_before_device_completes():
    """draw() must be a dispatch, not a sync: a significant share of the
    frame's wall time elapses AFTER draw() returns (inside block_until_ready),
    proving the host was free to prepare the next frame meanwhile."""
    r = _renderer()
    jax.block_until_ready(r.draw())  # compile + warm

    # wall-clock ratio: retry to ride out host-load noise (best of 3 rounds)
    for attempt in range(3):
        dispatch = blocked = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = r.draw()
            t1 = time.perf_counter()
            jax.block_until_ready(out)
            t2 = time.perf_counter()
            dispatch += t1 - t0
            blocked += t2 - t1
        # at least 30% of frame time was still in flight when draw() returned
        # (generous: on quiet hosts this is >90%)
        if blocked > 0.3 * (dispatch + blocked):
            return
    raise AssertionError(
        f"draw() appears synchronous: dispatch={dispatch:.3f}s "
        f"in-flight-after-return={blocked:.3f}s"
    )


def test_two_frames_dispatch_back_to_back():
    """Frame N+1's host prep + dispatch completes while frame N may still be
    rendering — the two dispatches together take well under the blocked total."""
    r = _renderer()
    jax.block_until_ready(r.draw())

    for attempt in range(3):  # best-of-3: host-load noise must not flake CI
        t0 = time.perf_counter()
        r.draw()
        out2 = r.draw()  # dispatched with frame 1 potentially still in flight
        t_dispatch = time.perf_counter() - t0
        jax.block_until_ready(out2)
        t_total = time.perf_counter() - t0
        if t_dispatch < 0.7 * t_total:
            return
    raise AssertionError(
        f"two dispatches took {t_dispatch:.3f}s of a {t_total:.3f}s span — "
        "no room for device overlap"
    )


def test_present_device_matches_present():
    """present() is present_device + D2H + row flip; the interactive loop
    relies on their equivalence to keep the present off the host."""
    r = _renderer(size=48, spp=1, bounces=1)
    r.upscaler_mode = UPSCALER_TEMPORAL
    r.render_scale = 0.5
    r.draw()
    dev = np.asarray(presenter.present_device(r))[::-1]
    # reset presenter history so the second call sees identical state
    object.__setattr__(r, "_upscale_history", None)
    host = presenter.present(r)
    assert host.dtype == np.uint8 and host.shape == (48, 48, 3)
    np.testing.assert_array_equal(dev, host)
