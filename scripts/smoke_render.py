"""Minimal end-to-end smoke render: sphere + plane (BASELINE config 1 shape)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The env var alone does NOT stick: the image's axon sitecustomize
    # overrides platforms via jax.config at interpreter boot, and with the
    # tunnel down the axon backend init hangs forever. jax.config.update
    # after import wins (same pattern as tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene


def main():
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 128
    scene = Scene(width=size, height=size)
    scene.models = [
        Model("sphere", position=[0.0, 1.0, 0.0], scale=1.0),
        Model("plane", position=[0, 0, 0], scale=10),
    ]
    r = Renderer(scene, output_width=size, output_height=size)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 1
    r.max_bounces = 1
    r.use_motion_adaptive_sampling = False

    t0 = time.time()
    r.draw()
    img = r.output_image()
    print(f"first frame (incl. compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    n = 4
    for _ in range(n):
        r.draw()
    img = r.output_image()
    dt = (time.time() - t0) / n
    print(f"steady frame: {dt*1e3:.1f} ms, mean={img.mean():.1f}, nonzero={np.count_nonzero(img.sum(-1))/img.shape[0]/img.shape[1]:.2%}")

    from mrt_tpu.upscale.presenter import write_png

    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/smoke.png"
    write_png(out, img)
    print("wrote", out)


if __name__ == "__main__":
    main()
