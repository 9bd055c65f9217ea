"""Honest TPU cost of the SVGF à-trous pass (upscale/denoise._atrous_pass).

Chains K passes inside ONE jitted program (output feeds back as next
demod/var, steps cycle 1,2,4,8 like the real SVGF loop) and slope-times
K=2 vs K=42 so the 40-pass delta swamps the ~±2 ms dispatch-RTT noise.
Poisons the speculator first (PERF.md round 3a protocol).

History: a halo-tiled Pallas kernel for this pass was built and fixed
through two Mosaic alignment failures (lane dim %128, DMA slice height
%8 — PERF.md round 4f), then measured here: 0.381 vs XLA's 0.174 ms/pass
at 540x960 and scoped-VMEM OOM at 1080p. Deleted (git history:
mrt_tpu/kernels/atrous.py); XLA's fused 25-window formulation is the
right TPU program.

Run: timeout 1200 python scripts/atrous_tpu_check.py [--res 1080x1920]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mrt_tpu.upscale import denoise as D  # noqa: E402

_LUMA = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)


def main():
    np.asarray(jnp.zeros((3,), jnp.float32))  # poison: honest timings below
    rng = np.random.default_rng(0)
    h, w = 540, 960  # cfg5 render res (1080p x 0.5 render scale)
    if "--res" in sys.argv:  # e.g. --res 1080x1920 (4K output at scale 0.5)
        i = sys.argv.index("--res")
        h, w = (int(x) for x in sys.argv[i + 1].split("x"))
        del sys.argv[i:i + 2]
    demod = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    var = jnp.asarray(rng.random((h, w)) * 0.1, jnp.float32)
    nrm = rng.normal(size=(h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    normal = jnp.asarray(nrm, jnp.float32)
    depth = jnp.asarray(1.0 + rng.random((h, w)) * 5, jnp.float32)

    def timed(f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    def chain(k):
        @jax.jit
        def f(d, v, n, z):
            for i in range(k):
                l = d @ _LUMA
                d, v = D._atrous_pass(d, v, l, n, z, 1 << (i % 4), h, w)
            return d, v
        return f

    t2, _ = timed(chain(2), demod, var, normal, depth)
    t42, _ = timed(chain(42), demod, var, normal, depth)
    print(json.dumps(dict(case="slope_xla", res=f"{h}x{w}",
                          ms_per_pass=round((t42 - t2) / 40 * 1e3, 3),
                          t2_ms=round(t2 * 1e3, 2),
                          t42_ms=round(t42 * 1e3, 2))), flush=True)


if __name__ == "__main__":
    main()
