"""TPU smoke + A/B for the Pallas à-trous kernel (kernels/atrous.py):
compile on the real chip, validate against the XLA pass, and time both
at cfg5 render resolution. Honest protocol: poison first (speculator
off), time single dispatches best-of-3.

Run: timeout 1200 python scripts/atrous_tpu_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mrt_tpu.kernels import atrous as A  # noqa: E402
from mrt_tpu.upscale import denoise as D  # noqa: E402


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
    lum = demod @ jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)

    xla = jax.jit(lambda d, v, l, n, z: D._atrous_pass(d, v, l, n, z, 2, h, w))

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

    if "--slope" in sys.argv:
        # Per-pass cost below the dispatch RTT: chain K passes inside ONE
        # jitted program (output feeds back as next demod/var, steps cycle
        # 1,2,4,8 like the real SVGF loop), slope-time K=2 vs K=42. The
        # 40-pass delta swamps the ~±2 ms dispatch-RTT noise that made the
        # first 8-pass slope incoherent (0.008 vs 0.266 ms/pass xla).
        sys.argv.remove("--slope")
        tile = int(sys.argv[1]) if len(sys.argv) > 1 else 8

        def chain_xla(k):
            @jax.jit
            def f(d, v, n, z):
                for i in range(k):
                    l = d @ jnp.asarray([_ for _ in (0.2126, 0.7152, 0.0722)],
                                        jnp.float32)
                    d, v = D._atrous_pass(d, v, l, n, z, 1 << (i % 4), h, w)
                return d, v
            return f

        def chain_pal(k):
            @jax.jit
            def f(d, v, n, z):
                for i in range(k):
                    d, v = A.atrous_pass_pallas(d, v, n, z,
                                                step=1 << (i % 4), tile=tile)
                return d, v
            return f

        for name, mk in (("xla", chain_xla), ("pallas", chain_pal)):
            t2, _ = timed(mk(2), demod, var, normal, depth)
            t42, _ = timed(mk(42), demod, var, normal, depth)
            print(json.dumps(dict(case=f"slope_{name}", tile=tile, res=f"{h}x{w}",
                                  ms_per_pass=round((t42 - t2) / 40 * 1e3, 3),
                                  t2_ms=round(t2 * 1e3, 2),
                                  t42_ms=round(t42 * 1e3, 2))), flush=True)
        return

    tiles = tuple(int(t) for t in sys.argv[1:]) or (32, 64, 128)
    t_x, (rf, rv) = timed(xla, demod, var, lum, normal, depth)
    for tile in tiles:
        try:
            t_p, (gf, gv) = timed(
                lambda d, v, n, z, _t=tile: A.atrous_pass_pallas(
                    d, v, n, z, step=2, tile=_t), demod, var, normal, depth)
            df = float(jnp.max(jnp.abs(rf - gf)))
            print(json.dumps(dict(case=f"pallas_t{tile}",
                                  ms=round(t_p * 1e3, 2),
                                  maxdiff=round(df, 8))), flush=True)
        except Exception as e:  # compile failures are the data here
            print(json.dumps(dict(case=f"pallas_t{tile}",
                                  error=f"{type(e).__name__}: {e}"[:300])),
                  flush=True)
    print(json.dumps(dict(case="xla", ms=round(t_x * 1e3, 2))), flush=True)


if __name__ == "__main__":
    main()
