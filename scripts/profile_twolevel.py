"""Capture an xplane profile + compiled HLO of the STANDALONE two-level
traversal at the exact in-frame shapes (flagship-scene BVH, 2048-lane
chunks, unroll 2), so per-op device times can be compared 1:1 against the
in-frame capture (docs/PERF.md round 2i: in-frame row gathers 3.3 us,
compare_select band 16 us per 4-step iteration).

If the same op classes run ~25x faster here, the round-2i gather-rate gap
is program-context (scheduling/IMEM/DMA contention), not op placement —
both programs' while bodies carry S(1) buffers (hlo dump, round 2j).

Run detached: nohup python scripts/profile_twolevel.py > /tmp/tlprof.log 2>&1 &
Then: python scripts/parse_xplane_ops.py '/tmp/tl_trace/plugins/profile/*/*.xplane.pb' 50
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
    from mrt_tpu.bvh import twolevel
    from mrt_tpu.core import types as T

    scene = make_app_scene(width=64, height=64, include_robot=False)
    r = Renderer(scene, output_width=64, output_height=64)
    bvh2 = r.bvh  # TwoLevelBVH (default)

    N = 32768
    rng = np.random.default_rng(1)
    o = np.tile(np.array([0.0, 1.0, 5.4], np.float32), (N, 1))
    d = rng.normal(0, 0.25, (N, 3)).astype(np.float32)
    d[:, 2] = -1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro, rd = jnp.asarray(o), jnp.asarray(d)
    rm = jnp.full((N,), np.inf, jnp.float32)

    def run_twolevel(table, patch, ro, rd, rm):
        b = bvh2._replace(table=table.at[:8].set(patch))
        return twolevel.closest_hit(b, T.Rays(ro, rd, rm), mask=None,
                                    sort_rays=True, chunks=16, unroll=2)

    f = jax.jit(run_twolevel)
    args = (bvh2.table, bvh2.table[:8], ro, rd, rm)
    lowered = f.lower(*args).compile()
    with open("/tmp/hlo_tl_standalone.txt", "w") as fh:
        fh.write(lowered.as_text())
    print("hlo saved: /tmp/hlo_tl_standalone.txt")

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps(dict(us_per_call=round(dt * 1e6, 1),
                          mrays_s=round(N / dt / 1e6, 1))))

    with jax.profiler.trace("/tmp/tl_trace"):
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
    print("trace saved: /tmp/tl_trace")


if __name__ == "__main__":
    main()
