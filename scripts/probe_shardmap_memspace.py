"""Probe: does the BVH table intermediate win VMEM (S(1)) placement inside
the shard_map'd dp trace program? (round 5: dp=1 measured 1.29 vs 5.90
even after staging + patches — PERF.md 5d follow-up.)

Compiles the staged dist trace program at flagship shape (cache-hit if the
queue already built it) and greps the optimized HLO for large buffers'
memory-space suffixes.

Run detached: nohup python scripts/probe_shardmap_memspace.py > /tmp/probe_ms.log 2>&1 &
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mrt_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    import bench
    from mrt_tpu.dist import sharding as S
    from mrt_tpu.core import types as T

    r = bench.build_renderer(1920, 1080)
    settings = r.settings()
    mesh = S.make_mesh(n_devices=1, sp=1)
    dr = S.DistributedRenderer(r.scene, settings, mesh=mesh)

    scene2, geom, bvh2 = dr._prep(dr.scene_data, dr.bvh, dr.skin_bundle,
                                  dr._joint_matrices)
    cam = r.current_camera()
    uniforms = T.make_frame_uniforms(camera=cam, frame_index=0)
    table_patch = bvh2.table[:8]
    geom_patch = (geom.shade_rows[:1], geom.motion_rows[:1])

    lowered = dr._trace.lower(
        scene2, bvh2, geom, uniforms, dr.offsets, dr.motion,
        dr.step_hint, table_patch, geom_patch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/hlo_dp_trace.txt", "w") as f:
        f.write(txt)
    print(f"HLO text: {len(txt)/1e6:.1f} MB -> /tmp/hlo_dp_trace.txt", flush=True)

    # table is (n_rows, 128) f32 — find f32[...,128] buffers and their spaces
    rows = bvh2.table.shape[0] if hasattr(bvh2, "table") else 0
    pat = re.compile(r"f32\[%d,128\]\{[^}]*\}(\(S\(\d+\)\))?" % rows)
    hits = {}
    for m in pat.finditer(txt):
        hits[m.group(0)] = hits.get(m.group(0), 0) + 1
    print(f"table shape f32[{rows},128] layout variants:", flush=True)
    for k, v in sorted(hits.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  x{v}: {k}", flush=True)
    s1 = sum(v for k, v in hits.items() if "S(1)" in k)
    print(f"S(1) (VMEM) occurrences: {s1} / {sum(hits.values())}", flush=True)

    # memory analysis summary
    try:
        ma = compiled.memory_analysis()
        print(f"argument={ma.argument_size_in_bytes/1e6:.1f}MB "
              f"output={ma.output_size_in_bytes/1e6:.1f}MB "
              f"temp={ma.temp_size_in_bytes/1e6:.1f}MB", flush=True)
    except Exception as e:
        print("memory_analysis unavailable:", e, flush=True)


if __name__ == "__main__":
    main()
