"""Dump the compiled frame program's buffer memory-space assignment.

Cross-program/MSA VMEM placement shows up in compiled HLO layouts as an
``S(1)`` suffix (memory space 1 = VMEM). The standalone traversal microbench
gets its table placed there (200-1100 Mrays/s); the full frame program runs
at HBM-gather speed — this prints which large buffers won/lost placement so
the restructure targets the right conflict.

Usage: python scripts/dump_hlo_memspace.py [--quick-scene] [--micro]
Run detached (TPU compile).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def summarize(txt, label):
    print(f"==== {label}: {len(txt)/1e6:.1f} MB of HLO text")
    out = "/tmp/hlo_" + label.split()[0] + ".txt"
    with open(out, "w") as f:
        f.write(txt)
    print("  saved:", out)
    # gather ops and their operand layouts
    pat = re.compile(r"S\((\d+)\)")
    spaces = {}
    for m in pat.finditer(txt):
        spaces[m.group(1)] = spaces.get(m.group(1), 0) + 1
    print("  S(n) counts:", spaces)
    # large-buffer shapes with S(1)
    big = re.findall(r"f32\[(\d{4,}),(\d+)\][^ ]*S\(1\)", txt)
    from collections import Counter

    print("  large f32 bufs in VMEM:", Counter(big).most_common(10))
    # the table shape anywhere (how is it laid out where gathered?)
    for shape in sorted(set(re.findall(r"f32\[\d{4,},128\]", txt))):
        with_s1 = len(re.findall(re.escape(shape) + r"[^ ]*S\(1\)", txt))
        total = len(re.findall(re.escape(shape), txt))
        print(f"  {shape}: {total} refs, {with_s1} in VMEM")
    # gather instruction lines mentioning big tables (first few)
    lines = [ln.strip()[:220] for ln in txt.splitlines() if " gather(" in ln]
    print(f"  {len(lines)} gather instrs; sample:")
    for ln in lines[:6]:
        print("   ", ln)


def main():
    if "--micro" in sys.argv:
        from mrt_tpu.bvh import wide
        from mrt_tpu.core import types as T

        rng = np.random.default_rng(0)
        n = 100_000
        c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        e = 0.6 / np.sqrt(n)
        bvh = wide.build(c, c + rng.normal(size=(n, 3)).astype(np.float32) * e,
                         c + rng.normal(size=(n, 3)).astype(np.float32) * e)
        N = 65536
        ro = jnp.zeros((N, 3)); rd = jnp.ones((N, 3)); rm = jnp.full((N,), jnp.inf)
        msk = jnp.ones((N,), bool)

        def f(table, patch, ro, rd, rm, msk):
            table = table.at[:8].set(patch)
            return wide._traverse(
                wide.WideBVH(table, bvh.node_child, bvh.leaf_tri, bvh.n_internal,
                             bvh.depth),
                T.Rays(ro, rd, rm), 1e-4, False, msk, chunks=16, sort_rays=True)

        comp = jax.jit(f).lower(bvh.table, bvh.table[:8], ro, rd, rm, msk).compile()
        summarize(comp.as_text(), "micro inprog traversal")
        return

    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import (
        Renderer, UPSCALER_OFF, _render_frame, _prepare_frame, _trace_tile_frame)
    from mrt_tpu.core import types as T

    if "--dragon" in sys.argv:
        scene = make_app_scene(width=1024, height=576, include_robot=False,
                               dragon_subdivisions=8)
        r = Renderer(scene, output_width=1024, output_height=576)
    else:
        scene = make_app_scene(width=512, height=512, include_robot=False)
        r = Renderer(scene, output_width=512, output_height=512)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 4
    r.use_motion_adaptive_sampling = False
    cam = r.current_camera()
    uniforms = T.make_frame_uniforms(
        camera=cam, previous_camera=cam, frame_index=0,
        accumulation_weight=r.accumulation_weight,
        motion_accum_min_weight=r.motion_accumulation_min_weight,
        motion_accum_low_px=r.motion_accumulation_low_threshold_pixels,
        motion_accum_high_px=r.motion_accumulation_high_threshold_pixels,
        motion_sampling_low_px=r.motion_sampling_low_threshold_pixels,
        motion_sampling_high_px=r.motion_sampling_high_threshold_pixels,
    )
    if "--staged" in sys.argv:
        settings = r.settings()
        scene2, geom, bvh2 = _prepare_frame(settings, r.statics, r.scene_data, r.bvh)
        w, h = r.render_width, r.render_height
        tile = min(r.tile_pixels, w * h)
        px = jnp.arange(tile, dtype=jnp.int32) % w
        py = jnp.minimum(jnp.arange(tile, dtype=jnp.int32) // w, h - 1)
        offs = jnp.zeros((tile,), jnp.int32)
        pmot = jnp.zeros((tile, 2), jnp.float32)
        pp = jnp.full((tile,), -1, jnp.int32)
        hint = jnp.zeros((tile,), jnp.int32)
        patch = None if "--nopatch" in sys.argv else bvh2.table[:8]
        comp = _trace_tile_frame.lower(
            settings, r.statics, scene2, bvh2, geom, uniforms,
            px, py, offs, pmot, pp, pp, hint, patch).compile()
        summarize(comp.as_text(), "staged trace_tile 512x512")
        return
    comp = _render_frame.lower(
        r.settings(), r.statics, r.scene_data, r.bvh, uniforms, r.offsets,
        r.accum, r.motion, (), (), r.prime_primary, r.prime_shadow,
    ).compile()
    summarize(comp.as_text(), "frame program 512x512")


if __name__ == "__main__":
    main()
