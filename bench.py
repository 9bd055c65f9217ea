"""Flagship benchmark — BASELINE.json config-3 analog: dragon-class scene,
1920x1080, 2 spp, 4 bounces, temporal accumulation, single chip.

Prints ONE JSON line: {"metric": "Mrays/s", "value": N, "unit": "Mrays/s",
"vs_baseline": N/200} (BASELINE north star: >=200 Mrays/s per v5e chip).

The ray count is the instrumented number of traversals actually launched
(closest-hit + any-hit shadow), not a worst-case formula.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_renderer(width, height, dragon_subdivisions=None):
    from mrt_tpu.engine.appscene import make_app_scene
    from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF

    # static flagship scene (robot/skinning benchmarked separately in
    # scripts/bench_suite.py): dragon blob + train + treefir + planes + spheres
    scene = make_app_scene(width=width, height=height, include_robot=False,
                           dragon_subdivisions=dragon_subdivisions)
    r = Renderer(scene, output_width=width, output_height=height)
    r.upscaler_mode = UPSCALER_OFF  # measure raw tracing, not upscaler
    r.samples_per_pixel = 2
    r.max_bounces = 4
    r.use_motion_adaptive_sampling = False  # static scene: no extra samples
    # execution-strategy sweep knobs
    if os.environ.get("MRT_TILE"):
        r.tile_pixels = int(os.environ["MRT_TILE"])
    if os.environ.get("MRT_CHUNKS"):
        r.traversal_chunks = int(os.environ["MRT_CHUNKS"])
    if os.environ.get("MRT_UNROLL"):
        r.traversal_unroll = int(os.environ["MRT_UNROLL"])
    if os.environ.get("MRT_SORTSHADOW"):
        r.sort_shadow_rays = os.environ["MRT_SORTSHADOW"] == "1"
    if os.environ.get("MRT_FUSE"):
        r.fuse_shadow_rays = os.environ["MRT_FUSE"] == "1"
    if os.environ.get("MRT_PERSIST"):
        r.persistent_samples = os.environ["MRT_PERSIST"] == "1"
    if os.environ.get("MRT_SORT"):
        r.sort_rays = os.environ["MRT_SORT"] == "1"
    if os.environ.get("MRT_STREAM"):
        r.traversal_stream = int(os.environ["MRT_STREAM"])
    if os.environ.get("MRT_REFILL"):
        r.stream_refill = int(os.environ["MRT_REFILL"])
    if os.environ.get("MRT_PRIME"):
        r.hit_priming = os.environ["MRT_PRIME"] == "1"
    if os.environ.get("MRT_TWOLEVEL"):
        r.two_level = os.environ["MRT_TWOLEVEL"] == "1"
    if os.environ.get("MRT_TILELOOP"):
        r.tile_program_loop = os.environ["MRT_TILELOOP"] == "1"
    if os.environ.get("MRT_WORKSORT"):
        r.workload_sort = os.environ["MRT_WORKSORT"] == "1"
    if os.environ.get("MRT_VMEMSHADE"):
        r.vmem_shade_tables = os.environ["MRT_VMEMSHADE"] == "1"
    if os.environ.get("MRT_FUSE"):
        r.fuse_shadow_rays = os.environ["MRT_FUSE"] == "1"
    return r


def run(width, height, frames, dragon_subdivisions=None):
    import jax

    r = build_renderer(width, height, dragon_subdivisions)
    # warmup/compile
    r.draw()
    jax.block_until_ready(r.accum)
    # The timed region performs ZERO device->host transfers: one readback
    # permanently poisons axon dispatch ~300x (docs/PERF.md round 2j).
    # Ray counters stay device scalars; they are read AFTER the clock stops.
    ray_counts = []
    t0 = time.time()
    for _ in range(frames):
        r.draw()
        ray_counts.append(r.last_rays_traced)
    jax.block_until_ready(r.accum)
    dt = time.time() - t0
    # Return the DEVICE counters: even a post-clock readback here would
    # poison any later run() in this process (the dragon_1m sub-benchmark).
    # The caller reads them back once ALL timed work is done.
    return ray_counts, dt


def _device_guard(timeout_s=240):
    """Fail fast (one honest JSON line, exit 3) if the TPU is unreachable.

    jax backend init dials the axon relay and blocks FOREVER when the tunnel
    is down — even `timeout`-less driver invocations would silently eat the
    whole bench window (measured: jax.devices() hangs indefinitely,
    interpreter boot itself is fine). Probe cheaply: if the relay port
    accepts, proceed; otherwise bound a subprocess device-init probe and
    report an infra failure instead of hanging. CPU-forced runs skip the
    guard entirely (no tunnel involved).
    """
    plat = os.environ.get("JAX_PLATFORMS") or "axon"
    if "axon" not in plat and "tpu" not in plat:
        return
    import socket

    # CLAUDE.md documents the relay as "ports 8082+": probe the small known
    # range (overridable) so a relay on 8083-8085 doesn't pay the bounded
    # subprocess probe (extra backend init, up to timeout_s) every run.
    ports_env = os.environ.get("MRT_RELAY_PORTS", "8082,8083,8084,8085")
    for port in (int(p) for p in ports_env.split(",") if p.strip()):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=3).close()
            return  # relay port accepting: normal path
        except OSError:
            continue
    # Port refused: either a non-tunnel TPU environment (fine) or the tunnel
    # is down (init would hang). Disambiguate with a bounded probe. Killing a
    # hung-INIT python is safe — it never claimed the device grant.
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return
    except subprocess.TimeoutExpired:
        reason = f"TPU unreachable: jax device init hung >{timeout_s}s (axon tunnel down)"
    except subprocess.CalledProcessError as e:
        reason = f"TPU unreachable: jax device init failed rc={e.returncode}"
    print(json.dumps({
        "metric": "Mrays/s",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "fallback": True,
        "detail": {"fallback_reason": reason, "infra_failure": True},
    }))
    sys.exit(3)


def main():
    width, height, frames = 1920, 1080, 3
    _device_guard()
    if "--quick" in sys.argv:
        width, height, frames = 512, 512, 2
    fallback_reason = None
    try:
        ray_counts, dt = run(width, height, frames)
    except Exception as e:
        # Fall back to a smaller frame so the driver still gets a number —
        # but LOUDLY: a top-level "fallback" field + stderr traceback, so a
        # flagship regression can't masquerade as a success.
        import traceback

        traceback.print_exc()
        fallback_reason = f"{type(e).__name__}: {e}"[:200]
        width, height, frames = 512, 512, 2
        ray_counts, dt = run(width, height, frames)

    # real-dragon-scale sub-benchmark (~1.31M-tri blob, Stanford-dragon
    # class): reported alongside the headline so table-size effects at
    # production asset scale are visible (VERDICT round-1 missing #6)
    dragon_1m = None
    big_counts = big_dt = None
    if "--quick" not in sys.argv and os.environ.get("MRT_SKIP_BIG") != "1":
        try:
            big_counts, big_dt = run(1024, 576, 2, dragon_subdivisions=8)
        except Exception as e:
            dragon_1m = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ALL timed work is done — device->host readbacks are safe now (one
    # D2H poisons every later dispatch ~300x, docs/PERF.md round 2j)
    total_rays = sum(int(c) for c in ray_counts)
    mrays = total_rays / dt / 1e6
    if big_counts is not None:
        dragon_1m = {
            "mrays_per_s": round(sum(int(c) for c in big_counts) / big_dt / 1e6, 3),
            "resolution": "1024x576",
            "scene_tris": "~1.33M (dragon 1.31M)",
            "frames": 2,
        }

    out = {
        "metric": "Mrays/s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 5),
        "fallback": fallback_reason is not None,
        "detail": {
            "scene": "dragon-class blob + train/treefir/planes/spheres",
            "resolution": f"{width}x{height}",
            "spp": 2,
            "bounces": 4,
            "frames": frames,
            "total_rays": total_rays,
            "seconds": round(dt, 3),
        },
    }
    if fallback_reason is not None:
        out["detail"]["fallback_reason"] = fallback_reason
    if dragon_1m is not None:
        out["detail"]["dragon_1m"] = dragon_1m
    print(json.dumps(out))
    sys.exit(3 if fallback_reason is not None else 0)


if __name__ == "__main__":
    main()
