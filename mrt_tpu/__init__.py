"""mrt_tpu — a TPU-native progressive path-tracing framework.

A from-scratch JAX/XLA re-design with the capabilities of the Metal 4
raytracing reference app (tatsuya-ogawa/metal4-raytracing): progressive
Monte-Carlo path tracing with PBR/legacy shading, four light types,
glass/transparency, GPU(TPU) linear-blend skinning feeding per-frame BVH
refit, motion vectors + temporal accumulation, and spatial/temporal/denoised
upscaling — plus multi-chip pixel/sample sharding the reference never had.

Quick start::

    from mrt_tpu import Renderer, Scene, Model
    scene = Scene(width=512, height=512)
    scene.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5),
                    Model("plane", scale=10)]
    r = Renderer(scene, output_width=512, output_height=512)
    r.draw()
    image = r.output_image()  # uint8 RGB
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first compiles of the big traversal/trace
# programs are minutes on this stack; cached executables make every later
# process (tests, bench, driver runs) start warm.
try:
    if (_os.environ.get("JAX_PLATFORMS") or "").startswith("cpu") \
            and "MRT_JAX_CACHE" not in _os.environ:
        # CPU runs get NO persistent cache: this jaxlib's XLA:CPU stack
        # intermittently SEGFAULTS (five full-suite deaths across round 3:
        # cache read, cache write x2, and twice INSIDE
        # backend_compile_and_load with the cache already disabled — so the
        # crash is in compile+JIT-load itself, not only cache serde). The
        # in-process jit cache is unaffected, so a test run still compiles
        # each program once. The repo-level .jax_cache stays TPU-only,
        # where the cache is load-bearing.
        # Mitigations: cap the CPU ISA (AVX512/AMX codegen suspect) and
        # disable parallel codegen — XLA:CPU splits modules across threads
        # and installs the JIT-loaded objects concurrently, the classic
        # race for a compile+load segfault.
        _fl = _os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_max_isa" not in _fl:
            _fl = (_fl + " --xla_cpu_max_isa=AVX2").strip()
        if "xla_cpu_parallel_codegen_split_count" not in _fl:
            _fl = (_fl + " --xla_cpu_parallel_codegen_split_count=1").strip()
        _os.environ["XLA_FLAGS"] = _fl
    else:
        _cache_dir = _os.environ.get("MRT_JAX_CACHE", _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

# Honor a deliberately-set JAX_PLATFORMS env var. The image's axon
# sitecustomize overrides platform selection via jax.config at interpreter
# boot, so the env var alone silently does nothing — and a CPU-intended run
# then initializes the axon backend, which HANGS forever when the tunnel is
# down. A config.update after import restores env-var semantics (same pattern
# as tests/conftest.py). Only NON-"axon" values are honored: "axon" is the
# image's ambient value, and callers like tests/conftest.py legitimately
# config.update to cpu in-process without touching the env — flipping them
# back would hang the whole suite.
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat and _plat != "axon":
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from .core import types
from .core.types import (
    Camera,
    FrameUniforms,
    Lights,
    Materials,
    RenderSettings,
    area_light,
    orbit_camera,
    point_light,
    spot_light,
    sun_light,
)
from .engine.appscene import make_app_scene
from .engine.renderer import (
    Renderer,
    UPSCALER_DENOISED,
    UPSCALER_OFF,
    UPSCALER_SPATIAL,
    UPSCALER_TEMPORAL,
)
from .engine.scene import Model, ModelMaterialOverride, Scene, SkinData

__all__ = [
    "Camera",
    "FrameUniforms",
    "Lights",
    "Materials",
    "Model",
    "ModelMaterialOverride",
    "RenderSettings",
    "Renderer",
    "Scene",
    "SkinData",
    "UPSCALER_DENOISED",
    "UPSCALER_OFF",
    "UPSCALER_SPATIAL",
    "UPSCALER_TEMPORAL",
    "area_light",
    "make_app_scene",
    "orbit_camera",
    "point_light",
    "spot_light",
    "sun_light",
    "types",
]

__version__ = "0.1.0"
