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
