"""Demo scene — the analog of ``AppScene`` (AppScene.swift:10-40): robot
(skinned), glass dragon, train, treefir, ground plane, two spheres, back plane.

Assets resolve from /root/reference/AssetResources where present; dragon and
robot are missing large blobs and fall back to procedural stand-ins
(assets/procedural.py).
"""

from __future__ import annotations

import numpy as np

from .scene import Model, ModelMaterialOverride, Scene, SkinData


def make_app_scene(width: int = 512, height: int = 512, include_robot: bool = True) -> Scene:
    scene = Scene(width=width, height=height)
    models = []
    if include_robot:
        robot = Model("robot", position=[-0.5, 0.0, 1.0], rotation=[0, 0, 0], scale=0.01)
        stub = getattr(robot.mesh, "_skin_stub", None)
        if stub is not None:
            ji, jw, rest = stub
            # procedural rig is human-scale already; compensate the reference's
            # 0.01 USDZ scale so the stand-in is visible
            robot.scale = 1.0
            robot.skin = SkinData(joint_indices=ji, joint_weights=jw, rest_joints=rest)
        models.append(robot)
    models += [
        Model(
            "dragon",
            position=[0.3, 0.38, 2.5],
            rotation=[0, np.pi / 2 * 1.2, 0],
            scale=1.2,
            material_override=ModelMaterialOverride.glass(),
        ),
        Model("train", position=[-0.3, 0, 0.4], scale=0.5),
        Model("treefir", position=[0.5, 0, -0.2], scale=0.7),
        Model("plane", position=[0, 0, 0], scale=10),
        Model("sphere", position=[-1.9, 0.0, 0.3], scale=1),
        Model("sphere", position=[2.9, 0.0, -0.5], scale=2),
        Model("plane-back", position=[0, 0, -1.5], scale=10),
    ]
    scene.models = models
    return scene
