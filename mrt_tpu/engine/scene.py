"""Scene graph + scene compiler.

Host-side ``Scene``/``Model`` mirror the reference's API surface
(Scene.swift:10-170, Model.swift:45-302): model list, light list, orbit-camera
parameterization, ``moveModel``/``rotateModel``/``setLightIntensity``, material
overrides, and a dirty flag.

``Scene.compile()`` is the TPU-native replacement for the argument-buffer /
residency-set plumbing (Renderer.swift:342-420,806-899): it flattens every
model into one SoA vertex/triangle pool (object space), per-instance 4x4
transforms, a material table, and a packed texture atlas — all device arrays
in a single ``SceneData`` pytree. Instance transforms are applied on-device as
a batched matmul each frame, then the world-space BVH is refit; there is no
separate TLAS object (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..assets import texture as tex
from ..assets.obj import MaterialDef, MeshData, load_obj
from ..core import types as T
from ..utils import math3d

ASSET_SEARCH_PATHS = [
    Path(__file__).resolve().parents[2] / "assets_local",
    Path("/root/reference/AssetResources"),
]


@dataclasses.dataclass
class ModelMaterialOverride:
    """Model.swift:11-27."""

    base_color: tuple | None = None
    refraction_index: float | None = None
    opacity: float | None = None

    @staticmethod
    def glass(tint=(0.95, 0.98, 1.0), refraction_index=1.52, opacity=0.08) -> "ModelMaterialOverride":
        """Model.swift:22-27."""
        return ModelMaterialOverride(tint, refraction_index, opacity)


@dataclasses.dataclass
class SkinData:
    """Per-model skinning bind info (MeshSkinningInfo analog, Mesh.swift:10-15)."""

    joint_indices: np.ndarray  # (V,4) int32, model-local joint ids
    joint_weights: np.ndarray  # (V,4) f32 (NOT normalized — Skinning.metal:26-31)
    rest_joints: np.ndarray  # (J,3) rest joint positions (procedural rigs)
    skeleton: object | None = None  # skinning.animation.Skeleton
    animation: object | None = None  # skinning.animation.AnimationClip
    geometry_bind: np.ndarray | None = None  # (4,4) geometryBindTransform
    current_time: float = 0.0


class Model:
    """Model.swift:29-302 host analog."""

    def __init__(
        self,
        name: str,
        position=(0.0, 0.0, 0.0),
        rotation=(0.0, 0.0, 0.0),
        scale: float = 1.0,
        material_override: ModelMaterialOverride | None = None,
        mesh: MeshData | None = None,
        skin: SkinData | None = None,
        geometry_mask: int = T.GEOMETRY_MASK_GEOMETRY,
    ):
        self.name = name
        # instance-descriptor mask bits (ShaderTypes.h:26-33); shadow rays
        # use RAY_MASK_SHADOW and skip GEOMETRY_MASK_LIGHT-only instances
        self.geometry_mask = int(geometry_mask)
        self.position = np.asarray(position, np.float32)
        self.rotation = np.asarray(rotation, np.float32)
        self.scale = float(scale)
        self.material_override = material_override
        self.mesh = mesh if mesh is not None else _resolve_mesh(name)
        self.skin = skin
        # rigged asset formats (glTF) attach skin info during resolution
        if self.skin is None and getattr(self.mesh, "_skin_info", None):
            si = self.mesh._skin_info
            self.skin = SkinData(
                joint_indices=si["joint_indices"],
                joint_weights=si["joint_weights"],
                rest_joints=si["rest_joints"],
                skeleton=si["skeleton"],
                animation=si["animation"],
                geometry_bind=si["geometry_bind"],
            )
    def effective_materials(self) -> list[MaterialDef]:
        """Per-submesh materials with this model's override applied — a
        SNAPSHOT, not a mutation (meshes may be shared between models;
        SubMesh.applyMaterialOverride's write-through, SubMesh.swift:272-288,
        becomes per-instance resource tables here)."""
        mats = []
        for sub in self.mesh.submeshes:
            m = dataclasses.replace(sub.material) if dataclasses.is_dataclass(sub.material) else sub.material
            if self.material_override is not None:
                _apply_override(m, self.material_override)
            mats.append(m)
        return mats

    # --- transforms ---------------------------------------------------------
    @property
    def world_transform(self) -> np.ndarray:
        """translate @ rotate @ scale (Model.swift:55-58)."""
        return math3d.trs(self.position, self.rotation, self.scale)

    # --- movement helpers (Model.swift:275-302) ------------------------------
    def forward(self, direction: float):
        rot = math3d.rotate_euler(self.rotation)
        local_forward = rot[:3, :3] @ np.array([0, 0, -1], np.float32)
        self.position = self.position + local_forward / np.linalg.norm(local_forward) * direction

    def strafe(self, direction: float):
        rot = math3d.rotate_euler(self.rotation)
        local_right = rot[:3, :3] @ np.array([1, 0, 0], np.float32)
        self.position = self.position + local_right / np.linalg.norm(local_right) * direction

    def rotate_y(self, angle: float):
        self.rotation = self.rotation + np.array([0, angle, 0], np.float32)

    def set_rotation_y(self, angle: float):
        self.rotation = np.array([self.rotation[0], angle, self.rotation[2]], np.float32)


def _apply_override(mat: MaterialDef, o: ModelMaterialOverride):
    """SubMesh.applyMaterialOverride (SubMesh.swift:272-288)."""
    if o.base_color is not None:
        mat.base_color = tuple(o.base_color)
    if o.refraction_index is not None:
        mat.refraction_index = max(o.refraction_index, 1.0)
    if o.opacity is not None:
        mat.opacity = float(np.clip(o.opacity, 0.0, 1.0))


_MESH_CACHE: dict = {}


def _resolve_mesh(name: str) -> MeshData:
    """USDZ-preferred asset resolution (Model.swift:63-70) adapted: look for
    OBJ in the asset search paths; fall back to procedural stand-ins for the
    repository's missing large blobs (dragon/bunny/robot).

    Resolved meshes are CACHED by name: two models of the same asset share
    one MeshData (and therefore one BLAS, Renderer.swift:547-576 instancing).
    Material overrides are applied per-instance at compile time
    (Model.effective_materials), never onto the shared mesh."""
    if name in _MESH_CACHE:
        return _MESH_CACHE[name]
    mesh = _resolve_mesh_uncached(name)
    _MESH_CACHE[name] = mesh
    return mesh


def _resolve_mesh_uncached(name: str) -> MeshData:
    for root in ASSET_SEARCH_PATHS:
        # USDZ preferred over other formats (Model.swift:63-67)
        for candidate in (root / f"{name}.usdz", root / name / f"{name}.usdz",
                          root / f"{name}.usda", root / name / f"{name}.usda"):
            if candidate.exists():
                from ..assets.usd import load_usd

                mesh, skin_info = load_usd(candidate)
                mesh._skin_info = skin_info
                return mesh
        for candidate in (root / f"{name}.glb", root / f"{name}.gltf",
                          root / name / f"{name}.glb", root / name / f"{name}.gltf"):
            if candidate.exists():
                from ..assets.gltf import load_gltf

                mesh, skin_info = load_gltf(candidate)
                mesh._skin_info = skin_info
                return mesh
        for candidate in (root / f"{name}.obj", root / name / f"{name}.obj"):
            if candidate.exists():
                return load_obj(candidate)
    from ..assets import procedural

    if name == "dragon":
        # dragon.obj is a missing large blob; a displaced icosphere of similar
        # world extent (~0.3 units before the scene's 1.2x scale) stands in
        return procedural.blob(subdivisions=6, radius=0.28, seed=7, material=MaterialDef(name="Dragon", base_color=(1.0, 0.0, 0.0), specular=(0.2, 0.2, 0.2)))
    if name == "bunny":
        return procedural.blob(subdivisions=5, radius=0.3, seed=13, material=MaterialDef(name="Bunny", base_color=(0.9, 0.85, 0.8)))
    if name == "robot":
        mesh, ji, jw, rest = procedural.skinned_cylinder()
        mesh._skin_stub = (ji, jw, rest)  # picked up by AppScene
        return mesh
    if name == "sphere":
        return procedural.uv_sphere()
    if name.startswith("plane"):
        return procedural.plane()
    raise FileNotFoundError(f"No asset or procedural stand-in for model '{name}'")


class SkinModelData(NamedTuple):
    """Per-skinned-model device data (the SkinningPass buffer set analog,
    SkinningPass.swift:54-121): dense MXU-ready weights + rest pose."""

    weights_dense: jnp.ndarray  # (Vm, J) f32
    rest_positions: jnp.ndarray  # (Vm, 3)
    rest_normals: jnp.ndarray  # (Vm, 3)


class SceneData(NamedTuple):
    """Device-resident flattened scene (one pytree through jit/shard_map)."""

    positions_obj: jnp.ndarray  # (V,3) f32 object-space (rest or skinned)
    prev_positions_obj: jnp.ndarray  # (V,3) f32 previous frame's object-space
    # positions (motion vectors for skinned meshes, SkinningPass prev buffers)
    normals_obj: jnp.ndarray  # (V,3) f32
    uvs: jnp.ndarray  # (V,2) f32
    vertex_instance: jnp.ndarray  # (V,) int32
    indices: jnp.ndarray  # (Tr,3) int32 global vertex ids
    tri_resource: jnp.ndarray  # (Tr,) int32
    tri_instance: jnp.ndarray  # (Tr,) int32
    instance_transform: jnp.ndarray  # (I,4,4) f32
    prev_instance_transform: jnp.ndarray  # (I,4,4) f32
    materials: T.Materials
    lights: T.Lights
    atlas: tex.TextureAtlas
    # Equirectangular HDR environment map (Ke,We,3 linear) sampled on ray miss
    # — a NEW-BUILD feature: the reference terminates miss rays
    # (Raytracing.metal:320-322); BASELINE config 2 requires it.
    env_map: jnp.ndarray
    env_intensity: jnp.ndarray  # () f32


@dataclasses.dataclass(frozen=True)
class SceneStatics:
    """Hashable per-scene compile-time facts (static jit args)."""

    n_vertices: int
    n_triangles: int
    n_instances: int
    n_resources: int
    n_lights: int
    # which map types exist anywhere in the scene: sampling for absent types
    # compiles away entirely
    any_map: tuple  # len N_MAP_TYPES of bool
    has_refraction: bool  # any material with ior>1.01 or opacity<0.999
    has_environment: bool = False
    # any instance with a non-default geometry mask (ShaderTypes.h:26-33);
    # only the two-level backend filters by mask, so mask-less paths must
    # refuse rather than silently ignore it
    has_masks: bool = False
    # per skinned model: (model_index, vertex_start, vertex_count); empty tuple
    # when the scene has no skinning (the LBS stage compiles away)
    skin_slices: tuple = ()


class Scene:
    """Scene.swift:10-170 host analog + compiler."""

    def __init__(self, width: int = 512, height: int = 512):
        self.models: list[Model] = []
        self.width = width
        self.height = height
        # Orbit camera defaults (Scene.swift:111-124): position (0,1,5.38), target 0.
        self.camera_target = np.zeros(3, np.float32)
        default_position = np.array([0.0, 1.0, 5.38], np.float32)
        offset = default_position - self.camera_target
        self.camera_distance = max(0.001, float(np.linalg.norm(offset)))
        self.camera_azimuth = float(np.arctan2(offset[0], offset[2]))
        self.camera_elevation = float(np.arcsin(offset[1] / self.camera_distance))
        self.camera_fov_degrees = 45.0
        self.is_dirty = False

        # Default lights (Scene.swift:82-91): area light1 + spot light3.
        light1 = T.area_light(
            position=[0.0, 1.98, 0.0],
            forward=[0.0, -1.0, 0.0],
            right=[0.25, 0.0, 0.0],
            up=[0.0, 0.0, 0.25],
            color=[4.0, 4.0, 4.0],
        )
        light3 = T.spot_light(
            position=[2, 1, 4],
            direction=[-1.5, -0.5, -1.5],
            cone_angle=25 / 180 * np.pi,
            color=[4, 4, 4],
        )
        self.lights = T.concat_lights(light1, light3)
        # optional equirect HDR environment (set_environment)
        self.env_map = np.zeros((1, 1, 3), np.float32)
        self.env_intensity = 1.0

    # --- runtime API (Scene.swift:26-63) --------------------------------------
    def move_model(self, index: int, forward: float = 0.0, right: float = 0.0):
        if index >= len(self.models):
            return
        if forward != 0:
            self.models[index].forward(forward)
            self.is_dirty = True
        if right != 0:
            self.models[index].strafe(right)
            self.is_dirty = True

    def rotate_model(self, index: int, angle: float):
        if index >= len(self.models) or angle == 0:
            return
        self.models[index].rotate_y(angle)
        self.is_dirty = True

    def set_model_rotation(self, index: int, angle: float):
        if index >= len(self.models):
            return
        self.models[index].set_rotation_y(angle)
        self.is_dirty = True

    def set_light_intensity(self, intensity: float):
        """Scene.swift:57-63 (rebuilds the device light array lazily)."""
        c = jnp.full_like(self.lights.color, intensity)
        self.lights = self.lights._replace(color=c)
        self.is_dirty = True

    def set_environment(self, env_map: np.ndarray, intensity: float = 1.0):
        """Attach an equirectangular HDR environment (lat-long, +Y up).
        Miss rays pick up its radiance (IBL). New-build feature (BASELINE
        config 2); re-compile scene afterwards."""
        self.env_map = np.asarray(env_map, np.float32)
        self.env_intensity = float(intensity)
        self.is_dirty = True

    def camera(self) -> T.Camera:
        return T.orbit_camera(
            self.width,
            self.height,
            self.camera_target,
            self.camera_azimuth,
            self.camera_elevation,
            self.camera_distance,
            self.camera_fov_degrees,
        )

    # --- compiler -------------------------------------------------------------
    def instance_transforms(self) -> np.ndarray:
        return np.stack([m.world_transform for m in self.models]).astype(np.float32)

    def compile(self) -> tuple[SceneData, SceneStatics]:
        positions, normals, uvs, vert_inst = [], [], [], []
        indices, tri_res, tri_inst = [], [], []
        atlas_builder = tex.AtlasBuilder()
        mats: list[MaterialDef] = []
        skin_slices: list = []
        skin_bundle: list = []
        v_base = 0
        for inst, model in enumerate(self.models):
            mesh = model.mesh
            if model.skin is not None:
                from ..skinning import lbs

                n_joints = model.skin.rest_joints.shape[0]
                skin_slices.append((inst, v_base, mesh.positions.shape[0]))
                skin_bundle.append(
                    SkinModelData(
                        weights_dense=jnp.asarray(
                            lbs.dense_weights(model.skin.joint_indices, model.skin.joint_weights, n_joints)
                        ),
                        rest_positions=jnp.asarray(mesh.positions),
                        rest_normals=jnp.asarray(mesh.normals),
                    )
                )
            positions.append(mesh.positions)
            normals.append(mesh.normals)
            uvs.append(mesh.uvs)
            vert_inst.append(np.full(mesh.positions.shape[0], inst, np.int32))
            # per-INSTANCE material snapshots (meshes may be shared between
            # models; overrides must not write through to other instances)
            eff_mats = model.effective_materials()
            for sub, mat in zip(mesh.submeshes, eff_mats):
                res_id = atlas_builder.add_resource(
                    {
                        tex.MAP_BASECOLOR: mat.map_base_color,
                        tex.MAP_NORMAL: mat.map_normal,
                        tex.MAP_ROUGHNESS: mat.map_roughness,
                        tex.MAP_METALLIC: mat.map_metallic,
                        tex.MAP_AO: mat.map_ao,
                        tex.MAP_OPACITY: mat.map_opacity,
                        tex.MAP_EMISSION: mat.map_emission,
                    }
                )
                assert res_id == len(mats)
                mats.append(mat)
                indices.append(sub.indices + v_base)
                tri_res.append(np.full(sub.indices.shape[0], res_id, np.int32))
                tri_inst.append(np.full(sub.indices.shape[0], inst, np.int32))
            v_base += mesh.positions.shape[0]

        atlas = atlas_builder.build()
        # host mirror from the builder — np.asarray(atlas.has_map) would be
        # a device->host readback, which permanently poisons axon dispatch
        # (docs/PERF.md round 2j: one D2H => ~300x slower programs forever)
        has_np = atlas_builder.has_np

        n_res = len(mats)
        materials = T.Materials(
            base_color=jnp.asarray([m.base_color for m in mats], jnp.float32).reshape(n_res, 3),
            specular=jnp.asarray([m.specular for m in mats], jnp.float32).reshape(n_res, 3),
            emission=jnp.asarray([m.emission for m in mats], jnp.float32).reshape(n_res, 3),
            specular_exponent=jnp.asarray([m.specular_exponent for m in mats], jnp.float32),
            refraction_index=jnp.asarray([m.refraction_index for m in mats], jnp.float32),
            opacity=jnp.asarray([m.opacity for m in mats], jnp.float32),
            texture_flags=jnp.asarray(
                [
                    (has_np[i, tex.MAP_BASECOLOR] * T.MATERIAL_TEXTURE_BASECOLOR)
                    | (has_np[i, tex.MAP_NORMAL] * T.MATERIAL_TEXTURE_NORMAL)
                    | (has_np[i, tex.MAP_ROUGHNESS] * T.MATERIAL_TEXTURE_ROUGHNESS)
                    | (has_np[i, tex.MAP_METALLIC] * T.MATERIAL_TEXTURE_METALLIC)
                    | (has_np[i, tex.MAP_AO] * T.MATERIAL_TEXTURE_AO)
                    | (has_np[i, tex.MAP_OPACITY] * T.MATERIAL_TEXTURE_OPACITY)
                    | (has_np[i, tex.MAP_EMISSION] * T.MATERIAL_TEXTURE_EMISSION)
                    for i in range(n_res)
                ],
                jnp.uint32,
            ),
        )

        transforms = self.instance_transforms()
        pos_np = np.concatenate(positions)
        idx_np = np.concatenate(indices)
        vinst_np = np.concatenate(vert_inst)
        tinst_np = np.concatenate(tri_inst)
        # host mirrors of everything the HOST-side BVH builders index —
        # reading the device copies back (np.asarray on SceneData fields)
        # is a device->host transfer, and one D2H permanently poisons axon
        # dispatch ~300x (docs/PERF.md round 2j)
        self.host_mirror = dict(
            positions=pos_np, indices=idx_np, vertex_instance=vinst_np,
            tri_instance=tinst_np, transforms=np.asarray(transforms),
        )
        pos_cat = jnp.asarray(pos_np)
        data = SceneData(
            positions_obj=pos_cat,
            prev_positions_obj=pos_cat,
            normals_obj=jnp.asarray(np.concatenate(normals)),
            uvs=jnp.asarray(np.concatenate(uvs)),
            vertex_instance=jnp.asarray(vinst_np),
            indices=jnp.asarray(idx_np),
            tri_resource=jnp.asarray(np.concatenate(tri_res)),
            tri_instance=jnp.asarray(tinst_np),
            instance_transform=jnp.asarray(transforms),
            prev_instance_transform=jnp.asarray(transforms),
            materials=materials,
            lights=self.lights,
            atlas=atlas,
            env_map=jnp.asarray(self.env_map),
            env_intensity=jnp.asarray(self.env_intensity, jnp.float32),
        )

        mats_ior = np.asarray([m.refraction_index for m in mats], np.float32)
        mats_op = np.asarray([m.opacity for m in mats], np.float32)
        statics = SceneStatics(
            n_vertices=int(data.positions_obj.shape[0]),
            n_triangles=int(data.indices.shape[0]),
            n_instances=len(self.models),
            n_resources=n_res,
            n_lights=int(self.lights.count),
            any_map=tuple(bool(b) for b in has_np.any(axis=0)),
            # the glass branch must also compile in when transparency can only
            # come from an opacity MAP (constant opacity 1.0): the reference
            # evaluates the sampled opacity per hit (Raytracing.metal:517+)
            has_refraction=bool(
                ((mats_ior > 1.01) | (mats_op < 0.999)).any()
                or has_np.any(axis=0)[tex.MAP_OPACITY]
            ),
            has_environment=bool(self.env_map.size > 3 or self.env_map.max() > 0),
            has_masks=any(
                getattr(m, "geometry_mask", T.GEOMETRY_MASK_GEOMETRY)
                != T.GEOMETRY_MASK_GEOMETRY
                for m in self.models
            ),
            skin_slices=tuple(skin_slices),
        )
        self.skin_bundle = tuple(skin_bundle)
        return data, statics


def world_geometry(scene: SceneData):
    """Apply per-instance transforms to the vertex pool — batched on-device
    matmul (the analog of the TLAS transform fetch, Raytracing.metal:329-333,
    hoisted out of the ray loop entirely).

    Returns (positions_world, prev_positions_world, normals_world). Normals are
    transformed by the instance matrix itself — NOT the inverse transpose —
    matching Raytracing.metal:392 exactly.
    """
    M = jnp.take(scene.instance_transform, scene.vertex_instance, axis=0)  # (V,4,4)
    Mp = jnp.take(scene.prev_instance_transform, scene.vertex_instance, axis=0)
    pos_w = jnp.einsum("vij,vj->vi", M[:, :3, :3], scene.positions_obj) + M[:, :3, 3]
    prev_w = (
        jnp.einsum("vij,vj->vi", Mp[:, :3, :3], scene.prev_positions_obj) + Mp[:, :3, 3]
    )
    nrm_w = jnp.einsum("vij,vj->vi", M[:, :3, :3], scene.normals_obj)
    return pos_w, prev_w, nrm_w
