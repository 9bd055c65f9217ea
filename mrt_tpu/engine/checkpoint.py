"""Checkpoint / resume of renderer state — a new-build subsystem (the
reference has none, SURVEY.md §5.4): persists the progressive-rendering state
(accumulation history, motion/depth, Halton decorrelation offsets, frame
index, camera orbit parameters, animation clocks) so a long accumulation or
an interactive session can resume exactly where it stopped.
"""

from __future__ import annotations

import numpy as np

FORMAT_VERSION = 1


def save(renderer, path: str) -> None:
    """Write the renderer's resumable state to an .npz file."""
    state = dict(
        version=FORMAT_VERSION,
        # scene fingerprint: restore() refuses checkpoints from a different
        # scene instead of silently truncating skin clocks / failing later
        # with opaque shape errors
        scene_fingerprint=np.asarray(
            [
                renderer.scene_data.positions_obj.shape[0],
                renderer.scene_data.indices.shape[0],
                len(renderer.statics.skin_slices),
            ],
            np.int64,
        ),
        accum=np.asarray(renderer.accum),
        motion=np.asarray(renderer.motion),
        depth=np.asarray(renderer.depth),
        offsets=np.asarray(renderer.offsets),
        # hit/occluder priming caches: pure hints, but saving them keeps a
        # resumed render bit-identical to an uninterrupted one
        prime_primary=np.asarray(renderer.prime_primary),
        prime_shadow=np.asarray(renderer.prime_shadow),
        frame_index=renderer.frame_index,
        camera_azimuth=renderer.camera_azimuth,
        camera_elevation=renderer.camera_elevation,
        camera_distance=renderer.camera_distance,
        camera_fov_degrees=renderer.camera_fov_degrees,
        scene_time=renderer._scene_time,
        last_skinning_update=(
            renderer._last_skinning_update
            if renderer._last_skinning_update is not None
            else np.nan
        ),
        skin_times=np.asarray(
            [renderer.scene.models[i].skin.current_time for i, _, _ in renderer.statics.skin_slices],
            np.float64,
        ),
        # skinned pose buffers (motion vectors need the previous frame's pose)
        positions_obj=np.asarray(renderer.scene_data.positions_obj),
        prev_positions_obj=np.asarray(renderer.scene_data.prev_positions_obj),
        prev_camera=np.stack(
            [np.asarray(x) for x in renderer._previous_camera]
        )
        if renderer._previous_camera is not None
        else np.zeros((0, 3), np.float32),
    )
    np.savez_compressed(path, **state)


def restore(renderer, path: str) -> None:
    """Load state saved by :func:`save` into a renderer built over the same
    scene/settings (shapes must match)."""
    import jax.numpy as jnp

    from ..core.types import Camera

    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {int(z['version'])} != {FORMAT_VERSION}")
    expected = (renderer.render_height, renderer.render_width, 3)
    if z["accum"].shape != expected:
        raise ValueError(
            f"checkpoint resolution {z['accum'].shape} != renderer {expected}"
        )
    if "scene_fingerprint" in z:
        fp = tuple(int(x) for x in z["scene_fingerprint"])
        here = (
            int(renderer.scene_data.positions_obj.shape[0]),
            int(renderer.scene_data.indices.shape[0]),
            len(renderer.statics.skin_slices),
        )
        if fp != here:
            raise ValueError(
                f"checkpoint scene fingerprint {fp} (n_vertices, n_triangles, "
                f"n_skinned) != renderer scene {here}"
            )
    if renderer._state_size != expected[:2]:
        renderer._allocate_state()  # settings changed since init; size up first
    renderer.accum = jnp.asarray(z["accum"])
    renderer.motion = jnp.asarray(z["motion"])
    renderer.depth = jnp.asarray(z["depth"])
    object.__setattr__(renderer, "offsets", jnp.asarray(z["offsets"]))
    if "prime_primary" in z:
        renderer.prime_primary = jnp.asarray(z["prime_primary"])
        renderer.prime_shadow = jnp.asarray(z["prime_shadow"])
    renderer.camera_azimuth = float(z["camera_azimuth"])
    renderer.camera_elevation = float(z["camera_elevation"])
    renderer.camera_distance = float(z["camera_distance"])
    renderer.camera_fov_degrees = float(z["camera_fov_degrees"])
    renderer._scene_time = float(z["scene_time"])
    lsu = float(z["last_skinning_update"]) if "last_skinning_update" in z else np.nan
    renderer._last_skinning_update = None if np.isnan(lsu) else lsu
    renderer._joint_matrices = ()  # recomputed from restored clip times
    if "positions_obj" in z:
        renderer.scene_data = renderer.scene_data._replace(
            positions_obj=jnp.asarray(z["positions_obj"]),
            prev_positions_obj=jnp.asarray(z["prev_positions_obj"]),
        )
    for (i, _, _), t in zip(renderer.statics.skin_slices, z["skin_times"]):
        renderer.scene.models[i].skin.current_time = float(t)
    if z["prev_camera"].shape[0] == 4:
        pc = z["prev_camera"]
        renderer._previous_camera = Camera(
            jnp.asarray(pc[0]), jnp.asarray(pc[1]), jnp.asarray(pc[2]), jnp.asarray(pc[3])
        )
    # restore LAST: property writes above reset frame_index via the didSet idiom
    object.__setattr__(renderer, "frame_index", int(z["frame_index"]))


def save_dist(dr, path: str) -> None:
    """Checkpoint a :class:`~mrt_tpu.dist.sharding.DistributedRenderer` —
    the pod-scale analog of :func:`save` (a long dp-sharded accumulation is
    exactly where resume matters). Sharded state is gathered to host; the
    camera comes from the Scene's orbit parameters, as in draw()."""
    state = dict(
        version=FORMAT_VERSION,
        scene_fingerprint=np.asarray(
            [
                dr.scene_data.positions_obj.shape[0],
                dr.scene_data.indices.shape[0],
                len(dr.statics.skin_slices),
            ],
            np.int64,
        ),
        accum=np.asarray(dr.accum),
        motion=np.asarray(dr.motion),
        depth=np.asarray(dr.depth),
        step_hint=np.asarray(dr.step_hint),
        offsets=np.asarray(dr.offsets),
        frame_index=dr.frame_index,
        prev_camera=np.stack([np.asarray(x) for x in dr._previous_camera])
        if dr._previous_camera is not None
        else np.zeros((0, 3), np.float32),
        joint_matrices=np.concatenate(
            [np.asarray(m).reshape(-1, 4, 4) for m in dr._joint_matrices]
        )
        if dr._joint_matrices
        else np.zeros((0, 4, 4), np.float32),
    )
    np.savez_compressed(path, **state)


def restore_dist(dr, path: str) -> None:
    """Load :func:`save_dist` state into a DistributedRenderer over the same
    scene/settings (any mesh shape — state re-commits to ITS shardings)."""
    import jax
    import jax.numpy as jnp

    from ..core.types import Camera

    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {int(z['version'])} != {FORMAT_VERSION}")
    fp = tuple(int(x) for x in z["scene_fingerprint"])
    here = (
        int(dr.scene_data.positions_obj.shape[0]),
        int(dr.scene_data.indices.shape[0]),
        len(dr.statics.skin_slices),
    )
    if fp != here:
        raise ValueError(
            f"checkpoint scene fingerprint {fp} != renderer scene {here}")
    if z["accum"].shape != tuple(dr.accum.shape):
        raise ValueError(
            f"checkpoint resolution {z['accum'].shape} != {tuple(dr.accum.shape)}")
    dr.accum = jax.device_put(jnp.asarray(z["accum"]), dr._img_sharded)
    dr.motion = jax.device_put(jnp.asarray(z["motion"]), dr._img_sharded)
    dr.depth = jnp.asarray(z["depth"])
    dr.step_hint = jax.device_put(jnp.asarray(z["step_hint"]), dr._row_sharded)
    dr.offsets = jax.device_put(jnp.asarray(z["offsets"]), dr._row_sharded)
    dr.frame_index = int(z["frame_index"])
    if z["prev_camera"].shape[0] == 4:
        pc = z["prev_camera"]
        dr._previous_camera = Camera(
            jnp.asarray(pc[0]), jnp.asarray(pc[1]), jnp.asarray(pc[2]),
            jnp.asarray(pc[3]))
    jm = z["joint_matrices"]
    if jm.shape[0] and dr._joint_matrices:
        out = []
        k = 0
        for m in dr._joint_matrices:
            n = m.shape[0]
            out.append(jnp.asarray(jm[k : k + n]))
            k += n
        dr._joint_matrices = tuple(out)
