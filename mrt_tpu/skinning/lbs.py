"""Linear-blend skinning — the TPU-native replacement for ``skinningKernel``
(Skinning.metal:7-49).

The Metal kernel is 1-thread-per-vertex with 4 indexed matrix fetches. On TPU
that gather pattern is the enemy, so skinning is reformulated as ONE dense
matmul on the MXU: the (V, 4) sparse joint weights are expanded once at scene
compile into a dense (V, J) matrix W (J = joint count, typically 4..128);
per frame the blended per-vertex transform is ``W @ M`` where M is the
(J, 12) flattened joint-matrix array. Semantics preserved exactly:

* weights are NOT normalized (used as authored, Skinning.metal:26-31)
* near-zero weight sum falls back to joint 0 (Skinning.metal:28-31)
* normals transformed with w=0 (Skinning.metal:42-45)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dense_weights(joint_indices: np.ndarray, joint_weights: np.ndarray, n_joints: int) -> np.ndarray:
    """(V,4) sparse -> (V,J) dense, with the zero-weight fallback baked in.
    Host-side, once at scene compile."""
    v = joint_indices.shape[0]
    w = np.asarray(joint_weights, np.float32)
    wsum = w.sum(axis=1)
    fallback = wsum < 1e-4  # Skinning.metal:28-31
    dense = np.zeros((v, n_joints), np.float32)
    rows = np.arange(v)
    for k in range(joint_indices.shape[1]):
        np.add.at(dense, (rows, np.clip(joint_indices[:, k], 0, n_joints - 1)), w[:, k])
    # fallback weights float4(1,0,0,0) apply to jointMatrices[indices.x] —
    # the vertex's FIRST joint index, not global joint 0 (Skinning.metal:28-37)
    dense[fallback] = 0.0
    first_joint = np.clip(joint_indices[fallback, 0], 0, n_joints - 1)
    dense[np.flatnonzero(fallback), first_joint] = 1.0
    return dense


def skin(
    weights_dense: jnp.ndarray,  # (V, J) f32
    joint_matrices: jnp.ndarray,  # (J, 4, 4) f32 final skinning matrices
    rest_positions: jnp.ndarray,  # (V, 3)
    rest_normals: jnp.ndarray,  # (V, 3)
):
    """Returns (skinned_positions (V,3), skinned_normals (V,3)). Jittable.

    Blended matrix per vertex = W @ M_flat (MXU matmul), then one fused
    affine apply on the VPU.
    """
    j = joint_matrices.shape[0]
    m_flat = joint_matrices[:, :3, :].reshape(j, 12)  # rows: 3x4 affine
    blended = jnp.dot(weights_dense, m_flat, preferred_element_type=jnp.float32)  # (V, 12)
    b = blended.reshape(-1, 3, 4)
    p = rest_positions
    n = rest_normals
    pos = jnp.einsum("vij,vj->vi", b[:, :, :3], p) + b[:, :, 3]
    nrm = jnp.einsum("vij,vj->vi", b[:, :, :3], n)
    return pos, nrm


def compose_final_matrices(
    skin_matrices: np.ndarray,  # (J,4,4) global @ inverseBind (Model.swift:259-260)
    geometry_bind: np.ndarray | None,  # (4,4) mesh geometry bind transform
) -> np.ndarray:
    """finalJointMatrix = geometryBindInverse @ skinMatrix @ geometryBind
    (SkinningPass.swift:150). Host-side, per frame (cheap: J small)."""
    if geometry_bind is None:
        return skin_matrices
    gb = np.asarray(geometry_bind, np.float32)
    gb_inv = np.linalg.inv(gb)
    return np.einsum("ab,jbc,cd->jad", gb_inv, skin_matrices, gb).astype(np.float32)
