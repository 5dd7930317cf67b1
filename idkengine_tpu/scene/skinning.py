"""Linear-blend skinning (device, MXU-friendly batched matmuls).

Re-expression of the reference's skinning compute pass
(ref: Resource/Shaders/Skinning/compute.glsl — 64-wide 4-joint LBS from
mat4x3 joint matrices). On TPU the whole mesh skins as one batched einsum;
no readback is needed for the BVH refit because the refit consumes the
same device arrays (the reference needs a fenced GPU→CPU readback,
ModelManager.cs:281-359).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def joint_matrices(global_transforms: np.ndarray, skin) -> np.ndarray:
    """(J,4,4) skinning matrices = joint_global @ inverse_bind
    (ref: ModelManager joint matrix upload)."""
    jm = global_transforms[skin.joints] @ skin.inverse_bind_matrices
    return jm.astype(np.float32)


@jax.jit
def skin_positions(positions, joints, weights, jmats):
    """LBS: positions (V,3), joints (V,4) int, weights (V,4), jmats (J,4,4).

    Returns skinned (V,3). The per-vertex blend matrix is a weighted sum of
    joint matrices — batched (V,4,4) x (V,4) work the MXU handles well."""
    m = jnp.einsum("vj,vjrc->vrc", weights, jmats[joints])  # (V,4,4)
    p = jnp.concatenate([positions, jnp.ones((positions.shape[0], 1))], axis=-1)
    out = jnp.einsum("vrc,vc->vr", m, p)
    return out[:, :3]


@jax.jit
def skin_normals(normals, joints, weights, jmats):
    """Skin normals with the blended rotation part (no inverse-transpose —
    assumes uniform scale like the reference's mat4x3 path)."""
    m = jnp.einsum("vj,vjrc->vrc", weights, jmats[joints])[:, :3, :3]
    out = jnp.einsum("vrc,vc->vr", m, normals)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
