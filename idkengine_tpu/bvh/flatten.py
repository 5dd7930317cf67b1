"""Flatten a built BVH + scene geometry into SoA device arrays.

TPU-first design decision: the device traversal uses a *threaded* BVH —
nodes in DFS order with precomputed hit (descend) and miss (skip) links —
so per-ray traversal state is a single int32 pointer. No per-ray stacks,
no scatter ops, no divergence-driven memory traffic: each while_loop step
is pure gathers + vector math. This replaces the reference's shared-memory
traversal stacks (ref: Resource/Shaders/include/BVHIntersect.glsl:18-22),
which have no efficient TPU analogue.

Triangles are de-indexed into leaf-slot order: leaf [first, first+count)
ranges directly index the triangle SoA arrays (the reference keeps
leaf-contiguous geometry for the same reason, ref: BLAS.cs:12-22).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils import compression as comp


@dataclass
class FlatBvh:
    """Threaded-BVH arrays (numpy; device upload happens in render layer)."""

    node_min: np.ndarray  # (N,3) f32
    node_max: np.ndarray  # (N,3) f32
    node_first: np.ndarray  # (N,) i32 — leaf: first tri slot; interior: unused(-1)
    node_count: np.ndarray  # (N,) i32 — 0 for interior
    hit_link: np.ndarray  # (N,) i32 — next node when box hit & interior (DFS child)
    miss_link: np.ndarray  # (N,) i32 — next node when box missed / after leaf (-1 = done)
    order: np.ndarray | None = None  # DFS order: builder node id per flat slot

    def refresh_boxes(self, nodes: np.ndarray):
        """Update node AABBs in place after a refit (topology unchanged)."""
        self.node_min = np.ascontiguousarray(nodes["min"][self.order], np.float32)
        self.node_max = np.ascontiguousarray(nodes["max"][self.order], np.float32)


def thread_bvh(nodes: np.ndarray) -> tuple[FlatBvh, np.ndarray]:
    """Convert builder nodes (structured NODE_DTYPE, root=0, children l/l+1)
    into DFS-ordered threaded arrays.

    Returns (FlatBvh, slot_perm) where slot_perm maps new leaf-slot order to
    the builder's tri_indices order (identity if leaves already DFS-ordered).
    """
    n = nodes.shape[0]
    from . import builder as _builder

    native = _builder.tree_thread_links(nodes)
    if native is not None:
        order, subtree_end = native
    else:
        # DFS order visiting left (larger) child first — matches build layout.
        order = np.empty(n, dtype=np.int64)
        dfs_index = np.empty(n, dtype=np.int64)
        pos = 0
        # iterative DFS; also record each node's "next" (miss) target by
        # tracking, for every node, the subtree-end: nodes are re-numbered in
        # DFS order so a subtree occupies a contiguous index range, and the
        # miss link of node i is simply one-past its subtree end.
        stack = [0]
        while stack:
            ni = stack.pop()
            order[pos] = ni
            dfs_index[ni] = pos
            pos += 1
            if nodes["count"][ni] == 0:
                l = int(nodes["left_or_first"][ni])
                stack.append(l + 1)
                stack.append(l)
        assert pos == n

        subtree_end = np.empty(n, dtype=np.int64)  # DFS numbering, exclusive

        # compute subtree sizes bottom-up over DFS order (children come after
        # parents and a parent's range ends where its right child's ends)
        for i in range(n - 1, -1, -1):
            ni = order[i]
            if nodes["count"][ni] > 0:
                subtree_end[i] = i + 1
            else:
                l = int(nodes["left_or_first"][ni])
                subtree_end[i] = subtree_end[dfs_index[l + 1]]

    node_min = np.ascontiguousarray(nodes["min"][order], np.float32)
    node_max = np.ascontiguousarray(nodes["max"][order], np.float32)
    counts = nodes["count"][order].astype(np.int32)
    first_raw = nodes["left_or_first"][order].astype(np.int64)

    hit_link = np.arange(1, n + 1, dtype=np.int32)  # DFS: descend = next node
    miss_link = subtree_end.astype(np.int32)
    miss_link[miss_link == n] = -1
    hit_link[counts > 0] = miss_link[counts > 0]  # leaves: fall through

    # Leaf slot ids stay in BUILDER order (contiguous per leaf already) so
    # the threaded and packet tracers share one triangle slot space.
    leaf_mask = counts > 0
    new_first = np.where(leaf_mask, first_raw, -1).astype(np.int32)
    n_slots = int((first_raw + counts)[leaf_mask].max()) if leaf_mask.any() else 0
    slot_perm = np.arange(n_slots, dtype=np.int64)  # identity: builder order

    return (
        FlatBvh(
            node_min=node_min,
            node_max=node_max,
            node_first=new_first,
            node_count=counts,
            hit_link=hit_link,
            miss_link=miss_link,
            order=order,
        ),
        slot_perm,
    )


@dataclass
class FlatTriangles:
    """Per-leaf-slot triangle SoA: geometry + shading attributes.

    p0/e1/e2 precomputed for Möller–Trumbore; normals/uvs per corner;
    material id per triangle. Normals packed octahedral-snorm16 (u32) to
    halve HBM traffic (ref: Compression.glsl octahedral path)."""

    p0: np.ndarray  # (T,3) f32
    e1: np.ndarray  # (T,3) f32
    e2: np.ndarray  # (T,3) f32
    n_packed: np.ndarray  # (T,3) u32 octahedral per corner
    uv: np.ndarray  # (T,3,2) f32
    mat: np.ndarray  # (T,) i32
    geom_normal: np.ndarray  # (T,3) u32-free f32 — face normal (unit)


def flatten_triangles(
    slot_tri_ids: np.ndarray,
    vertices: np.ndarray,
    indices: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray | None,
    tri_material: np.ndarray,
) -> FlatTriangles:
    """Gather per-slot triangle data (slot_tri_ids maps slot -> original tri)."""
    tids = slot_tri_ids.astype(np.int64)
    tri_v = indices[tids]  # (T,3)
    p = vertices[tri_v]  # (T,3,3)
    p0 = p[:, 0]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    nrm = normals[tri_v]  # (T,3,3)
    n_packed = np.stack(
        [comp.compress_normal(nrm[:, k]) for k in range(3)], axis=1
    ).astype(np.uint32)
    gn = np.cross(e1, e2)
    gl = np.linalg.norm(gn, axis=-1, keepdims=True)
    gn = gn / np.maximum(gl, 1e-20)
    uv = (
        uvs[tri_v].astype(np.float32)
        if uvs is not None
        else np.zeros((tids.shape[0], 3, 2), np.float32)
    )
    return FlatTriangles(
        p0=p0.astype(np.float32),
        e1=e1.astype(np.float32),
        e2=e2.astype(np.float32),
        n_packed=n_packed,
        uv=uv,
        mat=tri_material[tids].astype(np.int32),
        geom_normal=gn.astype(np.float32),
    )


def flatten_triangles_device(
    slot_tri_ids: np.ndarray,
    vertices: np.ndarray,
    indices: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray | None,
    tri_material: np.ndarray,
) -> FlatTriangles:
    """Device-side twin of flatten_triangles: uploads the RAW indexed mesh
    (much smaller than the de-indexed SoA) and runs the gathers + octahedral
    compression on device. At 2.8M tris this replaces ~10 s of single-core
    numpy with sub-ms device work and shrinks the host→device transfer from
    ~330 MB (de-indexed) to ~120 MB (indexed). Returns a FlatTriangles whose
    fields are jnp arrays — SceneArrays.from_flat accepts either."""
    import jax
    import jax.numpy as jnp

    from ..utils.compression import compress_normal_xp

    @jax.jit
    def _pack(tids, verts, idx, nrm, uv_in, tmat):
        tri_v = idx[tids]  # (T,3) i32
        p = verts[tri_v]  # (T,3,3)
        p0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        n3 = nrm[tri_v]  # (T,3,3)
        n_packed = jnp.stack(
            [compress_normal_xp(n3[:, k], jnp) for k in range(3)], axis=1)
        gn = jnp.cross(e1, e2)
        gl = jnp.linalg.norm(gn, axis=-1, keepdims=True)
        gn = gn / jnp.maximum(gl, 1e-20)
        uv = uv_in[tri_v].astype(jnp.float32)
        return p0, e1, e2, n_packed, uv, tmat[tids], gn

    tids = jnp.asarray(slot_tri_ids.astype(np.int32))
    uv_host = (uvs.astype(np.float32) if uvs is not None
               else np.zeros((vertices.shape[0], 2), np.float32))
    p0, e1, e2, n_packed, uv, mat, gn = _pack(
        tids, jnp.asarray(vertices, jnp.float32),
        jnp.asarray(indices.astype(np.int32)),
        jnp.asarray(normals, jnp.float32), jnp.asarray(uv_host),
        jnp.asarray(tri_material.astype(np.int32)))
    return FlatTriangles(p0=p0, e1=e1, e2=e2, n_packed=n_packed, uv=uv,
                         mat=mat, geom_normal=gn)
