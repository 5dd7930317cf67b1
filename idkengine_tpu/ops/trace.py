"""Wavefront BVH traversal over the threaded (stackless) flat BVH.

The TPU re-design of the reference's GPU traversal
(ref: Resource/Shaders/include/BVHIntersect.glsl TraceRay/TraceRayAny):
instead of per-thread stacks in shared memory, every ray carries one int32
DFS pointer; each while_loop step gathers one node, slab-tests it, tests up
to MAX_LEAF triangles (masked), and advances via hit/miss links. All rays
advance in lockstep (SIMD over the megabatch); divergence costs extra
masked iterations rather than memory traffic, and is mitigated upstream by
ray sorting (render/pathtracer.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import INF, ray_aabb, ray_triangle

DEFAULT_MAX_LEAF = 4  # default for bvh.BuildSettings.max_leaf_triangle_count


@jax.tree_util.register_pytree_node_class
@dataclass
class SceneArrays:
    """Device-resident flattened scene (single merged BLAS for now)."""

    node_min: jnp.ndarray  # (N,3) f32
    node_max: jnp.ndarray  # (N,3) f32
    node_first: jnp.ndarray  # (N,) i32
    node_count: jnp.ndarray  # (N,) i32
    hit_link: jnp.ndarray  # (N,) i32
    miss_link: jnp.ndarray  # (N,) i32
    tri_p0: jnp.ndarray  # (T,3) f32
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_n: jnp.ndarray  # (T,3) u32 octahedral corner normals
    tri_uv: jnp.ndarray  # (T,3,2) f32
    tri_mat: jnp.ndarray  # (T,) i32
    tri_gn: jnp.ndarray  # (T,3) f32 face normal
    max_leaf: int = DEFAULT_MAX_LEAF  # static: unroll bound for leaf tests

    def tree_flatten(self):
        fields = (
            self.node_min, self.node_max, self.node_first, self.node_count,
            self.hit_link, self.miss_link, self.tri_p0, self.tri_e1,
            self.tri_e2, self.tri_n, self.tri_uv, self.tri_mat, self.tri_gn,
        )
        return fields, self.max_leaf

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields, max_leaf=aux)

    @staticmethod
    def from_flat(flat_bvh, flat_tris, max_leaf: int = DEFAULT_MAX_LEAF) -> "SceneArrays":
        return SceneArrays(
            node_min=jnp.asarray(flat_bvh.node_min),
            node_max=jnp.asarray(flat_bvh.node_max),
            node_first=jnp.asarray(flat_bvh.node_first),
            node_count=jnp.asarray(flat_bvh.node_count),
            hit_link=jnp.asarray(flat_bvh.hit_link),
            miss_link=jnp.asarray(flat_bvh.miss_link),
            tri_p0=jnp.asarray(flat_tris.p0),
            tri_e1=jnp.asarray(flat_tris.e1),
            tri_e2=jnp.asarray(flat_tris.e2),
            tri_n=jnp.asarray(flat_tris.n_packed),
            tri_uv=jnp.asarray(flat_tris.uv),
            tri_mat=jnp.asarray(flat_tris.mat),
            tri_gn=jnp.asarray(flat_tris.geom_normal),
            max_leaf=max_leaf,
        )


class Hit(NamedTuple):
    """SoA hit record for a ray batch."""

    t: jnp.ndarray  # (R,) f32; >= t_max => miss
    slot: jnp.ndarray  # (R,) i32 triangle slot, -1 = miss
    u: jnp.ndarray  # (R,) f32 barycentric
    v: jnp.ndarray  # (R,) f32


def _traversal_step(scene: SceneArrays, o, d, inv_d, carry, any_hit: bool, t_cut):
    ptr, t_best, slot, u_best, v_best = carry
    active = ptr >= 0
    pidx = jnp.maximum(ptr, 0)

    nmin = scene.node_min[pidx]
    nmax = scene.node_max[pidx]
    box_hit, _ = ray_aabb(o, inv_d, nmin, nmax, t_best)
    box_hit = box_hit & active

    count = scene.node_count[pidx]
    first = scene.node_first[pidx]
    is_leaf = count > 0
    do_leaf = box_hit & is_leaf

    for k in range(scene.max_leaf):
        valid = do_leaf & (k < count)
        tid = jnp.where(valid, first + k, 0)
        h, t, u, v = ray_triangle(o, d, scene.tri_p0[tid], scene.tri_e1[tid], scene.tri_e2[tid])
        closer = valid & h & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        slot = jnp.where(closer, tid, slot)
        u_best = jnp.where(closer, u, u_best)
        v_best = jnp.where(closer, v, v_best)

    descend = box_hit & ~is_leaf
    nxt = jnp.where(descend, scene.hit_link[pidx], scene.miss_link[pidx])
    ptr = jnp.where(active, nxt, ptr)
    if any_hit:
        # early-out rays that already found an occluder closer than the cut
        ptr = jnp.where(t_best < t_cut, -1, ptr)
    return ptr, t_best, slot, u_best, v_best


@partial(jax.jit, static_argnames=("max_steps",))
def trace_closest(scene: SceneArrays, o, d, t_max=None, max_steps: int = 1 << 30):
    """Closest-hit trace for a ray batch. o/d: (R,3). Returns Hit.

    ref: BVHIntersect.glsl TraceRay — re-expressed stackless."""
    r = o.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), INF)
    elif jnp.ndim(t_max) == 0:
        t_max = jnp.full((r,), t_max)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    carry0 = (
        jnp.zeros((r,), jnp.int32),  # ptr: start at DFS root
        t_max.astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        step, carry = state
        return (step < max_steps) & jnp.any(carry[0] >= 0)

    def body(state):
        step, carry = state
        return step + 1, _traversal_step(scene, o, d, inv_d, carry, False, None)

    _, (ptr, t, slot, u, v) = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    return Hit(t=t, slot=slot, u=u, v=v)


@jax.tree_util.register_pytree_node_class
@dataclass
class InstanceSet:
    """Instanced content for two-level tracing: per-instance local-space
    BLAS arrays (shared between instances of one model), world->local
    affines, world boxes, global slot offsets (so hit slots index one
    combined attribute table) and normal matrices for shading."""

    scenes: tuple  # of SceneArrays, one per instance
    inv: jnp.ndarray  # (I,3,4) world->local
    boxes: jnp.ndarray  # (I,2,3) world AABBs
    slot_off: jnp.ndarray  # (I,) int32 slot offset into the combined table
    normal_mat: jnp.ndarray  # (I,3,3) inverse-transpose rotations

    def tree_flatten(self):
        return (self.scenes, self.inv, self.boxes, self.slot_off,
                self.normal_mat), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


@partial(jax.jit, static_argnames=("max_steps",))
def trace_closest_two_level(static_scene: SceneArrays, inst_scenes,
                            inst_inv, inst_boxes, o, d, t_max,
                            slot_off=None,
                            max_steps: int = 1 << 30):
    """Two-level trace: merged static BLAS + per-instance BLASes with
    world->local ray transforms (the TLAS hot path, ref: TLAS.cs traversal
    entering BLASes through instance inverse transforms +
    BVHIntersect.glsl's USE_TLAS loop).

    inst_scenes: tuple of SceneArrays (one per INSTANCE, local space —
                 instances of the same model share the same arrays)
    inst_inv:    (I, 3, 4) world->local affine per instance
    inst_boxes:  (I, 2, 3) world-space instance AABBs (prune masks)
    Returns (Hit, inst_id) — slot indexes the OWNING arrays (static or the
    instance's blas; instance id -1 = static hit). Rays keep world-space t
    (directions stay unnormalized after the affine map)."""
    r = o.shape[0]
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((r,), t_max)
    t_max = t_max.astype(jnp.float32)
    best = trace_closest(static_scene, o, d, t_max, max_steps=max_steps)
    inst_id = jnp.full((r,), -1, jnp.int32)
    for i, scene_i in enumerate(inst_scenes):
        inv = inst_inv[i]  # (3,4)
        lo_ = o @ inv[:, :3].T + inv[:, 3]
        ld_ = d @ inv[:, :3].T
        # world-space box prune (conservative slab test)
        bmin, bmax = inst_boxes[i, 0], inst_boxes[i, 1]
        dn = jnp.where(jnp.abs(d) < 1e-20,
                       jnp.where(d < 0, -1e-20, 1e-20), d)
        t0 = (bmin[None, :] - o) / dn
        t1 = (bmax[None, :] - o) / dn
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        need = (tf >= tn) & (tn < best.t) & (best.t > 0)
        tm_i = jnp.where(need, best.t, jnp.float32(-1.0))
        h = trace_closest(scene_i, lo_, ld_, tm_i, max_steps=max_steps)
        closer = h.slot >= 0  # t < tm_i implied by the hit test
        off = 0 if slot_off is None else slot_off[i]
        best = Hit(
            t=jnp.where(closer, h.t, best.t),
            slot=jnp.where(closer, h.slot + off, best.slot),
            u=jnp.where(closer, h.u, best.u),
            v=jnp.where(closer, h.v, best.v),
        )
        inst_id = jnp.where(closer, i, inst_id)
    return best, inst_id


@partial(jax.jit, static_argnames=("max_steps",))
def trace_any_two_level(static_scene: SceneArrays, inst_scenes, inst_inv,
                        inst_boxes, o, d, t_max, max_steps: int = 1 << 30):
    """Occlusion over static + instanced content."""
    r = o.shape[0]
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((r,), t_max)
    t_max = t_max.astype(jnp.float32)
    occ = trace_any(static_scene, o, d, t_max, max_steps=max_steps)
    for i, scene_i in enumerate(inst_scenes):
        inv = inst_inv[i]
        lo_ = o @ inv[:, :3].T + inv[:, 3]
        ld_ = d @ inv[:, :3].T
        tm_i = jnp.where(occ, jnp.float32(-1.0), t_max)
        occ = occ | trace_any(scene_i, lo_, ld_, tm_i, max_steps=max_steps)
    return occ


@partial(jax.jit, static_argnames=("max_steps",))
def trace_closest_steps(scene: SceneArrays, o, d, t_max=None,
                        max_steps: int = 1 << 30):
    """trace_closest + per-ray traversal step counts (the debug-statistics
    path, ref: BLAS.cs DebugStatistics counters + the BVH-cost heatmap)."""
    r = o.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), INF)
    elif jnp.ndim(t_max) == 0:
        t_max = jnp.full((r,), t_max)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    carry0 = (
        jnp.zeros((r,), jnp.int32),
        t_max.astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        step, carry, steps = state
        return (step < max_steps) & jnp.any(carry[0] >= 0)

    def body(state):
        step, carry, steps = state
        steps = steps + (carry[0] >= 0).astype(jnp.int32)
        return step + 1, _traversal_step(scene, o, d, inv_d, carry, False, None), steps

    _, (ptr, t, slot, u, v), steps = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry0, jnp.zeros((r,), jnp.int32)))
    return Hit(t=t, slot=slot, u=u, v=v), steps


@partial(jax.jit, static_argnames=("max_steps",))
def trace_any(scene: SceneArrays, o, d, t_max, max_steps: int = 1 << 30):
    """Any-hit (occlusion) trace: returns bool (R,) 'occluded before t_max'.

    ref: BVHIntersect.glsl TraceRayAny."""
    r = o.shape[0]
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((r,), t_max)
    t_max = t_max.astype(jnp.float32)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    carry0 = (
        jnp.zeros((r,), jnp.int32),
        t_max,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        step, carry = state
        return (step < max_steps) & jnp.any(carry[0] >= 0)

    def body(state):
        step, carry = state
        return step + 1, _traversal_step(scene, o, d, inv_d, carry, True, t_max)

    _, (ptr, t, slot, _, _) = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    return slot >= 0
