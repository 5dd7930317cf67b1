"""jnp intersection primitives, batched over rays (device code).

Re-expressions of the reference's GLSL intersectors
(ref: Resource/Shaders/include/IntersectionRoutines.glsl) as vectorized
jnp functions — VPU-friendly: no branches, masks everywhere.
"""
from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(3.4e38)


def ray_aabb(o, inv_d, bmin, bmax, t_max):
    """Slab test. o/inv_d: (...,3); bmin/bmax broadcastable. Returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    tn = jnp.maximum(tn, 0.0)
    return (tf >= tn) & (tn <= t_max), tn


def ray_triangle(o, d, p0, e1, e2):
    """Möller–Trumbore. All (...,3). Returns (hit, t, u, v) with t>0."""
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - p0
    u = jnp.sum(s * pv, axis=-1) * inv_det
    qv = jnp.cross(s, e1)
    v = jnp.sum(d * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return hit, t, u, v


def ray_sphere(o, d, center, radius):
    """Returns (hit, t) nearest positive root (ref: IntersectionRoutines RayVsSphere)."""
    oc = o - center
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    return (disc >= 0.0) & (t > 0.0), t
