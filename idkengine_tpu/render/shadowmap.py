"""Point-light cube shadow maps: ray-traced build + PCF lookup.

TPU re-design of the reference's shadow-map path (ref:
Source/Render/CpuPointShadow.cs:187-195 — six face matrices over a D16
cubemap; PointShadowManager.cs:12,29-37 — up to 128 maps; PCF sampling in
Resource/Shaders/DeferredLighting/include/Impl.glsl — 21-tap cube offsets).

There is no rasterizer on TPU, so the map is BUILT by tracing one distance
ray per cubemap texel from the light center (the reference's ray-traced
shadow mode, ShadowsRayTraced/compute.glsl, already proves distance-from-
light equivalence). The LOOKUP side is classic PCF: direction → face+uv,
compare fragment distance against filtered map depth. Building is a packet
trace of 6*res^2 coherent rays — ideal for the packet kernel — and maps are
cached until the scene moves (ref: shadow maps re-render per frame only for
moved lights, LightManager.cs:363-388).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

MAX_POINT_SHADOWS = 128  # ref: PointShadowManager.cs:12


def _face_dirs(face: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cubemap (face, u, v) -> direction, u/v in [-1, 1]. Face order
    +X,-X,+Y,-Y,+Z,-Z (GL convention, ref: CpuPointShadow face matrices)."""
    one = jnp.ones_like(u)
    dirs = jnp.stack(
        [
            jnp.stack([one, -v, -u], -1),
            jnp.stack([-one, -v, u], -1),
            jnp.stack([u, one, v], -1),
            jnp.stack([u, -one, -v], -1),
            jnp.stack([u, -v, one], -1),
            jnp.stack([-u, -v, -one], -1),
        ],
        0,
    )  # (6, N, 3)
    d = jnp.take_along_axis(dirs, face[None, :, None], axis=0)[0]
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _dir_to_face_uv(d):
    """direction -> (face, u, v) with u/v in [0,1]. Inverse of _face_dirs."""
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(d[..., 0] > 0, 0, 1),
        jnp.where(is_y, jnp.where(d[..., 1] > 0, 2, 3), jnp.where(d[..., 2] > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    # per-face (u,v) consistent with _face_dirs
    u = jnp.where(
        is_x,
        jnp.where(d[..., 0] > 0, -d[..., 2], d[..., 2]),
        jnp.where(is_y, d[..., 0], jnp.where(d[..., 2] > 0, d[..., 0], -d[..., 0])),
    )
    v = jnp.where(is_y, jnp.where(d[..., 1] > 0, d[..., 2], -d[..., 2]), -d[..., 1])
    return face, (u / ma) * 0.5 + 0.5, (v / ma) * 0.5 + 0.5


@dataclass
class PointShadowMap:
    """One light's cube distance map (6, res, res) f32 (ref: D16 cubemap)."""

    light_pos: np.ndarray
    maps: jnp.ndarray  # (6, res, res) distance from light
    res: int
    face_mask: np.ndarray | None = None  # (6,) faces actually traced


def face_visibility(light_pos, camera_frustum, far: float = 1e5):
    """Per-cubemap-face visibility vs the camera frustum via convex SAT
    (ref: CpuPointShadow.cs per-face frustum-vs-frustum culling :116-185).
    Returns a (6,) bool array."""
    from ..collision import Frustum, convex_sat_intersect

    vis = np.ones(6, bool)
    corner_uv = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float32)
    for f in range(6):
        face = jnp.full((4,), f, jnp.int32)
        dirs = np.asarray(_face_dirs(face, jnp.asarray(corner_uv[:, 0]),
                                     jnp.asarray(corner_uv[:, 1])))
        fr = Frustum.from_corner_rays(light_pos, dirs, 1e-3, far)
        vis[f] = convex_sat_intersect(fr, camera_frustum)
    return vis


def build_point_shadow(trace_closest_fn, light_pos, res: int = 256,
                       t_max: float = 3.4e38,
                       face_mask=None) -> PointShadowMap:
    """Trace 6*res^2 texel rays from the light center; store hit distance
    (the reference rasterizes the scene into each face instead —
    CpuPointShadow.cs:116-185; here the build is one coherent packet trace).
    face_mask: optional (6,) bool — culled faces trace dead rays (their
    packets exit at the root test; the map stores 'far')."""
    face = jnp.repeat(jnp.arange(6, dtype=jnp.int32), res * res)
    ij = jnp.arange(res * res, dtype=jnp.int32)
    uu = ((ij % res).astype(jnp.float32) + 0.5) / res * 2.0 - 1.0
    vv = ((ij // res).astype(jnp.float32) + 0.5) / res * 2.0 - 1.0
    u = jnp.tile(uu, 6)
    v = jnp.tile(vv, 6)
    d = _face_dirs(face, u, v)
    o = jnp.broadcast_to(jnp.asarray(light_pos, jnp.float32), d.shape)
    tm = jnp.full((d.shape[0],), t_max, jnp.float32)
    if face_mask is not None:
        tm = jnp.where(jnp.asarray(np.asarray(face_mask))[face], tm,
                       jnp.float32(-1.0))
    t = trace_closest_fn(o, d, tm)
    dist = jnp.where(t > 0, t, jnp.float32(3.4e38))
    return PointShadowMap(
        light_pos=np.asarray(light_pos, np.float32),
        maps=dist.reshape(6, res, res),
        res=res,
        face_mask=(np.ones(6, bool) if face_mask is None
                   else np.asarray(face_mask, bool)),
    )


# 20-tap cube PCF offset directions (ref: Impl.glsl SampleOffsetDirections —
# the reference uses 21 taps incl. center; disk of unit offsets here)
_PCF_OFFSETS = np.array(
    [
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 0], [1, -1, 0], [-1, -1, 0], [-1, 1, 0],
        [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
        [0, 1, 1], [0, -1, 1], [0, -1, -1], [0, 1, -1],
    ],
    np.float32,
) / np.sqrt(3.0)


def pcf_visibility(shadow: PointShadowMap, points, radius: float = 0.02,
                   bias: float = 1.5e-2) -> jnp.ndarray:
    """(R,3) world points -> (R,) visibility in [0,1]: 21-tap PCF against the
    cube distance map (ref: Impl.glsl PCF + comparison sampler,
    CpuPointShadow.cs:226-231)."""
    lp = jnp.asarray(shadow.light_pos)
    delta = points - lp
    dist = jnp.linalg.norm(delta, axis=-1)
    base = delta / jnp.maximum(dist[..., None], 1e-12)
    offs = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), jnp.asarray(_PCF_OFFSETS)])
    vis = jnp.zeros_like(dist)
    res = shadow.res
    for k in range(offs.shape[0]):
        d = base + offs[k] * radius
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        face, u, v = _dir_to_face_uv(d)
        x = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
        y = jnp.clip((v * res).astype(jnp.int32), 0, res - 1)
        md = shadow.maps[face, y, x]
        vis = vis + (dist * (1.0 - bias) <= md).astype(jnp.float32)
    return vis / offs.shape[0]


class PointShadowManager:
    """Holds up to MAX_POINT_SHADOWS maps; rebuilds for moved lights
    (ref: PointShadowManager.cs:29-45 + LightManager moved-flags)."""

    def __init__(self, trace_closest_fn, res: int = 256):
        self._trace = trace_closest_fn
        self.res = res
        self.shadows: dict[int, PointShadowMap] = {}
        self._positions: dict[int, np.ndarray] = {}

    def update(self, light_index: int, light_pos,
               camera_frustum=None) -> PointShadowMap:
        pos = np.asarray(light_pos, np.float32)
        prev = self._positions.get(light_index)
        mask = None
        if camera_frustum is not None:
            mask = face_visibility(pos, camera_frustum)
        cached = self.shadows.get(light_index)
        stale = prev is None or not np.allclose(prev, pos)
        if not stale and cached is not None and mask is not None:
            # a face culled at build time is now needed -> rebuild
            stale = bool(np.any(mask & ~cached.face_mask))
        if stale:
            if len(self.shadows) >= MAX_POINT_SHADOWS and light_index not in self.shadows:
                raise ValueError(f"at most {MAX_POINT_SHADOWS} point shadows")
            self.shadows[light_index] = build_point_shadow(
                self._trace, pos, self.res, face_mask=mask)
            self._positions[light_index] = pos
        return self.shadows[light_index]
