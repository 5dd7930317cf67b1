"""G-buffer generation via primary rays.

TPU re-design of the reference's G-buffer fill: the rasterized MDI draw with
vertex/mesh-shader paths (ref: Source/Render/RasterPipeline.cs:364-414 +
GBuffer/VertexPath/*.glsl) has no TPU analogue — primary VISIBILITY is a
ray-cast, sharing the PT's traversal kernels. The output layout matches the
reference's G-buffer attachments (ref: RasterPipeline.cs:646-686: albedo,
normal, metallic/roughness, emissive, velocity, depth).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.compression import decompress_normal
from .camera import generate_rays
from .pathtracer import _sample_atlas


class GBuffer(NamedTuple):
    albedo: jnp.ndarray  # (H,W,3)
    normal: jnp.ndarray  # (H,W,3) world-space
    metallic: jnp.ndarray  # (H,W)
    roughness: jnp.ndarray  # (H,W)
    emissive: jnp.ndarray  # (H,W,3)
    depth: jnp.ndarray  # (H,W) ray t (inf = sky)
    position: jnp.ndarray  # (H,W,3) world-space hit points
    velocity: jnp.ndarray  # (H,W,2) screen-space motion (pixels)
    mask: jnp.ndarray  # (H,W) bool hit


def render_gbuffer(trace_fn, scene, mats, cam_params, prev_cam_params,
                   width: int, height: int, jitter=None, mip_bias: float = 0.0,
                   slot_shading=None):
    """One G-buffer pass. trace_fn(o, d, t_max) -> Hit; jitter (2,) subpixel
    (TAA Halton jitter, ref: RasterPipeline.cs:266-299); mip_bias: texture
    LOD bias (TAA/TAAU recommend log2(render/display)-0.5,
    ref: TAAResolve.cs:76-80); slot_shading: optional (n_slots, 10)
    per-mesh override rows (scene_db.MeshShading.row order — the G-buffer
    applies the emissive/specular/roughness biases the way the raster
    G-buffer does, ref: GBuffer/fragment.glsl + Surface.glsl:85-96)."""
    r = width * height
    jit = jnp.zeros((2,)) + (jitter if jitter is not None else 0.5)
    o, d = generate_rays(cam_params, width, height, jnp.broadcast_to(jit, (r, 2)))
    hit = trace_fn(o, d, jnp.full((r,), 3.4e38, jnp.float32))

    slot = jnp.maximum(hit.slot, 0)
    mask = hit.slot >= 0
    u, v = hit.u, hit.v
    w_b = 1.0 - u - v
    n0 = decompress_normal(scene.tri_n[slot, 0], jnp)
    n1 = decompress_normal(scene.tri_n[slot, 1], jnp)
    n2 = decompress_normal(scene.tri_n[slot, 2], jnp)
    ns = n0 * w_b[..., None] + n1 * u[..., None] + n2 * v[..., None]
    ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
    gn = scene.tri_gn[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    ns = jnp.where(flip[..., None], -ns, ns)

    uv = (
        scene.tri_uv[slot, 0] * w_b[..., None]
        + scene.tri_uv[slot, 1] * u[..., None]
        + scene.tri_uv[slot, 2] * v[..., None]
    )
    mat_id = scene.tri_mat[slot]
    # ray-cone texture LOD: pixel footprint at the hit distance, converted
    # to texels via the triangle's uv density, trilinear across the mips
    du1 = scene.tri_uv[slot, 1] - scene.tri_uv[slot, 0]
    du2 = scene.tri_uv[slot, 2] - scene.tri_uv[slot, 0]
    uv_area = 0.5 * jnp.abs(du1[..., 0] * du2[..., 1] - du2[..., 0] * du1[..., 1])
    world_area = 0.5 * jnp.linalg.norm(
        jnp.cross(scene.tri_e1[slot], scene.tri_e2[slot]), axis=-1)
    uvd = jnp.sqrt(uv_area / jnp.maximum(world_area, 1e-20))
    cone0 = 2.0 * jnp.linalg.norm(cam_params["up"]) / height
    size_f = float(mats["atlas"].shape[1])
    lod = jnp.log2(jnp.maximum(hit.t * cone0 * uvd * size_f, 1.0)) + mip_bias
    base = mats["base_color"][mat_id][..., :3]
    tex = _sample_atlas(mats["atlas"], mats["base_layer"][mat_id], uv, lod)
    albedo = base * tex[..., :3]
    mr = _sample_atlas(mats["atlas"], mats["mr_layer"][mat_id], uv, lod)
    metallic = mats["metallic"][mat_id] * mr[..., 2]
    roughness = mats["roughness"][mat_id] * mr[..., 1]
    em_tex = _sample_atlas(mats["atlas"], mats["emissive_layer"][mat_id], uv, lod)
    emissive = mats["emissive"][mat_id] * em_tex[..., :3]
    if slot_shading is not None:
        sh = jnp.asarray(slot_shading)[slot]  # (R,10)
        emissive = emissive + sh[:, 0:1] * albedo
        metallic = jnp.clip(metallic + sh[:, 2], 0.0, 1.0)
        roughness = jnp.clip(roughness + sh[:, 3], 0.0, 1.0)

    pos = o + d * jnp.minimum(hit.t, 1e8)[..., None]

    # velocity: reproject hit into the previous camera (static scene motion
    # comes entirely from the camera; per-object motion needs prev transforms)
    vel = _reproject_velocity(pos, cam_params, prev_cam_params, width, height)

    def img(a, ch=None):
        return a.reshape((height, width) + ((ch,) if ch else ()))

    shape3 = lambda a: a.reshape(height, width, 3)
    return GBuffer(
        albedo=shape3(jnp.where(mask[..., None], albedo, 0.0)),
        normal=shape3(jnp.where(mask[..., None], ns, 0.0)),
        metallic=img(jnp.where(mask, metallic, 0.0)),
        roughness=img(jnp.where(mask, roughness, 1.0)),
        emissive=shape3(jnp.where(mask[..., None], emissive, 0.0)),
        depth=img(jnp.where(mask, hit.t, jnp.inf)),
        position=shape3(pos),
        velocity=vel.reshape(height, width, 2),
        mask=img(mask),
    )


def _screen_xy(p, cam, width, height):
    """Project world point into pixel coords for a camera param dict."""
    rel = p - cam["origin"]
    f = cam["forward"]
    r_ax = cam["right"]
    u_ax = cam["up"]
    z = jnp.sum(rel * f, axis=-1)
    # right/up carry tan(fov)*aspect scaling already
    x_ndc = jnp.sum(rel * r_ax, axis=-1) / jnp.maximum(
        jnp.sum(r_ax * r_ax, axis=-1), 1e-12
    )
    y_ndc = jnp.sum(rel * u_ax, axis=-1) / jnp.maximum(
        jnp.sum(u_ax * u_ax, axis=-1), 1e-12
    )
    x_ndc = x_ndc / jnp.maximum(z, 1e-6)
    y_ndc = y_ndc / jnp.maximum(z, 1e-6)
    px = (x_ndc * 0.5 + 0.5) * width
    py = (0.5 - y_ndc * 0.5) * height
    return px, py


def _reproject_velocity(pos, cam, prev_cam, width, height):
    """Per-pixel motion vector = prev screen pos − current screen pos
    (ref: GBuffer velocity from prev positions)."""
    cx, cy = _screen_xy(pos, cam, width, height)
    px, py = _screen_xy(pos, prev_cam, width, height)
    return jnp.stack([px - cx, py - cy], axis=-1)
