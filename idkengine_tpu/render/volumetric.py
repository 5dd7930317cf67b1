"""Volumetric lighting: ray-marched per-light scattering + depth-aware upscale.

Re-expression of the reference's volumetric light pass
(ref: Source/Render/VolumetricLighting.cs + Resource/Shaders/
VolumetricLight/{compute,Upscale/compute}.glsl): march the view ray,
accumulate Henyey–Greenstein-phased in-scattering with absorbance, at a
reduced resolution, then depth-aware upsample.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VolumetricSettings:
    samples: int = 16
    scattering: float = 0.03
    absorbance: float = 0.02
    phase_g: float = 0.3  # HG anisotropy
    downscale: int = 2


def _hg_phase(cos_t, g):
    return (1.0 - g * g) / jnp.maximum(
        4.0 * jnp.pi * jnp.power(1.0 + g * g - 2.0 * g * cos_t, 1.5), 1e-6
    )


@partial(jax.jit, static_argnames=("settings", "n_lights_arr", "occlusion_fn"))
def volumetric_light(gbuf_position, gbuf_depth, cam_origin, lights_pos,
                     lights_radiance, n_lights_arr,
                     occlusion_fn=None,
                     settings: VolumetricSettings = VolumetricSettings()):
    """(H,W,3) in-scattered light along each view ray.

    occlusion_fn(o, d, t_max) -> bool occluded: a shadow trace evaluated at
    EVERY march sample toward each light (ref: VolumetricLight/compute.glsl
    :79 tests the shadow map per step — blockers carve visible shaft
    boundaries out of the god rays). None = unshadowed.
    n_lights_arr: static int count."""
    h, w = gbuf_position.shape[:2]
    s = settings
    ds = s.downscale
    pos = gbuf_position[::ds, ::ds]
    depth = jnp.minimum(gbuf_depth[::ds, ::ds], 200.0)
    hh, ww = pos.shape[:2]

    view = pos - cam_origin
    dist = jnp.maximum(jnp.linalg.norm(view, axis=-1), 1e-6)
    vdir = view / dist[..., None]

    out = jnp.zeros((hh, ww, 3), jnp.float32)
    seg = depth / s.samples
    trans = jnp.ones((hh, ww, 1), jnp.float32)
    for i in range(s.samples):
        p = cam_origin + vdir * ((i + 0.5) * seg)[..., None]
        for li in range(n_lights_arr):
            to_l = lights_pos[li] - p
            d2 = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-4)
            ldir = to_l / jnp.sqrt(d2)[..., None]
            vis = 1.0
            if occlusion_fn is not None:
                occ = occlusion_fn(
                    p.reshape(-1, 3), ldir.reshape(-1, 3),
                    jnp.sqrt(d2).reshape(-1) - 1e-3)
                vis = 1.0 - occ.reshape(hh, ww).astype(jnp.float32)
            cos_t = jnp.sum(vdir * ldir, axis=-1)
            phase = _hg_phase(cos_t, s.phase_g)
            contrib = lights_radiance[li] * (
                phase * s.scattering * vis / d2)[..., None]
            out = out + trans * contrib * seg[..., None]
        trans = trans * jnp.exp(-(s.absorbance + s.scattering) * seg)[..., None]

    return depth_aware_upsample(out, depth, jnp.minimum(gbuf_depth, 200.0),
                                ds)[:h, :w]


def depth_aware_upsample(low, low_depth, full_depth, ds: int):
    """Joint-bilateral upsample (ref: VolumetricLight/Upscale/compute.glsl):
    each full-res pixel blends the 4 surrounding low-res taps with bilinear
    weights scaled by depth similarity, so god rays don't bleed across
    silhouettes; falls back to plain bilinear where all taps mismatch."""
    hh, ww = low.shape[:2]
    h, w = full_depth.shape[:2]
    yy = (jnp.arange(h, dtype=jnp.float32)) / ds - 0.0
    xx = (jnp.arange(w, dtype=jnp.float32)) / ds - 0.0
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, hh - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, ww - 1)
    y1 = jnp.minimum(y0 + 1, hh - 1)
    x1 = jnp.minimum(x0 + 1, ww - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]
    wb = [((1 - fy) * (1 - fx)), ((1 - fy) * fx), (fy * (1 - fx)), (fy * fx)]
    taps = [(y0, x0), (y0, x1), (y1, x0), (y1, x1)]
    num = jnp.zeros((h, w, low.shape[2]), low.dtype)
    den = jnp.zeros((h, w), low.dtype)
    num_b = jnp.zeros_like(num)
    den_b = jnp.zeros_like(den)
    for (ty, tx), bw in zip(taps, wb):
        d_lr = low_depth[ty][:, tx]
        sim = jnp.exp(-jnp.abs(d_lr - full_depth)
                      / jnp.maximum(0.05 * full_depth, 1e-3))
        wgt = bw * sim
        c = low[ty][:, tx]
        num = num + c * wgt[..., None]
        den = den + wgt
        num_b = num_b + c * bw[..., None]
        den_b = den_b + bw
    bilateral = num / jnp.maximum(den[..., None], 1e-6)
    bilinear = num_b / jnp.maximum(den_b[..., None], 1e-6)
    return jnp.where((den > 1e-3)[..., None], bilateral, bilinear)
