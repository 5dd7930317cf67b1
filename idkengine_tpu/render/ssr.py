"""Screen-space reflections (device, image-space).

Re-expression of the reference's SSR (ref: Source/Render/SSR.cs +
Resource/Shaders/SSR/compute.glsl:55-95): reflected-ray march through the
depth buffer, then binary-search refinement of the crossing interval
(compute.glsl:83-95), with a sky fallback on miss (compute.glsl:79-81).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SsrSettings:
    samples: int = 24  # ray-march steps
    binary_steps: int = 5  # refinement bisections of the crossing interval
    max_distance: float = 50.0
    # gradient sky used when the march leaves the screen / finds nothing
    # (the reference samples its skybox cubemap on miss)
    sky_zenith: tuple = (0.25, 0.45, 0.85)
    sky_horizon: tuple = (0.55, 0.65, 0.80)
    sky_strength: float = 1.0


def _sky_gradient(d, s: SsrSettings):
    t = jnp.clip(d[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    zen = jnp.asarray(s.sky_zenith, jnp.float32)
    hor = jnp.asarray(s.sky_horizon, jnp.float32)
    return (hor * (1.0 - t) + zen * t) * s.sky_strength


@partial(jax.jit, static_argnames=("settings", "use_sky"))
def ssr(color, gbuf_position, gbuf_normal, gbuf_depth, cam,
        settings: SsrSettings = SsrSettings(), use_sky: bool = True):
    """Returns (refl_color (H,W,3), hit (H,W) bool, refined_t (H,W)).

    On miss, refl_color falls back to the gradient sky along the reflected
    direction when use_sky (hit stays False so callers can weight
    differently). cam: camera ray-params dict (origin/forward/right/up)
    used to project marched points to screen."""
    from .gbuffer import _screen_xy

    h, w = color.shape[:2]
    pos = gbuf_position
    n = gbuf_normal
    view = pos - cam["origin"]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-8)
    refl = view - 2.0 * jnp.sum(view * n, axis=-1, keepdims=True) * n

    def below_surface(t):
        """At parameter t: (crossed-behind-geometry, on-screen) tests."""
        p = pos + refl * t[..., None]
        px, py = _screen_xy(p.reshape(-1, 3), cam, w, h)
        px = px.reshape(h, w)
        py = py.reshape(h, w)
        inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        xi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        scene_t = gbuf_depth[yi, xi]
        ray_t = jnp.linalg.norm(p - cam["origin"], axis=-1)
        behind = inside & (ray_t > scene_t + 1e-3)
        near = ray_t < scene_t * 1.2  # reject crossings far behind geometry
        return behind, near, xi, yi

    step = settings.max_distance / settings.samples
    hit_ok = jnp.zeros((h, w), bool)
    t_lo = jnp.zeros((h, w), jnp.float32)  # last in-front-of-geometry t
    t_hi = jnp.full((h, w), step, jnp.float32)  # first behind-geometry t
    t = jnp.full((h, w), step, jnp.float32)
    for _ in range(settings.samples):
        behind, near, _xi, _yi = below_surface(t)
        newly = behind & near & ~hit_ok
        t_hi = jnp.where(newly, t, t_hi)
        t_lo = jnp.where(newly, t - step, t_lo)
        hit_ok = hit_ok | newly
        t = t + step

    # binary-search refinement of [t_lo, t_hi] (ref: SSR/compute.glsl:83-95)
    for _ in range(settings.binary_steps):
        tm = 0.5 * (t_lo + t_hi)
        behind, _near, _xi, _yi = below_surface(tm)
        t_hi = jnp.where(behind, tm, t_hi)
        t_lo = jnp.where(behind, t_lo, tm)

    t_ref = 0.5 * (t_lo + t_hi)
    _b, _n, xi, yi = below_surface(jnp.where(hit_ok, t_ref, t_hi))
    hit_col = color[yi, xi]
    if use_sky:
        sky = _sky_gradient(refl, settings)
        hit_col = jnp.where(hit_ok[..., None], hit_col, sky)
    else:
        hit_col = jnp.where(hit_ok[..., None], hit_col, 0.0)
    return hit_col, hit_ok, jnp.where(hit_ok, t_ref, jnp.inf)
