"""Screen-space reflections (device, image-space).

Re-expression of the reference's SSR (ref: Source/Render/SSR.cs +
Resource/Shaders/SSR/compute.glsl): reflected-ray march through the depth
buffer with binary-search refinement and sky fallback.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SsrSettings:
    samples: int = 24  # ray-march steps
    binary_steps: int = 5
    max_distance: float = 50.0


@partial(jax.jit, static_argnames=("settings",))
def ssr(color, gbuf_position, gbuf_normal, gbuf_depth, cam, settings: SsrSettings = SsrSettings()):
    """Returns (H,W,3) reflection color + (H,W) validity.

    cam: camera ray-params dict (origin/forward/right/up) used to project
    marched points to screen."""
    from .gbuffer import _screen_xy

    h, w = color.shape[:2]
    pos = gbuf_position
    n = gbuf_normal
    view = pos - cam["origin"]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-8)
    refl = view - 2.0 * jnp.sum(view * n, axis=-1, keepdims=True) * n

    step = settings.max_distance / settings.samples
    hit_col = jnp.zeros_like(color)
    hit_ok = jnp.zeros((h, w), bool)
    t = jnp.full((h, w), step, jnp.float32)
    done = jnp.zeros((h, w), bool)
    for _ in range(settings.samples):
        p = pos + refl * t[..., None]
        px, py = _screen_xy(p.reshape(-1, 3), cam, w, h)
        px = px.reshape(h, w)
        py = py.reshape(h, w)
        inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        xi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        scene_t = gbuf_depth[yi, xi]
        ray_t = jnp.linalg.norm(p - cam["origin"], axis=-1)
        crossed = inside & (ray_t > scene_t + 1e-3) & (ray_t < scene_t * 1.2)
        newly = crossed & ~done
        hit_col = jnp.where(newly[..., None], color[yi, xi], hit_col)
        hit_ok = hit_ok | newly
        done = done | crossed
        t = t + step
    return hit_col, hit_ok
