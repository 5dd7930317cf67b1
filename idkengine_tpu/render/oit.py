"""Order-independent transparency via depth peeling.

TPU re-design of the reference's "accurate OIT" (ref:
Resource/Shaders/RecordTransparent/fragment.glsl — per-pixel record of up to
TRANSPARENT_LAYERS color+depth layers; ResolveTransparent/compute.glsl —
sort & composite; RasterPipeline.cs:518-588,686-705). There is no raster
record pass on TPU, so the K closest transparent surfaces per pixel are
found by DEPTH PEELING: K successive closest-hit traces, each restarting
just past the previous layer. Layers arrive depth-ORDERED by construction,
so the resolve is a simple front-to-back alpha composite — no per-pixel
sort needed (the reference sorts because its record order is arbitrary).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

TRANSPARENT_LAYERS = 10  # ref: AppInsert TRANSPARENT_LAYERS default


@dataclass(frozen=True)
class OitSettings:
    layers: int = 4  # K peels (10 matches the reference but 4 is plenty)
    alpha_min: float = 1e-3  # stop peeling when accumulated alpha ~ 1


def peel_layers(trace_fn, shade_fn, o, d, t_far, layers: int = 4):
    """Depth-peel up to `layers` transparent surfaces along rays (o, d).

    trace_fn(o, d, t_min, t_max) -> (t, valid, *aux) of the next hit past
    t_min (aux, e.g. triangle slot/u/v, is forwarded to the shader);
    shade_fn(t, valid, *aux) -> (rgb, alpha) or (rgb, alpha, stop) for that
    layer — `stop` marks rays whose peel ends here WITHOUT compositing
    (e.g. an opaque hit already shaded by the opaque pass).
    Returns (color (R,3), alpha (R,)) composited front-to-back."""
    r = o.shape[0]
    color = jnp.zeros((r, 3), jnp.float32)
    trans = jnp.ones((r,), jnp.float32)  # remaining transmittance
    t_min = jnp.zeros((r,), jnp.float32)
    stopped = jnp.zeros((r,), bool)
    for _ in range(layers):
        t, valid, *aux = trace_fn(o, d, t_min, t_far)
        valid = valid & ~stopped
        shaded = shade_fn(t, valid, *aux)
        rgb, a = shaded[:2]
        stop = shaded[2] if len(shaded) > 2 else jnp.zeros((r,), bool)
        take = valid & ~stop
        w = trans * a * take.astype(jnp.float32)
        color = color + rgb * w[..., None]
        trans = jnp.where(take, trans * (1.0 - a), trans)
        t_min = jnp.where(take, t_min + t + 1e-4, t_min)
        stopped = stopped | (valid & stop)
    return color, 1.0 - trans


def composite_over(transparent_rgb, transparent_alpha, opaque_rgb):
    """Resolve pass: transparent layers over the opaque shading result
    (ref: ResolveTransparent/compute.glsl final blend)."""
    a = transparent_alpha[..., None]
    return transparent_rgb + opaque_rgb * (1.0 - a)
