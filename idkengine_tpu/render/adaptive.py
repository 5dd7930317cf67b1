"""Adaptive sampling-rate classifier — the variable-rate-shading slot.

Role of the reference's LightingShadingRateClassifier (ref:
Source/Render/LightingShadingRateClassifier.cs + Resource/Shaders/
ShadingRateClassification/*.glsl — 16x16 tiles scored by mean speed and
luminance coefficient-of-variation via subgroup reductions, emitted as an
NV_shading_rate_image). TPUs have no shading-rate hardware; the same
classifier instead drives the PATH TRACER's per-tile sample count: noisy
or fast-moving tiles get more (or fewer, for motion) samples next frame.
Pure reduce_window ops — the subgroup reduction re-expressed for XLA.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

TILE = 16  # ref: 16x16 shading-rate tiles


@dataclass(frozen=True)
class ClassifierSettings:
    speed_factor: float = 0.2  # ref: GpuSettings SpeedFactor
    lum_variance_factor: float = 0.025  # ref: LumVarianceFactor
    min_rate: float = 0.25
    max_rate: float = 4.0


def _tile_reduce(x, fn, init):
    h, w = x.shape[:2]
    return jax.lax.reduce_window(
        x, init, fn, (TILE, TILE) + (1,) * (x.ndim - 2),
        (TILE, TILE) + (1,) * (x.ndim - 2), "VALID",
    )


def classify(color, velocity, settings: ClassifierSettings = ClassifierSettings()):
    """(H,W,3) color + (H,W,2) velocity -> per-tile sampling rate
    (H/16, W/16) in [min_rate, max_rate].

    rate ~ luminance coefficient-of-variation (noise -> more samples) and
    ~ 1/speed (fast motion is masked by blur -> fewer samples), mirroring
    the reference's debug-documented heuristics (Readme.md:939-1090)."""
    lum = (
        0.2126 * color[..., 0] + 0.7152 * color[..., 1] + 0.0722 * color[..., 2]
    )[..., None]
    n = TILE * TILE
    s1 = _tile_reduce(lum, jnp.add, 0.0)[..., 0] / n
    s2 = _tile_reduce(lum * lum, jnp.add, 0.0)[..., 0] / n
    var = jnp.maximum(s2 - s1 * s1, 0.0)
    coeff_var = jnp.sqrt(var) / jnp.maximum(s1, 1e-4)

    speed = jnp.linalg.norm(velocity, axis=-1, keepdims=True)
    mean_speed = _tile_reduce(speed, jnp.add, 0.0)[..., 0] / n

    rate = 1.0 + coeff_var / jnp.maximum(settings.lum_variance_factor, 1e-6) * 0.5
    rate = rate / (1.0 + mean_speed * settings.speed_factor)
    return jnp.clip(rate, settings.min_rate, settings.max_rate)


def sample_budget(rate, spp_base: int = 1):
    """Per-tile integer sample counts from the rate map (total preserved
    within rounding)."""
    return jnp.maximum(jnp.round(rate * spp_base), 1.0).astype(jnp.int32)
