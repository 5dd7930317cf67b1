"""Path-tracing denoiser: edge-avoiding à-trous wavelet filter on device.

Fills the role of the reference's OIDN bridge (ref: Source/OIDN/OIDN.cs +
PathTracerPipeline.cs:165-278 — download beauty/albedo/normal AOVs, run the
native CPU denoiser, re-upload). TPU re-design: an SVGF-style à-trous
wavelet filter runs ON DEVICE from the same AOVs, so the frame never leaves
HBM (the "on-device denoise pass" from BASELINE.json's north star).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DenoiseSettings:
    iterations: int = 4
    sigma_color: float = 0.3
    sigma_normal: float = 0.25
    sigma_depth: float = 0.6


_KERNEL = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]  # B3 spline


@partial(jax.jit, static_argnames=("settings",))
def atrous_denoise(color, albedo, normal, depth,
                   settings: DenoiseSettings = DenoiseSettings()):
    """Edge-avoiding à-trous wavelet denoise.

    color: (H,W,3) noisy radiance; albedo/normal: (H,W,3) AOVs; depth (H,W).
    Demodulates albedo first (denoises irradiance) and re-modulates at the
    end, matching OIDN's cleanAux usage in the reference."""
    s = settings
    alb_safe = jnp.maximum(albedo, 1e-3)
    irr = color / alb_safe
    d_norm = depth / jnp.maximum(jnp.nanmax(jnp.where(jnp.isfinite(depth), depth, 0.0)), 1e-3)
    d_norm = jnp.where(jnp.isfinite(depth), d_norm, 1.0)

    out = irr
    for it in range(s.iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), jnp.float32)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                kw = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                sh = lambda a: jnp.roll(a, (dy * step, dx * step), axis=(0, 1))
                c_n = sh(out)
                n_n = sh(normal)
                d_n = sh(d_norm)
                w_c = jnp.exp(
                    -jnp.sum((c_n - out) ** 2, axis=-1, keepdims=True)
                    / (s.sigma_color**2)
                )
                w_n = jnp.exp(
                    -jnp.maximum(
                        1.0 - jnp.sum(n_n * normal, axis=-1, keepdims=True), 0.0
                    )
                    / (s.sigma_normal**2)
                )
                w_d = jnp.exp(-jnp.abs(d_n - d_norm)[..., None] / s.sigma_depth)
                wgt = kw * w_c * w_n * w_d
                acc = acc + c_n * wgt
                wsum = wsum + wgt
        out = acc / jnp.maximum(wsum, 1e-8)
    return out * alb_safe
