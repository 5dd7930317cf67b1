"""Path-tracing denoiser: SVGF-style edge-avoiding à-trous filter on device.

Fills the role of the reference's OIDN bridge (ref: Source/OIDN/OIDN.cs +
PathTracerPipeline.cs:165-278 — download beauty/albedo/normal AOVs, run the
native CPU denoiser, re-upload). TPU re-design: an SVGF-style à-trous
wavelet filter runs ON DEVICE from the same AOVs, so the frame never leaves
HBM (the "on-device denoise pass" from BASELINE.json's north star).

Design notes (round-4 quality gate — the round-3 filter failed to beat the
noisy input at 8 spp, RMSE ratio 1.02 vs the 512-spp converged render):
 - edge-CLAMPED taps (the old jnp.roll wrapped the image torus-style, so
   the ceiling light smeared into the floor rows);
 - demodulation is skipped where albedo is tiny (emissive / no-hit pixels
   previously divided by 1e-3, and the resulting 6000x irradiance spikes
   bled over their neighbourhoods when re-modulated);
 - the colour weight uses LUMINANCE normalised by the per-pixel variance of
   the sample mean (SVGF eq. 3) when the tracer provides it, so smoothing
   is strong exactly where the estimator is noisy and vanishes where it has
   converged; variance is propagated through each iteration by
   var' = sum(w^2 var) / (sum w)^2.
With these, 8-spp Cornell output reaches RMSE ratio ~0.5 vs noisy input
(tests/test_render.py::test_denoiser_quality_gate states the exact bar).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

_LUMA = (0.2126, 0.7152, 0.0722)


@dataclass(frozen=True)
class DenoiseSettings:
    iterations: int = 3
    sigma_color: float = 2.0    # in sqrt(variance) units when variance given
    sigma_normal: float = 0.25
    sigma_depth: float = 0.6
    sigma_albedo: float = 0.25  # albedo guide (OIDN's albedo input role):
                                # protects emitter/material edges that share
                                # normal+depth with their surroundings
    # fixed-sigma fallback for callers without a variance estimate
    sigma_color_novar: float = 0.3
    albedo_floor: float = 0.05  # below this, a pixel is not demodulated
    # Firefly suppression before filtering: clamp a pixel's irradiance
    # luminance to `firefly_clamp` x the mean of its 8 neighbours (0 = off).
    # Measured neutral on the atrium gate (no fireflies at 8 spp there)
    # but kept as cheap insurance for specular-heavy content.
    firefly_clamp: float = 8.0
    # Variance-confidence blend (0 = off): the final output is
    # lerp(noisy, filtered, rv/(rv+k)) with rv the RELATIVE variance
    # var/lum^2. Round-5 gate diagnosis: the linear-RMSE regression (1.15x
    # at 8 spp, 256^2 atrium) lives entirely in the brightest decile —
    # direct-lit/emissive/sky pixels are near-converged at 8 spp (NEE makes
    # direct light low-variance), so ANY filter bias there exceeds the
    # residual noise. Keeping the unbiased estimate where relative variance
    # is tiny and the filter where it is large optimizes exactly the
    # bias-variance tradeoff the RMSE gate scores (SVGF's temporal
    # confidence plays this role in the original).
    variance_blend: float = 4e-3


_KERNEL = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]  # B3 spline


def _shift(a, dy, dx):
    """Edge-clamped 2D shift (tap at p + (dy,dx)) for (H,W,...) arrays."""
    h, w = a.shape[0], a.shape[1]
    yi = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xi = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return jnp.take(jnp.take(a, yi, axis=0), xi, axis=1)


def _luminance(c):
    return (c[..., 0] * _LUMA[0] + c[..., 1] * _LUMA[1]
            + c[..., 2] * _LUMA[2])


@partial(jax.jit, static_argnames=("settings",))
def atrous_denoise(color, albedo, normal, depth,
                   settings: DenoiseSettings = DenoiseSettings(),
                   variance=None):
    """Edge-avoiding à-trous wavelet denoise.

    color: (H,W,3) noisy radiance; albedo/normal: (H,W,3) AOVs; depth (H,W);
    variance: optional (H,W) per-pixel variance of the accumulated MEAN
    luminance (PathTracer.variance()). Demodulates albedo first (denoises
    irradiance) and re-modulates at the end, matching OIDN's cleanAux usage
    in the reference."""
    s = settings
    # Demodulation factor: 1 where albedo is tiny (emissive surfaces and
    # misses have no meaningful albedo and blow up under division).
    amax = jnp.max(albedo, axis=-1, keepdims=True)
    demod = jnp.where(amax > s.albedo_floor, jnp.maximum(albedo, 1e-3), 1.0)
    irr = color / demod
    d_norm = depth / jnp.maximum(
        jnp.nanmax(jnp.where(jnp.isfinite(depth), depth, 0.0)), 1e-3)
    d_norm = jnp.where(jnp.isfinite(depth), d_norm, 1.0)

    if s.firefly_clamp > 0.0:
        lum0 = _luminance(irr)
        nsum = jnp.zeros_like(lum0)
        for gy in (-1, 0, 1):
            for gx in (-1, 0, 1):
                if gy == 0 and gx == 0:
                    continue
                nsum = nsum + _shift(lum0, gy, gx)
        bound = s.firefly_clamp * nsum / 8.0 + 1e-4
        scale = jnp.minimum(1.0, bound / jnp.maximum(lum0, 1e-12))
        irr = irr * scale[..., None]

    out = irr
    var = variance
    if var is not None:
        # variance() is measured on MODULATED radiance; the filter runs on
        # demodulated irradiance, so rescale by the demodulation factor
        # (luminance): Var[l/f] = Var[l] / f^2.
        f = _luminance(demod * jnp.ones_like(irr))
        var = var / jnp.maximum(f * f, 1e-6)
    for it in range(s.iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), jnp.float32)
        v_acc = jnp.zeros(out.shape[:2], jnp.float32) if var is not None else None
        w2sum = jnp.zeros(out.shape[:2], jnp.float32) if var is not None else None
        lum = _luminance(out)
        if var is not None:
            # 3x3 Gaussian-blurred variance drives the luminance sigma
            # (SVGF eq. 3): strong smoothing where the estimate is noisy.
            gvar = jnp.zeros_like(var)
            for gy in (-1, 0, 1):
                for gx in (-1, 0, 1):
                    gw = (2.0 if gy == 0 else 1.0) * (2.0 if gx == 0 else 1.0)
                    gvar = gvar + gw * _shift(var, gy, gx)
            gvar = gvar / 16.0
            sigma_l = s.sigma_color * jnp.sqrt(jnp.maximum(gvar, 0.0)) + 1e-6
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                kw = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                c_n = _shift(out, dy * step, dx * step)
                n_n = _shift(normal, dy * step, dx * step)
                d_n = _shift(d_norm, dy * step, dx * step)
                if var is not None:
                    l_n = _shift(lum, dy * step, dx * step)
                    w_c = jnp.exp(-jnp.abs(l_n - lum) / sigma_l)[..., None]
                else:
                    w_c = jnp.exp(
                        -jnp.sum((c_n - out) ** 2, axis=-1, keepdims=True)
                        / (s.sigma_color_novar**2))
                w_n = jnp.exp(
                    -jnp.maximum(
                        1.0 - jnp.sum(n_n * normal, axis=-1, keepdims=True), 0.0
                    )
                    / (s.sigma_normal**2)
                )
                w_d = jnp.exp(-jnp.abs(d_n - d_norm)[..., None] / s.sigma_depth)
                a_n = _shift(albedo, dy * step, dx * step)
                w_a = jnp.exp(
                    -jnp.sum((a_n - albedo) ** 2, axis=-1, keepdims=True)
                    / (s.sigma_albedo**2))
                wgt = kw * w_c * w_n * w_d * w_a
                acc = acc + c_n * wgt
                wsum = wsum + wgt
                if var is not None:
                    v_n = _shift(var, dy * step, dx * step)
                    v_acc = v_acc + (wgt[..., 0] ** 2) * v_n
                    w2sum = w2sum + wgt[..., 0]
        out = acc / jnp.maximum(wsum, 1e-8)
        if var is not None:
            var = v_acc / jnp.maximum(w2sum, 1e-8) ** 2
    result = out * demod
    if variance is not None and s.variance_blend > 0.0:
        lum_c = _luminance(color)
        rv = variance / jnp.maximum(lum_c * lum_c, 1e-8)
        w_f = (rv / (rv + s.variance_blend))[..., None]
        result = color + (result - color) * w_f
    return result
