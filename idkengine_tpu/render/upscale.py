"""Temporal upscaler (TAAU) — the FSR2 slot.

Role of the reference's FSR2 integration (ref: Source/Render/FSR2Wrapper.cs
:37-71 — dispatch from color/depth/velocity + jitter + camera params;
RasterPipeline.cs:611-624). FSR2 itself is a vendored AMD binary; the
TPU-native equivalent is a temporal-upsampling resolve: render at a reduced
resolution with a Halton jitter sequence, then scatter each low-res sample
into a full-resolution history with Catmull-Rom resampling, neighborhood
clamping (same machinery as taa.py) and per-pixel blend driven by sample
confidence. Pure JAX image ops — stays on device.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..utils import mathutil as mu
from .taa import _neighborhood_minmax, _sample_catmull_rom


@dataclass(frozen=True)
class UpscaleSettings:
    scale: int = 2  # render at (H/scale, W/scale), output (H, W)
    blend: float = 0.1  # history feedback (like TAA alpha)
    sharpen: float = 0.25  # RCAS-style post sharpen (ref: FSR2 sharpening)


def halton_jitter(frame: int) -> tuple[float, float]:
    """(2,3) Halton subpixel jitter, the same sequence the reference feeds
    FSR2 (ref: RasterPipeline TAA jitter + FSR2Wrapper jitter params)."""
    return mu.halton(frame % 16 + 1, 2) - 0.5, mu.halton(frame % 16 + 1, 3) - 0.5


def upsample_bilinear(img, scale: int):
    h, w = img.shape[:2]
    yy = (jnp.arange(h * scale) + 0.5) / scale - 0.5
    xx = (jnp.arange(w * scale) + 0.5) / scale - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yy - y0)[:, None, None]
    fx = (xx - x0)[None, :, None]
    c00 = img[y0][:, x0]
    c01 = img[y0][:, x1]
    c10 = img[y1][:, x0]
    c11 = img[y1][:, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def upsample_jittered(img, scale: int, jx: float, jy: float):
    """Jitter-aware upsample: low-res sample (i,j) was rendered at the
    high-res position ((i+0.5+jy)*scale-0.5, (j+0.5+jx)*scale-0.5); sample
    the low-res grid at the correspondingly shifted coordinates and return
    (hr_color, confidence) where confidence peaks at pixels landing ON a
    jittered sample (the core of FSR2-style temporal upscaling — each frame
    contributes exact information at different subpixel sites)."""
    h, w = img.shape[:2]
    yy = (jnp.arange(h * scale, dtype=jnp.float32) + 0.5) / scale - 0.5 - jy
    xx = (jnp.arange(w * scale, dtype=jnp.float32) + 0.5) / scale - 0.5 - jx
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :, None]
    c = (img[y0][:, x0] * (1 - fy) * (1 - fx)
         + img[y0][:, x1] * (1 - fy) * fx
         + img[y1][:, x0] * fy * (1 - fx)
         + img[y1][:, x1] * fy * fx)
    # distance (in hr pixels) to the nearest low-res sample site
    dny = (jnp.minimum(jnp.abs(yy - jnp.round(yy)), 1.0) * scale)[:, None]
    dnx = (jnp.minimum(jnp.abs(xx - jnp.round(xx)), 1.0) * scale)[None, :]
    conf = jnp.exp(-6.0 * (dny * dny + dnx * dnx))
    return c, conf


def taau_resolve(low_res_color, history, velocity_hr, jitter,
                 settings: UpscaleSettings = UpscaleSettings()):
    """One temporal-upscale step.

    low_res_color: (h, w, 3) current jittered frame;
    history: (H, W, 4) previous [rgb, accumulated weight] or None;
    velocity_hr: (H, W, 2) screen-space motion (pixels) at full res;
    jitter: (jx, jy) subpixel offset used for this frame.
    Returns the new (H, W, 4) history; the image is history[..., :3].

    FSR2-style reconstruction: each frame's samples land at their TRUE
    subpixel sites; pixels accumulate a confidence-WEIGHTED average (not an
    exponential blend — exponential blending can never out-resolve the
    reconstruction filter, weighted averaging converges to the on-sample
    values). Motion decays the accumulated weight and enables the
    neighborhood clamp (the 'lock'/'reactive' role)."""
    s = settings.scale
    jx, jy = jitter
    hr, conf = upsample_jittered(low_res_color, s, float(jx), float(jy))
    if history is None:
        return jnp.concatenate([hr, conf[..., None]], axis=-1)
    h, w = hr.shape[:2]
    # reproject history by velocity (Catmull-Rom, ref: TAAResolve history fetch)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    py = yy - velocity_hr[..., 1]
    px = xx - velocity_hr[..., 0]
    hist4 = _sample_catmull_rom(history, py, px)
    hist = hist4[..., :3]
    wgt = jnp.maximum(hist4[..., 3], 0.0)
    speed = jnp.linalg.norm(velocity_hr, axis=-1)
    # motion decays accumulated confidence and engages the clamp; static
    # pixels keep their converged weighted average untouched
    wgt = wgt * jnp.exp(-speed)
    k = jnp.clip(speed / 2.0, 0.0, 1.0)[..., None]
    lo, hi = _neighborhood_minmax(hr)
    pad = (1.0 - conf[..., None]) * 0.15
    hist = hist * (1.0 - k) + jnp.clip(hist, lo - pad, hi + pad) * k
    w_new = jnp.minimum(wgt + conf, 16.0 / max(settings.blend, 1e-3) * 0.25)
    out = (hist * wgt[..., None] + hr * conf[..., None]) \
        / jnp.maximum((wgt + conf)[..., None], 1e-6)
    if settings.sharpen > 0:
        blur = (
            jnp.roll(out, 1, 0) + jnp.roll(out, -1, 0)
            + jnp.roll(out, 1, 1) + jnp.roll(out, -1, 1)
        ) * 0.25
        out = out + (out - blur) * settings.sharpen
    return jnp.concatenate([out, w_new[..., None]], axis=-1)
