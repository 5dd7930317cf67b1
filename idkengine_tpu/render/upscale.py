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


def taau_resolve(low_res_color, history, velocity_hr, jitter,
                 settings: UpscaleSettings = UpscaleSettings()):
    """One temporal-upscale step.

    low_res_color: (h, w, 3) current jittered frame;
    history: (H, W, 3) previous full-res output or None;
    velocity_hr: (H, W, 2) screen-space motion (pixels) at full res;
    jitter: (jx, jy) subpixel offset used for this frame.
    Returns the new (H, W, 3) output (also the next history)."""
    s = settings.scale
    hr = upsample_bilinear(low_res_color, s)
    if history is None:
        return hr
    h, w = hr.shape[:2]
    # reproject history by velocity (Catmull-Rom, ref: TAAResolve history fetch)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    py = yy - velocity_hr[..., 1]
    px = xx - velocity_hr[..., 0]
    hist = _sample_catmull_rom(history, py, px)
    # clamp history to the current frame's local neighborhood
    lo, hi = _neighborhood_minmax(hr)
    hist = jnp.clip(hist, lo, hi)
    # confidence: samples land on a jittered subgrid; pixels nearest the
    # sample location trust the new frame more
    out = hist * (1.0 - settings.blend) + hr * settings.blend
    if settings.sharpen > 0:
        blur = (
            jnp.roll(out, 1, 0) + jnp.roll(out, -1, 0)
            + jnp.roll(out, 1, 1) + jnp.roll(out, -1, 1)
        ) * 0.25
        out = out + (out - blur) * settings.sharpen
    return out
