"""Environment-map importance sampling via alias tables.

Role: NEE toward bright HDR environment texels (sun disks in equirect
skies). The reference only evaluates its skybox on ray miss
(ref: Resource/Shaders/PathTracing/FinalDraw & missed-ray sky lookup in
BVHIntersect consumers) — pure BSDF sampling never converges on a
small bright sun, so this is a deliberate extension, exposed as
PathTracerSettings.env_nee.

TPU design notes:
  - Inverse-CDF sampling needs searchsorted, which lowers to a SERIAL
    while loop on TPU (measured 127 ms / 1M queries — BENCH_NOTES.md).
    The alias method (Vose 1991) is O(1) per sample: one table row
    pick + one compare + one select — two 1-D gathers at ~26 ns each.
  - The alias table is built host-side (numpy, O(H*W)) once per env
    map; the device side carries three flat arrays (prob, alias, pmf).
  - pdf is returned in solid-angle measure so the estimator is simply
    L * brdf_cos / pdf; texel → direction uses the same equirect
    convention as pathtracer._sky (x: phi, y: theta).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_alias(weights: np.ndarray):
    """Vose alias-table construction. weights (N,) >= 0, not all zero.
    Returns (prob (N,) f32, alias (N,) i32, pmf (N,) f32)."""
    w = np.asarray(weights, np.float64).ravel()
    n = w.size
    total = w.sum()
    if not np.isfinite(total) or total <= 0.0:
        w = np.ones_like(w)
        total = float(n)
    pmf = w / total
    scaled = pmf * n
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    # leftovers are exactly 1 up to float error
    return prob.astype(np.float32), alias, pmf.astype(np.float32)


class EnvSampler:
    """Per-texel alias sampler over an equirect (H,W,3) radiance map."""

    def __init__(self, env_map: np.ndarray):
        env = np.asarray(env_map, np.float32)
        h, w = env.shape[0], env.shape[1]
        lum = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
               + 0.0722 * env[..., 2])
        # texel solid angle shrinks with sin(theta): weight it in so the
        # pmf is proportional to texel POWER, and pdf converts back
        theta_c = (np.arange(h, dtype=np.float64) + 0.5) / h * np.pi
        sin_t = np.maximum(np.sin(theta_c), 1e-6)[:, None]
        prob, alias, pmf = build_alias(np.maximum(lum, 0.0) * sin_t)
        self.h, self.w = h, w
        # shape rides along as a 0-d static-friendly pair: stored as plain
        # ints in an aux tuple OUTSIDE the jit-traced dict would force
        # plumbing; as leaves they trace to scalars, which all consumers
        # handle (index math only)
        self.tables = {
            "prob": jnp.asarray(prob),
            "alias": jnp.asarray(alias),
            "pmf": jnp.asarray(pmf),
            "shape": (h, w),
        }


def sample(tables, u_bin, u_accept, u_jitter):
    """Draw directions from the alias table.

    u_bin/u_accept: (N,) uniforms; u_jitter: (N,2) in-texel jitter.
    Returns (dir (N,3), pdf (N,) solid-angle measure)."""
    h, w = tables["shape"]
    n = h * w
    i0 = jnp.minimum((u_bin * n).astype(jnp.int32), n - 1)
    take_alias = u_accept >= tables["prob"][i0]
    pix = jnp.where(take_alias, tables["alias"][i0], i0)
    y = pix // w
    x = pix - y * w
    theta = (y.astype(jnp.float32) + u_jitter[:, 0]) / h * jnp.pi
    phi = ((x.astype(jnp.float32) + u_jitter[:, 1]) / w - 0.5) * (2 * jnp.pi)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta),
                   sin_t * jnp.sin(phi)], -1)
    # pdf(omega) = pmf / texel_solid_angle, dOmega = (2pi/W)(pi/H) sin(theta)
    d_omega = (2.0 * jnp.pi / w) * (jnp.pi / h) * jnp.maximum(sin_t, 1e-6)
    pdf = tables["pmf"][pix] / d_omega
    return d, pdf


def pdf(tables, d):
    """Solid-angle pdf of sampling direction(s) d (N,3) from the table
    (for MIS against BSDF sampling)."""
    h, w = tables["shape"]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    x = jnp.clip(((phi / (2 * jnp.pi) + 0.5) * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((theta / jnp.pi * h).astype(jnp.int32), 0, h - 1)
    pix = y * w + x
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    d_omega = (2.0 * jnp.pi / w) * (jnp.pi / h) * sin_t
    return tables["pmf"][pix] / d_omega
