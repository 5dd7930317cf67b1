"""Device-side sampling routines (jnp, batched).

Re-expression of the reference's GLSL sampling library
(ref: Resource/Shaders/include/Sampling.glsl): cosine hemisphere,
uniform sphere, sphere-light solid-angle sampling, ONB construction.
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def build_onb(n):
    """Orthonormal basis from unit normal (...,3) → (t, b). Frisvad/Duff method."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def cosine_hemisphere(n, u):
    """Cosine-weighted hemisphere around n. u: (...,2) in [0,1)."""
    t, b = build_onb(n)
    phi = TWO_PI * u[..., 0]
    r = jnp.sqrt(u[..., 1])
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 1], 0.0))
    return t * x[..., None] + b * y[..., None] + n * z[..., None]


def uniform_sphere(u):
    """Uniform direction on the unit sphere. u: (...,2)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sphere_light_sample(p, center, radius, u):
    """Solid-angle sampling of a sphere light from shading point p
    (ref: Sampling.glsl sphere-light sampling). Returns (dir, pdf_solid_angle,
    dist_to_center)."""
    to_c = center - p
    dist2 = jnp.sum(to_c * to_c, axis=-1)
    dist = jnp.sqrt(dist2)
    # cone half-angle
    sin_max2 = jnp.clip(radius * radius / jnp.maximum(dist2, 1e-12), 0.0, 0.9999)
    cos_max = jnp.sqrt(1.0 - sin_max2)
    # sample direction in cone
    cos_t = 1.0 - u[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u[..., 1]
    w = to_c / jnp.maximum(dist, 1e-12)[..., None]
    t, b = build_onb(w)
    d = (
        t * (sin_t * jnp.cos(phi))[..., None]
        + b * (sin_t * jnp.sin(phi))[..., None]
        + w * cos_t[..., None]
    )
    pdf = 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_max, 1e-8))
    return d, pdf, dist


def reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(d, n, eta):
    """Snell refraction; returns (dir, total_internal_reflection_mask)."""
    cos_i = -jnp.sum(d * n, axis=-1)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refr = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    return jnp.where(tir[..., None], reflect(d, n), refr), tir
