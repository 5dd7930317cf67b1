"""BSDF evaluation and sampling (device, batched).

Re-expression of the reference's shading model
(ref: Resource/Shaders/PathTracing/include/Shading.glsl:50-147 and
include/Pbr.glsl:40-105): three stochastic lobes — diffuse (Lambert),
specular (reflect + roughness-squared perturbation) and transmissive
(refract + Beer–Lambert absorbance) — selected per bounce by Fresnel- and
metallic-reweighted chances, with throughput divided by the lobe chance.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import sampling


class SurfaceSample(NamedTuple):
    direction: jnp.ndarray  # (R,3) next ray dir
    throughput_mul: jnp.ndarray  # (R,3) multiplier for path throughput
    is_transmissive: jnp.ndarray  # (R,) bool — ray continues inside medium
    is_specular: jnp.ndarray  # (R,) bool


def fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - cos_theta, 0.0), 5.0)


def base_fresnel(ior):
    r = (1.0 - ior) / (1.0 + ior)
    return r * r


def sample_bsdf(
    d_in,  # (R,3) incoming ray direction (pointing into surface)
    n,  # (R,3) shading normal (facing against d_in)
    albedo,  # (R,3)
    metallic,  # (R,)
    roughness,  # (R,)
    transmission,  # (R,)
    ior,  # (R,)
    inside,  # (R,) bool — ray currently inside the medium
    u_lobe,  # (R,) lobe-select uniform
    u_dir,  # (R,2) direction uniforms
    trans_tint=None,  # (R,3) transmission lobe tint, or None for white
) -> SurfaceSample:
    """Stochastic single-lobe BSDF sample (ref: Shading.glsl BSDF select).

    trans_tint carries the KHR_materials_transmission albedo tint (ref:
    Shading.glsl:136-144 — Bsdf = Albedo when the surface wants tint and
    the mesh's TintOnTransmissive flag is set, else white)."""
    cos_theta = jnp.clip(-jnp.sum(d_in * n, axis=-1), 0.0, 1.0)

    f0_scalar = base_fresnel(ior)
    # specular chance: Fresnel between f0 and 1, raised by metallic
    fres = fresnel_schlick(cos_theta, f0_scalar)
    spec_chance = fres + metallic * (1.0 - fres)
    trans_chance = transmission * (1.0 - spec_chance)

    pick_spec = u_lobe < spec_chance
    pick_trans = (~pick_spec) & (u_lobe < spec_chance + trans_chance)
    # diffuse otherwise

    r2 = roughness * roughness

    # --- specular: mirror reflect lerped toward cosine lobe by roughness^2
    # (the reference's cheap GGX-ish perturbation, Shading.glsl)
    refl = sampling.reflect(d_in, n)
    cos_dir = sampling.cosine_hemisphere(n, u_dir)
    spec_dir = refl * (1.0 - r2)[..., None] + cos_dir * r2[..., None]
    spec_dir = spec_dir / jnp.maximum(
        jnp.linalg.norm(spec_dir, axis=-1, keepdims=True), 1e-12
    )
    # tinted by albedo for metals, white for dielectrics
    spec_tint = albedo * metallic[..., None] + (1.0 - metallic[..., None])

    # --- transmission: refract through interface, perturbed by roughness
    eta = jnp.where(inside, ior, 1.0 / ior)
    refr_dir, _tir = sampling.refract(d_in, n, eta)
    cos_dir_t = sampling.cosine_hemisphere(-n, u_dir[..., ::-1])
    trans_dir = refr_dir * (1.0 - r2)[..., None] + cos_dir_t * r2[..., None]
    trans_dir = trans_dir / jnp.maximum(
        jnp.linalg.norm(trans_dir, axis=-1, keepdims=True), 1e-12
    )

    # --- diffuse
    diff_dir = cos_dir

    direction = jnp.where(
        pick_spec[..., None], spec_dir, jnp.where(pick_trans[..., None], trans_dir, diff_dir)
    )
    # Lobe-selection chances equal lobe energies, so (energy/chance) cancels
    # and the throughput multiplier is just the lobe tint — no 1/chance
    # firefly spikes (variance-optimal importance choice; the reference's
    # chance-divided form is equivalent in expectation).
    t_tint = jnp.ones_like(albedo) if trans_tint is None else trans_tint
    tp = jnp.where(
        pick_spec[..., None],
        spec_tint,
        jnp.where(pick_trans[..., None], t_tint, albedo),
    )
    return SurfaceSample(
        direction=direction,
        throughput_mul=tp,
        is_transmissive=pick_trans,
        is_specular=pick_spec,
    )


def ggx_brdf(n, v, l, albedo, metallic, roughness):
    """Full GGX microfacet BRDF for deferred/direct lighting
    (ref: Pbr.glsl:40-105 GGX distribution + Smith geometry + Schlick)."""
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    nl = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    nv = jnp.maximum(jnp.sum(n * v, axis=-1), 1e-4)
    nh = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    vh = jnp.maximum(jnp.sum(v * h, axis=-1), 0.0)

    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    denom = nh * nh * (a2 - 1.0) + 1.0
    ndf = a2 / jnp.maximum(jnp.pi * denom * denom, 1e-8)

    k = (roughness + 1.0) ** 2 / 8.0
    g_v = nv / (nv * (1.0 - k) + k)
    g_l = nl / jnp.maximum(nl * (1.0 - k) + k, 1e-8)
    g = g_v * g_l

    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    f = f0 + (1.0 - f0) * jnp.power(1.0 - vh, 5.0)[..., None]

    spec = ndf[..., None] * g[..., None] * f / jnp.maximum(4.0 * nv * nl, 1e-6)[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo / jnp.pi
    return (diffuse + spec) * nl[..., None]
