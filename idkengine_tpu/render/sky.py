"""Sky: HDR environment maps + procedural atmospheric scattering.

Role of the reference's SkyBoxManager + AtmosphericScatterer
(ref: Source/Render/SkyBoxManager.cs:13-86 — ExternalAsset equirect/cubemap
vs InternalAtmosphericScattering modes;
Resource/Shaders/AtmosphericScattering/compute.glsl — Rayleigh+Mie
in-scattering). TPU re-design: the environment is an equirectangular (H,W,3)
radiance array sampled by direction; the atmospheric mode computes the same
single-scattering integral as a jnp program into that array once.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AtmosphereSettings:
    """ref: AtmosphericScatterer.cs settings (ISteps/JSteps/time/density)."""

    sun_direction: tuple = (0.3, 0.8, 0.2)
    sun_intensity: float = 22.0
    i_steps: int = 16  # view-ray samples
    j_steps: int = 4  # sun-ray samples
    planet_radius: float = 6.371e6
    atmosphere_radius: float = 6.471e6
    rayleigh_scale_height: float = 8000.0
    mie_scale_height: float = 1200.0
    mie_g: float = 0.758


_BETA_R = np.array([5.5e-6, 13.0e-6, 22.4e-6], np.float32)
_BETA_M = np.float32(21e-6)


def _ray_sphere_exit(o, d, radius):
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


def compute_atmosphere(width: int = 256, height: int = 128,
                       settings: AtmosphereSettings = AtmosphereSettings()) -> np.ndarray:
    """Single-scattering Rayleigh+Mie sky as an equirect (H,W,3) array
    (the reference renders the same integral into a cubemap)."""
    s = settings
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    theta = (ys + 0.5) / height * np.pi
    phi = ((xs + 0.5) / width * 2.0 - 1.0) * np.pi
    d = np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)], -1
    ).astype(np.float32)
    d = jnp.asarray(d.reshape(-1, 3))

    sun = np.asarray(s.sun_direction, np.float32)
    sun = jnp.asarray(sun / np.linalg.norm(sun))

    o = jnp.asarray([0.0, s.planet_radius + 2.0, 0.0])
    o = jnp.broadcast_to(o, d.shape)

    t_exit = _ray_sphere_exit(o, d, s.atmosphere_radius)
    seg = t_exit / s.i_steps

    mu = jnp.sum(d * sun, axis=-1)
    phase_r = 3.0 / (16.0 * jnp.pi) * (1.0 + mu * mu)
    g = s.mie_g
    phase_m = (
        3.0 / (8.0 * jnp.pi)
        * ((1.0 - g * g) * (1.0 + mu * mu))
        / ((2.0 + g * g) * jnp.power(1.0 + g * g - 2.0 * g * mu, 1.5))
    )

    sum_r = jnp.zeros_like(d)
    sum_m = jnp.zeros_like(d)
    od_r = jnp.zeros(d.shape[0])
    od_m = jnp.zeros(d.shape[0])
    for i in range(s.i_steps):
        p = o + d * ((i + 0.5) * seg)[..., None]
        h = jnp.maximum(jnp.linalg.norm(p, axis=-1) - s.planet_radius, 0.0)
        hr = jnp.exp(-h / s.rayleigh_scale_height) * seg
        hm = jnp.exp(-h / s.mie_scale_height) * seg
        od_r = od_r + hr
        od_m = od_m + hm
        # optical depth toward the sun
        t_sun = _ray_sphere_exit(p, jnp.broadcast_to(sun, p.shape), s.atmosphere_radius)
        sseg = t_sun / s.j_steps
        od_sr = jnp.zeros(d.shape[0])
        od_sm = jnp.zeros(d.shape[0])
        for j in range(s.j_steps):
            q = p + sun * ((j + 0.5) * sseg)[..., None]
            hq = jnp.maximum(jnp.linalg.norm(q, axis=-1) - s.planet_radius, 0.0)
            od_sr = od_sr + jnp.exp(-hq / s.rayleigh_scale_height) * sseg
            od_sm = od_sm + jnp.exp(-hq / s.mie_scale_height) * sseg
        tau = (
            jnp.asarray(_BETA_R) * (od_r + od_sr)[..., None]
            + _BETA_M * 1.1 * (od_m + od_sm)[..., None]
        )
        att = jnp.exp(-tau)
        sum_r = sum_r + att * hr[..., None]
        sum_m = sum_m + att * hm[..., None]

    radiance = s.sun_intensity * (
        sum_r * jnp.asarray(_BETA_R) * phase_r[..., None]
        + sum_m * _BETA_M * phase_m[..., None]
    )
    return np.asarray(radiance).reshape(height, width, 3).astype(np.float32)


class SkyBoxManager:
    """Environment source selector (ref: SkyBoxManager.cs modes)."""

    def __init__(self):
        self.env_map: np.ndarray | None = None

    def load_equirect_hdr(self, path: str):
        from ..scene.hdr import load_hdr

        self.env_map = load_hdr(path)
        return self.env_map

    def use_atmospheric_scattering(self, settings: AtmosphereSettings = AtmosphereSettings(),
                                   width: int = 256, height: int = 128):
        self.env_map = compute_atmosphere(width, height, settings)
        return self.env_map
