"""Tonemapping + gamma (device).

Role of the reference's TonemapAndGammaCorrecter
(ref: Source/Render/TonemapAndGammaCorrecter.cs + TonemapAndGammaCorrect/
compute.glsl — AgX-style with exposure/saturation/linear/peak controls).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TonemapSettings:
    exposure: float = 0.0  # EV offset
    saturation: float = 1.0
    agx: bool = True
    gamma: float = 2.2


def _agx_default_contrast(x):
    """AgX sigmoid contrast approximation (6th-order polynomial fit)."""
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


# AgX inset/outset matrices (Troy Sobotka's AgX, public domain constants)
_AGX_IN = np.array(
    [
        [0.842479062253094, 0.0423282422610123, 0.0423756549057051],
        [0.0784335999999992, 0.878468636469772, 0.0784336],
        [0.0792237451477643, 0.0791661274605434, 0.879142973793104],
    ],
    np.float32,
)
_AGX_OUT = np.linalg.inv(_AGX_IN).astype(np.float32)

_AGX_MIN_EV = -12.47393
_AGX_MAX_EV = 4.026069


def tonemap(img, settings: TonemapSettings = TonemapSettings()):
    """(…,3) linear HDR → display-referred [0,1] after gamma."""
    x = img * jnp.exp2(settings.exposure)
    if settings.agx:
        x = x @ jnp.asarray(_AGX_IN).T
        x = jnp.clip(
            (jnp.log2(jnp.maximum(x, 1e-10)) - _AGX_MIN_EV) / (_AGX_MAX_EV - _AGX_MIN_EV),
            0.0,
            1.0,
        )
        x = _agx_default_contrast(x)
        x = jnp.clip(x @ jnp.asarray(_AGX_OUT).T, 0.0, 1.0)
        # AgX output is already ~sRGB-encoded; skip extra gamma
        out = x
    else:
        # simple Reinhard + gamma
        x = x / (1.0 + x)
        out = jnp.power(jnp.clip(x, 0.0, 1.0), 1.0 / settings.gamma)
    if settings.saturation != 1.0:
        luma = jnp.sum(out * jnp.asarray([0.2126, 0.7152, 0.0722]), axis=-1, keepdims=True)
        out = jnp.clip(luma + (out - luma) * settings.saturation, 0.0, 1.0)
    return out


def to_uint8(img01) -> np.ndarray:
    return np.asarray(jnp.clip(img01 * 255.0 + 0.5, 0, 255).astype(jnp.uint8))
