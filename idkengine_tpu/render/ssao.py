"""Screen-space ambient occlusion (device, image-space).

Re-expression of the reference's SSAO (ref: Source/Render/SSAO.cs +
Resource/Shaders/SSAO/compute.glsl): hemisphere samples around the
G-buffer normal, depth-compared in view space, with sample count /
radius / strength settings.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import rng


@dataclass(frozen=True)
class SsaoSettings:
    samples: int = 10
    radius: float = 0.35
    strength: float = 1.3


@partial(jax.jit, static_argnames=("settings",))
def ssao(view_pos, normal, frame, settings: SsaoSettings = SsaoSettings()):
    """view_pos: (H,W,3) view-space positions (z<0 in front), normal (H,W,3)
    view-space normals. Returns (H,W) occlusion in [0,1] (1 = occluded)."""
    h, w = view_pos.shape[0], view_pos.shape[1]
    pix = jnp.arange(h * w, dtype=jnp.uint32).reshape(h, w)
    state = rng.init_state(pix, frame)

    occlusion = jnp.zeros((h, w), jnp.float32)
    z = view_pos[..., 2]
    for _ in range(settings.samples):
        state, u = rng.uniform2(state)
        state, u2 = rng.uniform(state)
        # cosine-hemisphere sample around the normal, scaled into the radius
        from .sampling import cosine_hemisphere

        dir3 = cosine_hemisphere(normal, u)
        p = view_pos + dir3 * (settings.radius * jnp.sqrt(u2))[..., None]
        # project the sample to screen: perspective divide on view pos
        px = jnp.clip(
            ((p[..., 0] / -p[..., 2]) * 0.5 + 0.5) * w, 0, w - 1
        ).astype(jnp.int32)
        py = jnp.clip(
            (0.5 - (p[..., 1] / -p[..., 2]) * 0.5) * h, 0, h - 1
        ).astype(jnp.int32)
        sample_z = z[py, px]
        # occluded if the depth buffer is in front of the sample point
        range_check = jnp.exp(-jnp.abs(z - sample_z))
        occluded = (sample_z > p[..., 2] + 0.02) & (sample_z < p[..., 2] + settings.radius)
        occlusion = occlusion + occluded.astype(jnp.float32) * range_check
    ao = jnp.clip(occlusion / settings.samples * settings.strength, 0.0, 1.0)
    return ao
