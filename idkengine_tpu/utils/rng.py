"""Device-side RNG: PCG hash chains + interleaved gradient noise + R2 sequence.

jnp re-implementation of the reference's GPU RNG
(ref: Resource/Shaders/include/Random.glsl:16-41 and Sampling.glsl). All
functions are shape-polymorphic and jit-friendly; state is an explicit
uint32 array (no global state — functional style for XLA).
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg_hash(x):
    """PCG output permutation on uint32 (ref: Random.glsl PCGHash)."""
    x = x.astype(_U32)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def init_state(pixel_index, frame):
    """Per-pixel decorrelated RNG state (ref: FirstHit/compute.glsl seed)."""
    return pcg_hash(
        pixel_index.astype(_U32) * _U32(19349663) ^ jnp.asarray(frame, _U32) * _U32(83492791)
    )


def next_state(state):
    return pcg_hash(state)


def to_float01(state):
    """uint32 → float32 in [0,1)."""
    return (state >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform(state):
    """Returns (new_state, u01)."""
    s = next_state(state)
    return s, to_float01(s)


def uniform2(state):
    s1 = next_state(state)
    s2 = next_state(s1)
    return s2, jnp.stack([to_float01(s1), to_float01(s2)], axis=-1)


# R2 low-discrepancy sequence with Cranley–Patterson rotation
# (ref: Shading.glsl:50-147 uses R2 + per-pixel rotation for BSDF sampling)
_R2_G = 1.32471795724474602596
_R2_A1 = jnp.float32(1.0 / _R2_G)
_R2_A2 = jnp.float32(1.0 / (_R2_G * _R2_G))


def r2(n):
    """(...,) sample index → (...,2) R2 sequence point."""
    n = n.astype(jnp.float32)
    return jnp.stack(
        [jnp.mod(0.5 + _R2_A1 * n, 1.0), jnp.mod(0.5 + _R2_A2 * n, 1.0)], axis=-1
    )


def r2_rotated(n, rotation01):
    """R2 point with per-pixel Cranley–Patterson rotation (...,2)."""
    return jnp.mod(r2(n) + rotation01, 1.0)


def interleaved_gradient_noise(px, py, frame):
    """Screen-space IGN (ref: Random.glsl InterleavedGradientNoise)."""
    f = jnp.asarray(frame, jnp.float32)
    x = px.astype(jnp.float32) + 5.588238 * f
    y = py.astype(jnp.float32) + 5.588238 * f
    return jnp.mod(52.9829189 * jnp.mod(0.06711056 * x + 0.00583715 * y, 1.0), 1.0)
