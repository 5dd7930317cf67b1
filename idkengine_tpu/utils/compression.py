"""Attribute compression: octahedral normals and R11G11B10F packed vectors.

Numpy (host) and jnp (device) implementations of the reference's vertex
compression (ref: IDKEngine/Source/Utils/Compression.cs and
Resource/Shaders/include/Compression.glsl). Compressed attributes keep the
SoA vertex arrays small in HBM; decompression is cheap VPU work.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Octahedral unit-vector encoding (32-bit: 2x snorm16)
# ---------------------------------------------------------------------------

def _oct_wrap(v, xp):
    return (1.0 - xp.abs(v[..., ::-1])) * xp.where(v >= 0.0, 1.0, -1.0)


def encode_octahedral(n: np.ndarray) -> np.ndarray:
    """Unit vectors (...,3) → (...,2) in [-1,1] octahedral coords."""
    n = np.asarray(n, np.float32)
    n = n / np.maximum(np.sum(np.abs(n), axis=-1, keepdims=True), 1e-20)
    p = n[..., :2]
    p = np.where(n[..., 2:3] >= 0.0, p, _oct_wrap(p, np))
    return p.astype(np.float32)


def decode_octahedral(p, xp=np):
    """(...,2) octahedral coords → (...,3) unit vectors. Works with numpy or jnp."""
    x, y = p[..., 0], p[..., 1]
    z = 1.0 - xp.abs(x) - xp.abs(y)
    t = xp.maximum(-z, 0.0)
    x = x + xp.where(x >= 0.0, -t, t)
    y = y + xp.where(y >= 0.0, -t, t)
    v = xp.stack([x, y, z], axis=-1)
    return v / xp.maximum(
        xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True)), xp.asarray(1e-20, v.dtype)
    )


def pack_snorm2x16(p: np.ndarray) -> np.ndarray:
    """(...,2) in [-1,1] → uint32."""
    q = np.round(np.clip(p, -1.0, 1.0) * 32767.0).astype(np.int32)
    return ((q[..., 0] & 0xFFFF) | ((q[..., 1] & 0xFFFF) << 16)).astype(np.uint32)


def unpack_snorm2x16(u, xp=np):
    u = u.astype(xp.uint32) if xp is np else u.astype(jnp.uint32)
    lo = (u & 0xFFFF).astype(xp.int32 if xp is np else jnp.int32)
    hi = ((u >> 16) & 0xFFFF).astype(xp.int32 if xp is np else jnp.int32)
    # sign-extend 16-bit
    lo = xp.where(lo >= 0x8000, lo - 0x10000, lo)
    hi = xp.where(hi >= 0x8000, hi - 0x10000, hi)
    return xp.stack([lo / 32767.0, hi / 32767.0], axis=-1)


def compress_normal(n: np.ndarray) -> np.ndarray:
    """Unit vector → uint32 (octahedral snorm2x16)."""
    return pack_snorm2x16(encode_octahedral(n))


def compress_normal_xp(n, xp=np):
    """compress_normal for either backend (jnp path used by the device
    refit, render/dynamic.py)."""
    if xp is np:
        return compress_normal(n)
    n = n / jnp.maximum(jnp.sum(jnp.abs(n), axis=-1, keepdims=True), 1e-20)
    p = n[..., :2]
    p = jnp.where(n[..., 2:3] >= 0.0, p, _oct_wrap(p, jnp))
    q = jnp.round(jnp.clip(p, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    return ((q[..., 0] & 0xFFFF)
            | ((q[..., 1] & 0xFFFF) << 16)).astype(jnp.uint32)


def decompress_normal(u, xp=np):
    return decode_octahedral(unpack_snorm2x16(u, xp), xp)


# ---------------------------------------------------------------------------
# R11G11B10 float packing (unsigned small floats; UVs / colors)
# ---------------------------------------------------------------------------

def _to_small_float(v: np.ndarray, exp_bits: int, man_bits: int) -> np.ndarray:
    """float32 (non-negative) → unsigned small float bit pattern."""
    v = np.maximum(np.asarray(v, np.float32), 0.0)
    bits = v.view(np.uint32) if v.flags["C_CONTIGUOUS"] else np.ascontiguousarray(v).view(np.uint32)
    exp = ((bits >> 23) & 0xFF).astype(np.int32) - 127
    man = (bits >> (23 - man_bits)) & ((1 << man_bits) - 1)
    bias = (1 << (exp_bits - 1)) - 1
    e = np.clip(exp + bias, 0, (1 << exp_bits) - 1)
    out = (e.astype(np.uint32) << man_bits) | man.astype(np.uint32)
    return np.where(v == 0.0, np.uint32(0), out).astype(np.uint32)


def _from_small_float(u, exp_bits: int, man_bits: int, xp=np):
    bias = (1 << (exp_bits - 1)) - 1
    e = (u >> man_bits).astype(xp.int32 if xp is np else jnp.int32)
    m = (u & ((1 << man_bits) - 1)).astype(xp.float32 if xp is np else jnp.float32)
    scale = xp.exp2((e - bias).astype(xp.float32 if xp is np else jnp.float32))
    return xp.where(u == 0, 0.0, scale * (1.0 + m / (1 << man_bits)))


def pack_r11g11b10(v: np.ndarray) -> np.ndarray:
    """(...,3) non-negative floats → uint32 R11G11B10F."""
    r = _to_small_float(v[..., 0], 5, 6)
    g = _to_small_float(v[..., 1], 5, 6)
    b = _to_small_float(v[..., 2], 5, 5)
    return (r | (g << 11) | (b << 22)).astype(np.uint32)


def unpack_r11g11b10(u, xp=np):
    uu = u.astype(np.uint32) if xp is np else u.astype(jnp.uint32)
    r = _from_small_float(uu & 0x7FF, 5, 6, xp)
    g = _from_small_float((uu >> 11) & 0x7FF, 5, 6, xp)
    b = _from_small_float((uu >> 22) & 0x3FF, 5, 5, xp)
    return xp.stack([r, g, b], axis=-1)
