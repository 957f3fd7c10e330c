"""Bit-packing codecs used by the GBuffer and vertex formats.

TPU-native re-implementations of the reference's packing library
(source/shaders/packunpack.hlsli: octahedral normals, RGB9E5 shared-exponent
color, R10G10B10A2/RGBA8 unorm, f16 pairs) as jnp uint32 bit manipulation.
All functions are elementwise over arbitrary leading dimensions and are
jit/vmap-safe.  Channel packing keeps the GBuffer at 4x uint32 per pixel,
matching the reference's RGBA32_UINT GBufferA (BasePassRenderers.cpp:618-664).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Octahedral unit-vector encoding (standard Meyer et al. mapping)
# ---------------------------------------------------------------------------

def oct_encode(n):
    """Unit vectors (..., 3) -> octahedral uv in [0, 1]^2 (..., 2)."""
    l1 = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    p = n[..., :2] / jnp.maximum(l1[..., None], 1e-20)
    # fold the lower hemisphere
    flipped = (1.0 - jnp.abs(p[..., ::-1])) * jnp.where(p >= 0.0, 1.0, -1.0)
    uv = jnp.where(n[..., 2:3] < 0.0, flipped, p)
    return uv * 0.5 + 0.5


def oct_decode(uv):
    """Octahedral uv in [0, 1]^2 (..., 2) -> unit vectors (..., 3)."""
    p = uv * 2.0 - 1.0
    z = 1.0 - jnp.abs(p[..., 0]) - jnp.abs(p[..., 1])
    t = jnp.maximum(-z, 0.0)
    xy = p - jnp.where(p >= 0.0, 1.0, -1.0) * t[..., None]
    v = jnp.concatenate([xy, z[..., None]], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def pack_normal_oct_u32(n):
    """Unit vector (..., 3) -> u32 with 2x16-bit unorm octahedral coords."""
    uv = oct_encode(n)
    q = jnp.clip(uv * 65535.0 + 0.5, 0.0, 65535.0).astype(_U32)
    return q[..., 0] | (q[..., 1] << 16)


def unpack_normal_oct_u32(u):
    u = u.astype(_U32)
    x = (u & 0xFFFF).astype(jnp.float32) / 65535.0
    y = ((u >> 16) & 0xFFFF).astype(jnp.float32) / 65535.0
    return oct_decode(jnp.stack([x, y], axis=-1))


# ---------------------------------------------------------------------------
# RGBA8 unorm
# ---------------------------------------------------------------------------

def pack_rgba8_u32(c):
    """(..., 4) in [0,1] -> u32 (r in low byte)."""
    q = jnp.clip(c * 255.0 + 0.5, 0.0, 255.0).astype(_U32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


def unpack_rgba8_u32(u):
    u = u.astype(_U32)
    return jnp.stack([
        (u & 0xFF), ((u >> 8) & 0xFF), ((u >> 16) & 0xFF), ((u >> 24) & 0xFF),
    ], axis=-1).astype(jnp.float32) / 255.0


# ---------------------------------------------------------------------------
# R10G10B10A2 unorm (packed vertex normal format, ShaderInterop.h:278-283)
# ---------------------------------------------------------------------------

def pack_r10g10b10a2_u32(c):
    """(..., 4) in [0,1] -> u32, 10/10/10/2 bits."""
    q = jnp.clip(c[..., :3] * 1023.0 + 0.5, 0.0, 1023.0).astype(_U32)
    a = jnp.clip(c[..., 3] * 3.0 + 0.5, 0.0, 3.0).astype(_U32)
    return q[..., 0] | (q[..., 1] << 10) | (q[..., 2] << 20) | (a << 30)


def unpack_r10g10b10a2_u32(u):
    u = u.astype(_U32)
    return jnp.stack([
        (u & 0x3FF).astype(jnp.float32) / 1023.0,
        ((u >> 10) & 0x3FF).astype(jnp.float32) / 1023.0,
        ((u >> 20) & 0x3FF).astype(jnp.float32) / 1023.0,
        ((u >> 30) & 0x3).astype(jnp.float32) / 3.0,
    ], axis=-1)


def pack_unit_vector_r10g10b10(n):
    """Signed unit vector -> 10:10:10 unorm-mapped u32 (alpha bits unused)."""
    return pack_r10g10b10a2_u32(
        jnp.concatenate([n * 0.5 + 0.5, jnp.zeros_like(n[..., :1])], axis=-1))


def unpack_unit_vector_r10g10b10(u):
    v = unpack_r10g10b10a2_u32(u)[..., :3] * 2.0 - 1.0
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# RGB9E5 shared-exponent HDR color
# ---------------------------------------------------------------------------

_RGB9E5_EXP_BIAS = 15
_RGB9E5_MANTISSA_BITS = 9
_RGB9E5_MAX_EXP = 31
# largest representable value: (511/512) * 2^(31-15) = 65408
_RGB9E5_MAX = (511.0 / 512.0) * float(2 ** (_RGB9E5_MAX_EXP - _RGB9E5_EXP_BIAS))


def pack_rgb9e5_u32(c):
    """HDR color (..., 3), >= 0 -> u32 RGB9E5 (9-bit mantissas, 5-bit shared
    exponent).  Follows the OpenGL EXT_texture_shared_exponent rounding."""
    c = jnp.clip(c, 0.0, _RGB9E5_MAX)
    maxc = jnp.maximum(jnp.maximum(c[..., 0], c[..., 1]), c[..., 2])
    # shared exponent: floor(log2(maxc)) + 1 + bias, clamped
    exp_f = jnp.floor(jnp.log2(jnp.maximum(maxc, 1e-30))) + 1.0
    exp = jnp.clip(exp_f + _RGB9E5_EXP_BIAS, 0.0, _RGB9E5_MAX_EXP)
    scale = jnp.exp2(exp - _RGB9E5_EXP_BIAS - _RGB9E5_MANTISSA_BITS)
    m = jnp.clip(jnp.round(c / scale[..., None]), 0.0, 511.0)
    # rounding can push a mantissa to 512; bump the exponent
    bump = jnp.any(m > 511.0, axis=-1)
    exp = jnp.where(bump, jnp.minimum(exp + 1, _RGB9E5_MAX_EXP), exp)
    scale = jnp.exp2(exp - _RGB9E5_EXP_BIAS - _RGB9E5_MANTISSA_BITS)
    m = jnp.clip(jnp.round(c / scale[..., None]), 0.0, 511.0).astype(_U32)
    e = exp.astype(_U32)
    return m[..., 0] | (m[..., 1] << 9) | (m[..., 2] << 18) | (e << 27)


def unpack_rgb9e5_u32(u):
    u = u.astype(_U32)
    e = ((u >> 27) & 0x1F).astype(jnp.float32)
    scale = jnp.exp2(e - _RGB9E5_EXP_BIAS - _RGB9E5_MANTISSA_BITS)
    return jnp.stack([
        (u & 0x1FF).astype(jnp.float32),
        ((u >> 9) & 0x1FF).astype(jnp.float32),
        ((u >> 18) & 0x1FF).astype(jnp.float32),
    ], axis=-1) * scale[..., None]


# ---------------------------------------------------------------------------
# f16 pairs
# ---------------------------------------------------------------------------

def pack_half2_u32(v):
    """(..., 2) float -> u32 of two IEEE half floats."""
    h = v.astype(jnp.float16)
    bits = jax_bitcast_u16(h)
    return bits[..., 0].astype(_U32) | (bits[..., 1].astype(_U32) << 16)


def unpack_half2_u32(u):
    u = u.astype(_U32)
    lo = (u & 0xFFFF).astype(jnp.uint16)
    hi = ((u >> 16) & 0xFFFF).astype(jnp.uint16)
    return jnp.stack([
        jax_bitcast_f16(lo), jax_bitcast_f16(hi),
    ], axis=-1).astype(jnp.float32)


def jax_bitcast_u16(h):
    return jax_lax_bitcast(h, jnp.uint16)


def jax_bitcast_f16(u):
    return jax_lax_bitcast(u, jnp.float16)


def jax_lax_bitcast(x, dtype):
    import jax.lax as lax
    return lax.bitcast_convert_type(x, dtype)


# ---------------------------------------------------------------------------
# sRGB
# ---------------------------------------------------------------------------

def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055)


def srgb_to_linear(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))
