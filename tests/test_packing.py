"""Unit tests for GBuffer/vertex packing codecs vs numpy oracles.

Covers the formats of source/shaders/packunpack.hlsli (octahedral, RGB9E5,
RGBA8, R10G10B10A2, half2) as round-trip + reference-value tests.
"""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import packing as P


def _rand_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_oct_roundtrip_float():
    n = _rand_unit(4096)
    dec = np.asarray(P.oct_decode(P.oct_encode(jnp.asarray(n))))
    dots = np.sum(dec * n, axis=-1)
    assert dots.min() > 1.0 - 1e-6


def test_oct_roundtrip_u32():
    n = _rand_unit(4096, seed=1)
    dec = np.asarray(P.unpack_normal_oct_u32(P.pack_normal_oct_u32(jnp.asarray(n))))
    ang = np.degrees(np.arccos(np.clip(np.sum(dec * n, axis=-1), -1, 1)))
    assert ang.max() < 0.05  # 16-bit oct is accurate to ~0.01 deg


def test_oct_axes_exact():
    axes = np.array([[0, 0, 1], [0, 0, -1], [1, 0, 0], [0, -1, 0]], np.float32)
    dec = np.asarray(P.oct_decode(P.oct_encode(jnp.asarray(axes))))
    np.testing.assert_allclose(dec, axes, atol=1e-6)


def test_rgba8_roundtrip():
    rng = np.random.default_rng(2)
    c = rng.uniform(size=(1000, 4)).astype(np.float32)
    dec = np.asarray(P.unpack_rgba8_u32(P.pack_rgba8_u32(jnp.asarray(c))))
    assert np.abs(dec - c).max() <= 0.5 / 255.0 + 1e-6


def test_rgba8_known_values():
    c = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])
    assert int(P.pack_rgba8_u32(c)[0]) == 0xFF0000FF


def test_r10g10b10a2_roundtrip():
    rng = np.random.default_rng(3)
    c = rng.uniform(size=(1000, 4)).astype(np.float32)
    dec = np.asarray(P.unpack_r10g10b10a2_u32(P.pack_r10g10b10a2_u32(jnp.asarray(c))))
    assert np.abs(dec[:, :3] - c[:, :3]).max() <= 0.5 / 1023.0 + 1e-6
    assert np.abs(dec[:, 3] - c[:, 3]).max() <= 0.5 / 3.0 + 1e-6


def test_unit_vector_r10_roundtrip():
    n = _rand_unit(1000, seed=4)
    dec = np.asarray(P.unpack_unit_vector_r10g10b10(
        P.pack_unit_vector_r10g10b10(jnp.asarray(n))))
    ang = np.degrees(np.arccos(np.clip(np.sum(dec * n, axis=-1), -1, 1)))
    assert ang.max() < 0.25


def test_rgb9e5_roundtrip():
    rng = np.random.default_rng(5)
    # HDR range spanning several decades
    c = (rng.uniform(size=(2000, 3)) ** 2 * 1000.0).astype(np.float32)
    dec = np.asarray(P.unpack_rgb9e5_u32(P.pack_rgb9e5_u32(jnp.asarray(c))))
    rel = np.abs(dec - c) / np.maximum(np.max(c, axis=-1, keepdims=True), 1e-6)
    assert rel.max() < 1.0 / 256.0  # 9-bit mantissa shared exponent


def test_rgb9e5_zero_and_max():
    c = jnp.asarray([[0.0, 0.0, 0.0], [65408.0, 65408.0, 65408.0]])
    dec = np.asarray(P.unpack_rgb9e5_u32(P.pack_rgb9e5_u32(c)))
    np.testing.assert_allclose(dec[0], 0.0)
    np.testing.assert_allclose(dec[1], 65408.0, rtol=1e-6)


def test_half2_roundtrip():
    rng = np.random.default_rng(6)
    v = rng.normal(size=(1000, 2)).astype(np.float32) * 10
    dec = np.asarray(P.unpack_half2_u32(P.pack_half2_u32(jnp.asarray(v))))
    np.testing.assert_allclose(dec, v.astype(np.float16).astype(np.float32),
                               rtol=0, atol=0)


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 256)
    dec = np.asarray(P.srgb_to_linear(P.linear_to_srgb(c)))
    np.testing.assert_allclose(dec, np.asarray(c), atol=1e-5)
