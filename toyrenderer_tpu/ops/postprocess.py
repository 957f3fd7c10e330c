"""Final post-process: exposure, tonemap, sRGB encode, u8 quantize.

Counterpart of source/PostProcessRenderer.cpp + postprocess.hlsl:44-69
(bloom lerp, exposure scale, Khronos PBR-neutral tonemap, linear->sRGB).
"""

from __future__ import annotations

import jax.numpy as jnp

from toyrenderer_tpu.ops.packing import linear_to_srgb


def tonemap_pbr_neutral(color):
    """Khronos PBR Neutral tonemapper (same curve family the reference
    uses); color >= 0 HDR in, [0,1] out."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15

    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    c = color - offset

    peak = jnp.max(c, axis=-1, keepdims=True)
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / jnp.maximum(peak + d - start_compression, 1e-6)
    scale = new_peak / jnp.maximum(peak, 1e-6)
    g = 1.0 - 1.0 / (desaturation * jnp.maximum(peak - new_peak, 0.0) + 1.0)
    out = jnp.where(peak > start_compression,
                    c * scale * (1.0 - g) + new_peak * g,
                    c)
    return jnp.clip(out, 0.0, 1.0)


def compose_final(hdr, exposure=1.0, bloom=None, bloom_strength: float = 0.04):
    """HDR (H, W, 3) -> sRGB u8 (H, W, 3)."""
    if bloom is not None:
        hdr = hdr * (1.0 - bloom_strength) + bloom * bloom_strength
    x = hdr * exposure
    x = tonemap_pbr_neutral(x)
    x = linear_to_srgb(x)
    return jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
