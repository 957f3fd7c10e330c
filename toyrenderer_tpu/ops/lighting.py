"""Deferred lighting composite.

Counterpart of source/DeferredLightingRenderer.cpp + deferredlighting.hlsl:
unpack the GBuffer, evaluate the directional sun BRDF, multiply the shadow
mask, add ambient/GI modulated by AO, add emissive, and write sky radiance
where no geometry was rasterized (the reference uses a stencil sky bit; we
use tri_id < 0 <=> depth == 0).  Also hosts the 13 debug view modes
(ShaderInterop.h:26-38 equivalents) selected statically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops import brdf
from toyrenderer_tpu.ops import sky as sky_mod
from toyrenderer_tpu.ops.gbuffer import unpack_gbuffer

# debug view modes (subset growing toward the reference's 14)
DEBUG_NONE = 0
DEBUG_ALBEDO = 1
DEBUG_NORMAL = 2
DEBUG_ROUGHNESS = 3
DEBUG_METALLIC = 4
DEBUG_EMISSIVE = 5
DEBUG_DEPTH = 6
DEBUG_MOTION = 7
DEBUG_SHADOW = 8
DEBUG_AO = 9
DEBUG_GI = 10
DEBUG_MESHLET = 11
DEBUG_LOD = 12
DEBUG_UV = 13
DEBUG_MIP = 14   # texture-feedback / MinMip viewer parity


def world_pos_from_depth(depth, inv_view_proj, width, height):
    """Reconstruct world position from reverse-Z depth (like the
    reference's lighting pass)."""
    import jax
    px = jax.lax.broadcasted_iota(jnp.float32, depth.shape, 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, depth.shape, 0) + 0.5
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = (0.5 - py / height) * 2.0
    clip = jnp.stack([ndc_x, ndc_y, depth, jnp.ones_like(depth)], -1)
    wp = jnp.einsum('ij,...j->...i', inv_view_proj, clip)
    return wp[..., :3] / jnp.where(
        jnp.abs(wp[..., 3:4]) < 1e-20, 1e-20, wp[..., 3:4])


def deferred_lighting(gb: dict, cam_pos, inv_view_proj,
                      sun_direction, sun_color, sun_intensity,
                      shadow_mask=None, ao=None, gi_irradiance=None,
                      sky_turbidity: float = 2.5,
                      ambient_factor: float = 0.03, sky_fn=None):
    """HDR lighting (H, W, 3).  Optional per-pixel shadow/AO/GI terms.
    sky_fn: optional callable(dirs (..., 3)) -> (..., 3) radiance (the
    frame passes the Hosek evaluator; default = built-in Preetham)."""
    m = unpack_gbuffer(gb)
    h, w = m['depth'].shape
    hit = m['depth'] > 0.0

    world_pos = world_pos_from_depth(m['depth'], inv_view_proj, w, h)
    view_dir = cam_pos - world_pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8)
    light_dir = -sun_direction  # surface -> sun

    radiance = brdf.shade_directional(
        m['normal'], view_dir, jnp.broadcast_to(light_dir, view_dir.shape),
        m['albedo'], m['roughness'], m['metallic'])
    shadow = shadow_mask if shadow_mask is not None else 1.0
    lit = radiance * (sun_color * sun_intensity) * (
        shadow[..., None] if shadow_mask is not None else 1.0)

    ao_term = ao if ao is not None else jnp.ones_like(m['depth'])
    if gi_irradiance is not None:
        ambient = gi_irradiance * m['albedo'] * ao_term[..., None]
    else:
        ambient = (m['albedo'] * ambient_factor * sun_intensity
                   * ao_term[..., None])
    lit = lit + ambient + m['emissive']

    rays = sky_mod.view_rays(inv_view_proj, w, h)
    if sky_fn is not None:
        sky_rgb = sky_fn(rays)
    else:
        sky_rgb = sky_mod.sky_radiance(
            rays, light_dir, turbidity=sky_turbidity,
            sun_intensity=sun_intensity)
    return jnp.where(hit[..., None], lit, sky_rgb)


# 3x5 bitmap digits 0-9 (rows top-down, 3-bit masks) for the MinMip
# debug overlay — the function of the reference's SDF digit atlas
# (visualizeminmip.hlsl) without shipping font data
_DIGITS = jnp.asarray([
    [0b111, 0b101, 0b101, 0b101, 0b111],   # 0
    [0b010, 0b110, 0b010, 0b010, 0b111],   # 1
    [0b111, 0b001, 0b111, 0b100, 0b111],   # 2
    [0b111, 0b001, 0b111, 0b001, 0b111],   # 3
    [0b101, 0b101, 0b111, 0b001, 0b001],   # 4
    [0b111, 0b100, 0b111, 0b001, 0b111],   # 5
    [0b111, 0b100, 0b111, 0b101, 0b111],   # 6
    [0b111, 0b001, 0b010, 0b010, 0b010],   # 7
    [0b111, 0b101, 0b111, 0b101, 0b111],   # 8
    [0b111, 0b101, 0b111, 0b001, 0b111],   # 9
], jnp.int32)


def _digit_overlay(img, values, block: int = 32, scale: int = 3):
    """Draw each 32px block's floor(value) as a bitmap digit (white on
    dark pad) in its top-left corner; negative values draw nothing."""
    h, w = values.shape
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # value at each pixel's BLOCK ORIGIN so the whole block agrees
    v = values[(py // block) * block, (px // block) * block]
    d = jnp.clip(jnp.floor(v), 0, 9).astype(jnp.int32)
    ly = py % block - 2
    lx = px % block - 2
    fy = ly // scale
    fx = lx // scale
    inside = ((ly >= 0) & (lx >= 0) & (fy < 5) & (fx < 3) & (v >= 0))
    rows = _DIGITS[d, jnp.clip(fy, 0, 4)]
    on = ((rows >> (2 - jnp.clip(fx, 0, 2))) & 1) == 1
    pad = ((ly >= -1) & (lx >= -1) & (fy <= 5) & (fx <= 3) & (v >= 0))
    img = jnp.where(pad[..., None], img * 0.35, img)
    return jnp.where((inside & on)[..., None], 1.0, img)


def debug_view(gb: dict, mode: int, extras: dict | None = None):
    """Static debug visualizations of GBuffer / intermediate planes."""
    m = unpack_gbuffer(gb)
    extras = extras or {}
    if mode == DEBUG_ALBEDO:
        return m['albedo']
    if mode == DEBUG_NORMAL:
        return m['normal'] * 0.5 + 0.5
    if mode == DEBUG_ROUGHNESS:
        return jnp.repeat(m['roughness'][..., None], 3, -1)
    if mode == DEBUG_METALLIC:
        return jnp.repeat(m['metallic'][..., None], 3, -1)
    if mode == DEBUG_EMISSIVE:
        return m['emissive']
    if mode == DEBUG_DEPTH:
        d = m['depth']
        return jnp.repeat((d / jnp.maximum(d.max(), 1e-8))[..., None], 3, -1)
    if mode == DEBUG_MOTION and 'motion' in extras:
        mo = extras['motion']
        return jnp.stack([jnp.abs(mo[..., 0]), jnp.abs(mo[..., 1]),
                          jnp.zeros_like(mo[..., 0])], -1) * 0.1
    if mode == DEBUG_SHADOW and 'shadow' in extras:
        return jnp.repeat(extras['shadow'][..., None], 3, -1)
    if mode == DEBUG_AO and 'ao' in extras:
        return jnp.repeat(extras['ao'][..., None], 3, -1)
    if mode == DEBUG_UV and 'uv' in extras:
        uv = extras['uv']
        return jnp.stack([uv[..., 0] % 1.0, uv[..., 1] % 1.0,
                          jnp.zeros_like(uv[..., 0])], -1)
    if mode == DEBUG_MIP and 'tex_desired_mip' in extras:
        # mip heatmap: fine mips hot (red), coarse cool (blue), no-tex
        # grey — plus per-32px-block DIGIT overlays of the mip value
        # (visualizeminmip.hlsl SDF-digit parity)
        m = extras['tex_desired_mip']
        t = jnp.clip(m / 10.0, 0.0, 1.0)
        color = jnp.stack([1.0 - t, 0.2 + 0.3 * t, t], -1)
        img = jnp.where((m >= 0)[..., None], color, 0.3)
        return _digit_overlay(img, m)
    if mode == DEBUG_MESHLET and 'tri_id' in extras:
        tid = jnp.maximum(extras['tri_id'], 0) // 96
        c = (tid.astype(jnp.uint32) * jnp.uint32(2654435761))
        return jnp.stack([
            ((c >> 0) & 0xFF).astype(jnp.float32) / 255.0,
            ((c >> 8) & 0xFF).astype(jnp.float32) / 255.0,
            ((c >> 16) & 0xFF).astype(jnp.float32) / 255.0], -1)
    return m['albedo']
