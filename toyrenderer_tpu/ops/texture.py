"""Device-side texture sampling from the flat mip atlas.

The shading equivalent of the reference's bindless material sampling
(lightingcommon.hlsli:358-406: ResourceDescriptorHeap fetch + anisotropic
sampler + sampler-feedback write + MinMip residency clamp).  Here: dynamic
gathers into the flat u32 atlas with bilinear filtering, analytic
mip selection from UV derivatives, and the same min-resident-mip clamp the
virtual-texture system uses.
"""

from __future__ import annotations

import jax.numpy as jnp

from toyrenderer_tpu.ops.packing import unpack_rgba8_u32
from toyrenderer_tpu.scene.textures import MAX_MIPS, WRAP_REPEAT


def mip_from_derivatives(duv_dx, duv_dy, width, height):
    """Standard isotropic LOD: log2 of the max screen footprint in texels."""
    fx = jnp.square(duv_dx[..., 0] * width) + jnp.square(
        duv_dx[..., 1] * height)
    fy = jnp.square(duv_dy[..., 0] * width) + jnp.square(
        duv_dy[..., 1] * height)
    rho2 = jnp.maximum(jnp.maximum(fx, fy), 1e-12)
    return 0.5 * jnp.log2(rho2)


def sample_texture(atlas: dict, tex_id, uv, duv_dx=None, duv_dy=None,
                   feedback: bool = False, wrap=None, base_wh=None):
    """Bilinear sample (..., 4) RGBA in [0,1].

    tex_id (...,) i32 (values < 0 sample white), uv (..., 2),
    duv_dx/duv_dy optional (..., 2) analytic derivatives for mip select.
    feedback=True additionally returns the per-pixel desired mip (for the
    sampler-feedback/virtual-texture loop).

    Per-pixel memory traffic is exactly TWO row gathers: one packed
    descriptor row [offset, w, h] (mip clamping + residency redirection
    baked at build, see TextureAtlas.packed_desc) and one 2x2 texel quad.
    `wrap`/`base_wh` can be supplied per-pixel (e.g. baked into resolve
    records) to avoid two more tiny-table gathers.
    """
    tid = jnp.maximum(tex_id, 0)
    if base_wh is None:
        d0 = atlas['tex_desc'][tid * MAX_MIPS]
        w0 = d0[..., 1].astype(jnp.float32)
        h0 = d0[..., 2].astype(jnp.float32)
    else:
        w0, h0 = base_wh
    if wrap is None:
        wrap = atlas['tex_wrap'][tid]

    if duv_dx is not None:
        desired = mip_from_derivatives(duv_dx, duv_dy, w0, h0)
    else:
        desired = jnp.zeros(uv.shape[:-1], jnp.float32)
    mip = jnp.clip(jnp.round(desired), 0.0,
                   MAX_MIPS - 1.0).astype(jnp.int32)

    row = atlas['tex_desc'][tid * MAX_MIPS + mip]         # (..., 4)
    off = row[..., 0]
    mw = row[..., 1]
    mh = row[..., 2]

    u = uv[..., 0] * mw.astype(jnp.float32) - 0.5
    v = uv[..., 1] * mh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    # single quad-row gather: the atlas row holds the full 2x2 footprint
    # (wrap mode baked at build), so only the BASE texel needs wrapping
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    rep_x = jnp.mod(x0i, jnp.maximum(mw, 1))
    rep_y = jnp.mod(y0i, jnp.maximum(mh, 1))
    x = jnp.where(wrap == WRAP_REPEAT, rep_x, jnp.clip(x0i, 0, mw - 1))
    y = jnp.where(wrap == WRAP_REPEAT, rep_y, jnp.clip(y0i, 0, mh - 1))
    idx = jnp.clip(off + y * mw + x, 0, atlas['tex_texels'].shape[0] - 1)
    quad = unpack_rgba8_u32(atlas['tex_texels'][idx])   # (..., 4, 4)
    c = ((quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx) * (1 - fy)
         + (quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx) * fy)
    c = jnp.where((tex_id >= 0)[..., None], c, 1.0)
    if feedback:
        return c, desired
    return c


def texture_feedback(tex_id, desired_mip, num_textures: int):
    """Reduce per-pixel desired mips to a per-texture minimum — the
    sampler-feedback readback equivalent (TextureFeedbackManager consumes
    this on the host).  Returns (num_textures,) f32; +inf where unused.

    Small texture counts use masked VPU reductions (scatter-based
    segment_min is slow on TPU); large counts fall back to segment_min.
    """
    import jax
    if num_textures <= 64:
        flat_id = tex_id.reshape(-1)
        flat_mip = desired_mip.reshape(-1)
        outs = []
        for t in range(num_textures):
            outs.append(jnp.min(jnp.where(flat_id == t, flat_mip,
                                          jnp.inf)))
        return jnp.stack(outs)
    flat_id = jnp.where(tex_id >= 0, tex_id, num_textures).reshape(-1)
    flat_mip = desired_mip.reshape(-1)
    mins = jax.ops.segment_min(flat_mip, flat_id,
                               num_segments=num_textures + 1)
    return mins[:num_textures]
