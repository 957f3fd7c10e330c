"""Visibility-buffer resolve -> packed GBuffer + motion vectors.

The reference's pixel shader (PS_Main_GBuffer, source/shaders/basepass.hlsl:
190-253) samples materials and packs the GBuffer during rasterization.  On
TPU the raster loop stays minimal (see raster.py) and THIS dense per-pixel
pass does the equivalent work afterwards: recompute perspective-correct
barycentrics from the winning triangle's edge equations, interpolate
attributes, transform normals by the instance adjugate, compute motion
vectors from the previous frame's transforms, and pack the same 4x uint32
GBuffer encodings as lightingcommon.hlsli:28-57 (albedo RGBA8 / octahedral
normal / RGB9E5 emissive / roughness+metallic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.mathlib.transforms import normalize
from toyrenderer_tpu.ops import packing as P


def resolve_gbuffer(setup: dict, depth, tri_id, scene,
                    inst_world, inst_adj, prev_inst_world,
                    view_proj_nojit, prev_view_proj_nojit, cfg):
    """Returns dict with packed gbuffer channels + raw attribute planes.

    gbuffer0: u32 albedo RGBA8        gbuffer1: u32 octahedral normal
    gbuffer2: u32 emissive RGB9E5     gbuffer3: u32 roughness/metal/mat-id
    motion:   (H, W, 2) f32 pixel-space motion (cur - prev), no jitter
    depth:    (H, W) f32 reverse-Z (pass-through)
    """
    h, w = depth.shape
    hit = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)

    pxn = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    pyn = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h

    # homogeneous edge values -> perspective-correct barycentrics
    # (lambda_i ∝ L_i * inv_scale_i; see raster.py setup_triangles)
    from toyrenderer_tpu.ops.raster import eval_edges
    l = eval_edges(setup, tid, pxn, pyn)                   # (H, W, 3)
    lw = l * setup['inv_s'][tid]
    pc = lw / jnp.where(
        jnp.abs(jnp.sum(lw, -1, keepdims=True)) < 1e-30, 1e-30,
        jnp.sum(lw, -1, keepdims=True))

    vids = setup['vtx_ids'][tid]                           # (H, W, 3)
    inst = setup['inst_id'][tid]
    mat = setup['mat_id'][tid]

    def interp(attr_per_vertex):
        a = attr_per_vertex[vids]                          # (H, W, 3, K)
        return jnp.sum(a * pc[..., None], axis=-2)

    n_obj = interp(scene.normals)                          # (H, W, 3)
    uv = interp(scene.uvs)                                 # (H, W, 2)
    obj_pos = interp(scene.positions)                      # (H, W, 3)

    adj = inst_adj[inst]                                   # (H, W, 3, 3)
    n_world = normalize(jnp.einsum('...ij,...j->...i', adj, n_obj))

    # material fetch (textures arrive with the virtual-texture stage;
    # factors only for now, like the reference's untextured fallback)
    base_color = scene.mat_base_color[mat]                 # (H, W, 4)
    metal_rough = scene.mat_metal_rough[mat]               # (H, W, 2)
    emissive = scene.mat_emissive[mat]                     # (H, W, 3)

    # motion vectors: reproject the surface point with previous transforms
    wmat = inst_world[inst]                                # (H, W, 4, 4)
    pmat = prev_inst_world[inst]
    oh = jnp.concatenate([obj_pos, jnp.ones_like(obj_pos[..., :1])], -1)
    wp = jnp.einsum('...ij,...j->...i', wmat, oh)
    pp = jnp.einsum('...ij,...j->...i', pmat, oh)
    cur_clip = jnp.einsum('ij,...j->...i', view_proj_nojit, wp)
    prev_clip = jnp.einsum('ij,...j->...i', prev_view_proj_nojit, pp)

    def to_pixel(clip):
        ndc = clip[..., :2] / jnp.maximum(clip[..., 3:4], 1e-8)
        return jnp.stack([(ndc[..., 0] * 0.5 + 0.5) * w,
                          (0.5 - ndc[..., 1] * 0.5) * h], -1)
    motion = to_pixel(cur_clip) - to_pixel(prev_clip)
    motion = jnp.where(hit[..., None], motion, 0.0)

    rough = jnp.clip(metal_rough[..., 1], 0.02, 1.0)
    metal = jnp.clip(metal_rough[..., 0], 0.0, 1.0)
    g0 = P.pack_rgba8_u32(base_color)
    g1 = P.pack_normal_oct_u32(n_world)
    g2 = P.pack_rgb9e5_u32(jnp.maximum(emissive, 0.0))
    g3 = (P.pack_rgba8_u32(jnp.stack(
        [rough, metal, jnp.zeros_like(rough), jnp.zeros_like(rough)], -1))
        | (jnp.minimum(mat, 0xFFFF).astype(jnp.uint32) << 16))
    zero = jnp.uint32(0)
    return dict(
        gbuffer0=jnp.where(hit, g0, zero),
        gbuffer1=jnp.where(hit, g1, zero),
        gbuffer2=jnp.where(hit, g2, zero),
        gbuffer3=jnp.where(hit, g3, zero),
        motion=motion,
        depth=depth,
        uv=jnp.where(hit[..., None], uv, 0.0),
    )


def unpack_gbuffer(gb: dict):
    """GBuffer channels -> shading inputs (lightingcommon.hlsli unpack)."""
    albedo = P.unpack_rgba8_u32(gb['gbuffer0'])
    normal = P.unpack_normal_oct_u32(gb['gbuffer1'])
    emissive = P.unpack_rgb9e5_u32(gb['gbuffer2'])
    rm = P.unpack_rgba8_u32(gb['gbuffer3'] & jnp.uint32(0xFFFF))
    return dict(albedo=albedo[..., :3], normal=normal, emissive=emissive,
                roughness=rm[..., 0], metallic=rm[..., 1],
                depth=gb['depth'])
