"""Visibility-buffer resolve -> packed GBuffer + motion vectors.

The reference's pixel shader (PS_Main_GBuffer, source/shaders/basepass.hlsl:
190-253) samples materials and packs the GBuffer during rasterization.  On
TPU the raster loop stays minimal (see raster.py) and THIS dense per-pixel
pass does the equivalent work afterwards, packing the same 4x uint32
GBuffer encodings as lightingcommon.hlsli:28-57 (albedo RGBA8 / octahedral
normal / RGB9E5 emissive / roughness+metallic).

Bandwidth design: gathering 10+ separate attribute arrays per pixel is
gather-latency bound on TPU.  Instead `pack_resolve_records` resolves
everything to ONE dense (T, 48) f32 record per triangle (world-space
vertex normals, UVs, previous-frame clip positions, material constants) —
those gathers run over T triangles, not H*W pixels — and the per-pixel
stage does a single contiguous row gather + pure VPU math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.mathlib.transforms import normalize
from toyrenderer_tpu.ops import packing as P

RESOLVE_REC = 64
# record layout (f32 slots):
#   0:9   edge equations        9:12  inv_scale
#  12:21  world-space vertex normals (3 x 3)
#  21:27  vertex UVs (3 x 2)
#  27:36  previous-frame clip x,y,w per vertex (3 x 3)
#  36:40  base color RGBA      40:42  metallic, roughness
#  42:45  emissive             45    material id
#  46     material atlas entry (-1 none; see scene/textures.py)
#  47     texture statics A: w0 + 4096*wrap (small values: the hi/lo
#         bf16 MXU fetch is exact to ~2^-18 relative, so packed statics
#         must stay < ~2^14 to survive the round trip)
#  48     alpha cutoff (alpha-masked set)
#  49:58  world-space vertex positions (3 x 3) — for the per-pixel
#         cotangent frame (normal mapping, toyrenderer_common.hlsli:
#         235-247 CalculateTBNWithoutTangent parity)
#  58     texture statics B: h0
#  59:64  padding


def pack_resolve_records(setup: dict, scene, inst_world, inst_adj,
                         prev_inst_world, prev_view_proj_nojit):
    """(T, 64) f32 per-triangle resolve records (dense over triangles).

    Texture statics (base size, wrap) ride in the record so per-pixel
    sampling never touches the tiny per-texture tables."""
    t = setup['valid'].shape[0]
    vids = setup['vtx_ids']                                # (T, 3)
    inst = setup['inst_id']
    mat = setup['mat_id']

    # fold prev view-proj into the per-INSTANCE matrices (N ~ hundreds)
    # before any dense transform
    prev_mat = jnp.einsum('ij,njk->nik', prev_view_proj_nojit,
                          prev_inst_world)

    pm = setup.get('pair_meshlet')
    if (pm is not None and getattr(scene, 'ml_verts', None) is not None
            and t == pm.shape[0] * 96):
        # meshlet-window fetch: per-vertex attribute gathers are
        # latency-bound (~3.8M random rows/frame on the courtyard — the
        # measured record-pack whale, scene.{normals,uvs,positions}[vids]
        # at (T, 3) rate).  Instead fetch each pair's 64-vertex WINDOW
        # as one contiguous block, transform at window rate (64/pair vs
        # 288 tri-verts/pair), and assemble per-triangle attributes with
        # an EXACT one-hot matmul (one nonzero per row; HIGHEST
        # precision makes the select bit-faithful on the MXU).
        p_in = setup['pair_inst']
        win = scene.ml_verts[pm]                           # (Tp, 64, 8)
        lt = scene.ml_local_tris[pm]                       # (Tp, 96, 3)
        wpos, wnrm, wuv = win[..., 0:3], win[..., 3:6], win[..., 6:8]
        wpos_h = jnp.concatenate(
            [wpos, jnp.ones_like(wpos[..., :1])], -1)      # (Tp, 64, 4)
        # vertex normals stay UNNORMALIZED (uniform per-tri scale; the
        # per-pixel normalize after interpolation recovers direction)
        nrm_w = jnp.einsum('tij,tkj->tki', inst_adj[p_in], wnrm)
        prevc = jnp.einsum('tij,tkj->tki', prev_mat[p_in], wpos_h)
        prevc = prevc[..., jnp.asarray([0, 1, 3])]         # (Tp, 64, 3)
        worldp = jnp.einsum('tij,tkj->tki', inst_world[p_in],
                            wpos_h)[..., :3]
        feats = jnp.concatenate([nrm_w, wuv, prevc, worldp], -1)
        oh = (lt[..., None]
              == jnp.arange(win.shape[1], dtype=lt.dtype)
              ).astype(feats.dtype)                        # (Tp, 96, 3, 64)
        tri = jnp.einsum('tmvk,tkc->tmvc', oh, feats,
                         precision=jax.lax.Precision.HIGHEST)
        tri = tri.reshape(t, 3, feats.shape[-1])
        n_w = tri[..., 0:3]
        uv = tri[..., 3:5]
        prev_xyw = tri[..., 5:8]
        world_pos = tri[..., 8:11]
    else:
        # per-vertex gather fallback (scenes without window tables)
        n_obj = scene.normals[vids]                        # (T, 3, 3)
        adj = inst_adj[inst]                               # (T, 3, 3)
        n_w = jnp.einsum('tij,tvj->tvi', adj, n_obj)
        uv = scene.uvs[vids]                               # (T, 3, 2)
        obj = scene.positions[vids]                        # (T, 3, 3)
        obj_h = jnp.concatenate([obj, jnp.ones_like(obj[..., :1])], -1)
        prev_clip = jnp.einsum('tij,tvj->tvi', prev_mat[inst], obj_h)
        prev_xyw = prev_clip[..., jnp.asarray([0, 1, 3])]  # (T, 3, 3)
        cw = inst_world[inst]                              # (T, 4, 4)
        world_pos = jnp.einsum('tij,tvj->tvi', cw, obj_h)[..., :3]

    base = scene.mat_base_color[mat]                       # (T, 4)
    mr = scene.mat_metal_rough[mat]                        # (T, 2)
    emis = scene.mat_emissive[mat]                         # (T, 3)

    # texture statics resolved per MATERIAL first (M is tiny), then ONE
    # per-triangle gather — chaining tex -> width/height/wrap gathers at
    # T rate costs ~2 ms/frame at 100k triangles (gathers are
    # latency-bound regardless of table size)
    m_tex = scene.mat_base_color_tex                       # (M,)
    if getattr(scene, 'tex_analytic', False):
        # analytic-descriptor encoding: tex + 64*base11 (< 2^16, exact
        # through the fill kernel's hi/lo bf16 fetch); base11 is the
        # ATLAS_ALIGN-aligned chain base.  finish_gbuffer decodes; the
        # sampler can then derive mip offsets/sizes from w0/h0 without
        # the per-quad descriptor-row gather (scene/textures.py notes)
        from toyrenderer_tpu.scene.textures import ATLAS_ALIGN
        m_base = (scene.tex_offset[jnp.maximum(m_tex, 0), 0]
                  // ATLAS_ALIGN)
        m_tex = jnp.where(m_tex >= 0, m_tex + 64 * m_base, -1)
    m_safe = jnp.maximum(scene.mat_base_color_tex, 0)
    m_statics_a = (scene.tex_width[m_safe, 0]
                   + 4096 * scene.tex_wrap[m_safe])        # (M,)
    m_h0 = scene.tex_height[m_safe, 0]
    tex = m_tex[mat]
    tex_statics_a = m_statics_a[mat]
    th0 = m_h0[mat]

    return jnp.concatenate([
        setup['edges'].reshape(t, 9),
        setup['inv_s'],
        n_w.reshape(t, 9),
        uv.reshape(t, 6),
        prev_xyw.reshape(t, 9),
        base, mr, emis,
        mat.astype(jnp.float32)[:, None],
        tex.astype(jnp.float32)[:, None],
        tex_statics_a.astype(jnp.float32)[:, None],
        scene.mat_alpha_cutoff[mat][:, None],
        world_pos.reshape(t, 9),
        th0.astype(jnp.float32)[:, None],
        jnp.zeros((t, 5), jnp.float32),
    ], axis=1)


# interpolant plane stack: the per-pixel quantities that survive the
# barycentric resolve, stored CHANNEL-FIRST as (INTERP_C, H, W) planes —
# the layout the Pallas kernel emits directly (each plane is a clean
# (H, W) array, no strided channel slicing downstream).  The fused
# kernel computes these IN VMEM (_fill_resolve_stream_kernel epilogue)
# so only 32 planes leave the kernel instead of the raw 64-float
# records; the CPU path computes the identical stack in XLA
# (resolve_interpolants).
INTERP_C = 32
I_NRM = slice(0, 3)      # interpolated (normalized) world normal
I_UV = slice(3, 5)       # interpolated UV
I_DUVX = slice(5, 7)     # analytic dUV/dx
I_DUVY = slice(7, 9)     # analytic dUV/dy
I_T = slice(9, 12)       # cotangent T (max-normalized; 0 if degenerate)
I_B = slice(12, 15)      # cotangent B
I_BASE = slice(15, 19)   # material base color factor RGBA
I_MR = slice(19, 21)     # metallic, roughness factors
I_EMIS = slice(21, 24)   # emissive factor
I_MAT = 24               # material id (f32-exact)
I_TEX = 25               # material atlas entry (-1 none)
I_WS = 26                # texture statics A (w0 + 4096*wrap)
I_CUT = 27               # alpha cutoff
I_PREV = slice(28, 31)   # previous-frame clip x, y, w
I_H0 = 31                # texture statics B (h0)


def resolve_interpolants(records, depth, tri_id, cfg, pixel_xy=None,
                         screen_wh=None):
    """Per-pixel barycentric resolve: (T, 64) records + visibility buffer
    -> (INTERP_C, H, W) interpolant planes (see layout above).

    This is the XLA reference for the Pallas kernel's in-VMEM epilogue;
    tests assert the two match.

    pixel_xy/screen_wh: compacted images (masked_peel_merge_compact) carry
    pixels from arbitrary screen locations — pass their true pixel
    centers and the real screen size (edge equations are normalized to
    screen units).
    """
    h, w = depth.shape
    sw, sh = (w, h) if screen_wh is None else screen_wh
    tid = jnp.maximum(tri_id, 0)

    if records.ndim == 3:
        rec = records          # (H, W, R) pre-fetched
    else:
        rec = records[tid]     # (T, R) -> per-pixel gather (CPU path)
    if pixel_xy is None:
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    else:
        px, py = pixel_xy
    pxn = px / sw
    pyn = py / sh

    e = rec[..., 0:9].reshape(h, w, 3, 3)
    uvs3 = rec[..., 21:27].reshape(h, w, 3, 2)
    pos3 = rec[..., 49:58].reshape(h, w, 3, 3)

    def bary_at(dpx, dpy):
        l = (e[..., 0] * (pxn + dpx / sw)[..., None]
             + e[..., 1] * (pyn + dpy / sh)[..., None] + e[..., 2])
        lw = l * rec[..., 9:12]
        d = jnp.sum(lw, -1, keepdims=True)
        return lw / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)

    pc = bary_at(0.0, 0.0)                                 # (H, W, 3)
    n_w = normalize(jnp.sum(rec[..., 12:21].reshape(h, w, 3, 3)
                            * pc[..., None], axis=-2))
    uv = jnp.sum(uvs3 * pc[..., None], axis=-2)
    prev_xyw = jnp.sum(rec[..., 27:36].reshape(h, w, 3, 3)
                       * pc[..., None], axis=-2)           # (H, W, 3)

    # analytic UV / world-position derivatives: re-evaluate the
    # interpolation one pixel right / below (pure register math)
    pc_x = bary_at(1.0, 0.0)
    pc_y = bary_at(0.0, 1.0)
    duv_dx = jnp.sum(uvs3 * pc_x[..., None], axis=-2) - uv
    duv_dy = jnp.sum(uvs3 * pc_y[..., None], axis=-2) - uv
    pos = jnp.sum(pos3 * pc[..., None], axis=-2)
    dp1 = jnp.sum(pos3 * pc_x[..., None], axis=-2) - pos
    dp2 = jnp.sum(pos3 * pc_y[..., None], axis=-2) - pos

    # cotangent frame (Schueler; CalculateTBNWithoutTangent parity,
    # toyrenderer_common.hlsli:235-247); degenerate UVs -> T = B = 0
    dp1perp = jnp.cross(n_w, dp1)
    dp2perp = jnp.cross(dp2, n_w)
    t_vec = (dp2perp * duv_dx[..., 0:1] + dp1perp * duv_dy[..., 0:1])
    b_vec = (dp2perp * duv_dx[..., 1:2] + dp1perp * duv_dy[..., 1:2])
    m2 = jnp.maximum(jnp.sum(t_vec * t_vec, -1),
                     jnp.sum(b_vec * b_vec, -1))
    inv_max = jax.lax.rsqrt(jnp.maximum(m2, 1e-20))[..., None]
    # degenerate/constant UVs make duv pure f32 rounding noise (~1e-7);
    # gate on |duv|^2 so the frame is zeroed instead of normalized noise
    duv2 = (jnp.sum(duv_dx * duv_dx, -1) + jnp.sum(duv_dy * duv_dy, -1))
    ok_tbn = ((m2 > 1e-16) & (duv2 > 1e-12))[..., None]
    t_n = jnp.where(ok_tbn, t_vec * inv_max, 0.0)
    b_n = jnp.where(ok_tbn, b_vec * inv_max, 0.0)

    stack = jnp.concatenate([
        n_w, uv, duv_dx, duv_dy, t_n, b_n,
        rec[..., 36:40],                        # base color factor
        rec[..., 40:42],                        # metallic, roughness
        rec[..., 42:45],                        # emissive
        rec[..., 45:46],                        # material id
        rec[..., 46:47],                        # atlas entry
        rec[..., 47:48],                        # texture statics A
        rec[..., 48:49],                        # alpha cutoff
        prev_xyw,
        rec[..., 58:59],                        # texture statics B (h0)
    ], axis=-1)
    return jnp.moveaxis(stack, -1, 0)           # channel-first planes


def finish_gbuffer(interp, depth, tri_id, jitter, cfg, atlas=None,
                   num_textures: int = 0, quad_taps: bool = False,
                   aniso: int = 1, emit_planes: bool = True,
                   pixel_xy=None, screen_wh=None):
    """Interpolant planes (INTERP_C, H, W) -> textured, packed GBuffer.

    jitter: (2,) current sub-pixel jitter in pixels (for unjittered motion
    vectors, like the reference's motion output).
    atlas: optional texture-atlas dict (DeviceScene.atlas_dict()) — enables
    material texturing with analytic-derivative mip selection and emits
    'tex_feedback' (per-texture min desired mip, the sampler-feedback
    equivalent).
    pixel_xy/screen_wh: compacted images (masked_peel_merge_compact) carry
    pixels from arbitrary screen locations — their true pixel centers and
    the real screen size (motion vectors are in screen units).
    """
    h, w = depth.shape
    sw, sh = (w, h) if screen_wh is None else screen_wh
    hit = tri_id >= 0
    if pixel_xy is None:
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    else:
        px, py = pixel_xy

    def ch(sl):
        """Plane group -> channel-last (H, W, k) view (fuses: a transpose
        feeding elementwise consumers is an index remap, not a copy)."""
        return jnp.moveaxis(interp[sl], 0, -1)

    n_w = ch(I_NRM)
    uv = ch(I_UV)
    prev_xyw = ch(I_PREV)
    pw_safe = jnp.where(jnp.abs(prev_xyw[..., 2:3]) < 1e-8, 1e-8,
                        prev_xyw[..., 2:3])
    prev_ndc = prev_xyw[..., :2] / pw_safe
    prev_px = jnp.stack([(prev_ndc[..., 0] * 0.5 + 0.5) * sw,
                         (0.5 - prev_ndc[..., 1] * 0.5) * sh], -1)
    cur_px = jnp.stack([px - jitter[0], py - jitter[1]], -1)
    motion = jnp.where((hit & (prev_xyw[..., 2] > 0))[..., None],
                       cur_px - prev_px, 0.0)

    base_color = ch(I_BASE)
    metal = jnp.clip(interp[19], 0.0, 1.0)
    rough = jnp.clip(interp[20], 0.02, 1.0)
    emissive = jnp.maximum(ch(I_EMIS), 0.0)
    mat_id = interp[I_MAT].astype(jnp.uint32)

    tex_feedback = None
    if atlas is not None:
        from toyrenderer_tpu.ops.texture import (
            sample_material_maps, sample_material_maps_quad,
            srgb_to_linear, texture_feedback)
        tex_id = interp[I_TEX].astype(jnp.int32)
        tex_id = jnp.where(hit, tex_id, -1)
        base_rows = None
        if atlas.get('_enc'):
            # records carry tex + 64*base11 (pack_resolve_records);
            # decode the plain id (feedback/neutral checks) and, when
            # no streaming override is live, the chain base for the
            # gather-free analytic descriptor path
            from toyrenderer_tpu.scene.textures import ATLAS_ALIGN
            plain = jnp.where(tex_id >= 0, tex_id % 64, -1)
            if atlas.get('_analytic'):
                base_rows = jnp.where(
                    tex_id >= 0, (tex_id // 64) * ATLAS_ALIGN, 0)
            tex_id = plain
        duv_dx = ch(I_DUVX)
        duv_dy = ch(I_DUVY)
        statics = jnp.round(interp[I_WS]).astype(jnp.int32)
        tw0 = (statics % 4096).astype(jnp.float32)
        twrap = statics // 4096
        th0 = jnp.round(interp[I_H0])
        if quad_taps and aniso <= 1 and h % 2 == 0 and w % 2 == 0:
            maps = sample_material_maps_quad(
                atlas, tex_id, uv, duv_dx, duv_dy,
                wrap=twrap, base_wh=(tw0, th0), base_rows=base_rows)
        else:
            maps = sample_material_maps(
                atlas, tex_id, uv, duv_dx, duv_dy,
                wrap=twrap, base_wh=(tw0, th0), aniso=aniso,
                base_rows=base_rows)
        desired = maps['desired']
        tex_rgba = jnp.concatenate(
            [srgb_to_linear(maps['base'][..., :3]),
             maps['base'][..., 3:4]], -1)
        base_color = base_color * tex_rgba
        # glTF MR texture: G = roughness, B = metallic, factors multiply
        rough = rough * maps['mr'][..., 1]
        metal = metal * maps['mr'][..., 2]
        emissive = emissive * srgb_to_linear(maps['emissive'][..., :3])

        # normal mapping in the precomputed cotangent frame
        t_n = ch(I_T)
        b_n = ch(I_B)
        n_ts = maps['normal'][..., :3] * 2.0 - 1.0
        n_mapped = normalize(t_n * n_ts[..., 0:1] + b_n * n_ts[..., 1:2]
                             + n_w * n_ts[..., 2:3])
        ok_tbn = (jnp.maximum(jnp.sum(t_n * t_n, -1),
                              jnp.sum(b_n * b_n, -1)) > 0.0)
        n_w = jnp.where((ok_tbn & (tex_id >= 0))[..., None],
                        n_mapped, n_w)
        tex_feedback = texture_feedback(tex_id, desired, num_textures)
        desired_plane = jnp.where(hit & (tex_id >= 0), desired, -1.0)
        if 'tile_id' in maps:
            from toyrenderer_tpu.ops.texture import vt_tile_feedback
            vt_feedback = vt_tile_feedback(
                jnp.where(hit, maps['tile_id'], -1), desired,
                atlas['tex_tile_table'].shape[0])
        else:
            vt_feedback = None

    g0 = P.pack_rgba8_u32(base_color)
    g1 = P.pack_normal_oct_u32(n_w)
    g2 = P.pack_rgb9e5_u32(emissive)
    g3 = (P.pack_rgba8_u32(jnp.stack(
        [rough, metal, jnp.zeros_like(rough), jnp.zeros_like(rough)], -1))
        | (jnp.minimum(mat_id, 0xFFFF) << 16))
    zero = jnp.uint32(0)
    alpha = jnp.where(hit, base_color[..., 3], 0.0)
    out = dict(
        alpha=alpha,
        alpha_cutoff=interp[I_CUT],
        gbuffer0=jnp.where(hit, g0, zero),
        gbuffer1=jnp.where(hit, g1, zero),
        gbuffer2=jnp.where(hit, g2, zero),
        gbuffer3=jnp.where(hit, g3, zero),
        motion=motion,
        depth=depth,
        uv=jnp.where(hit[..., None], uv, 0.0),
    )
    if emit_planes:
        # float shading planes alongside the packed channels: inside the
        # single frame jit, consumers prefer these (unpack_gbuffer), so
        # XLA dead-code-eliminates the pack/unpack round trip (~9.6 ms
        # of u32 bit ops at 1080p) unless parity mode (pack_gbuffer)
        # keeps the packed form as the only medium — the reference
        # stores GBufferA as RGBA32_UINT because its passes are separate
        # dispatches; one fused program has no such boundary
        h3 = hit[..., None]
        out['albedo_f'] = jnp.where(h3, base_color[..., :3], 0.0)
        out['normal_f'] = jnp.where(h3, n_w, 0.0)
        out['emissive_f'] = jnp.where(h3, emissive, 0.0)
        out['rough_f'] = jnp.where(hit, rough, 0.0)
        out['metal_f'] = jnp.where(hit, metal, 0.0)
    if tex_feedback is not None:
        out['tex_feedback'] = tex_feedback
        out['tex_desired_mip'] = desired_plane
        if vt_feedback is not None:
            out['vt_tile_feedback'] = vt_feedback
    return out


def resolve_gbuffer(records, depth, tri_id, jitter, cfg, atlas=None,
                    num_textures: int = 0, quad_taps: bool = False,
                    aniso: int = 1, emit_planes: bool = True):
    """Per-pixel resolve + GBuffer pack from either input form:
      * (T, 64) raw records + visibility buffer -> resolve_interpolants
        then finish_gbuffer (the XLA path), or
      * (INTERP_C, H, W) interpolant planes straight from the Pallas fill
        kernel's in-VMEM epilogue -> finish_gbuffer directly."""
    if records.ndim == 3 and records.shape[0] == INTERP_C:
        interp = records
    else:
        interp = resolve_interpolants(records, depth, tri_id, cfg)
    return finish_gbuffer(interp, depth, tri_id, jitter, cfg, atlas=atlas,
                          num_textures=num_textures, quad_taps=quad_taps,
                          aniso=aniso, emit_planes=emit_planes)


def unpack_gbuffer(gb: dict):
    """GBuffer channels -> shading inputs (lightingcommon.hlsli unpack).
    Prefers the full-precision float planes when present (the fused-jit
    fast path); falls back to unpacking the reference-parity packed
    channels (pack_gbuffer mode / snapshot replay)."""
    if 'albedo_f' in gb:
        return dict(albedo=gb['albedo_f'], normal=gb['normal_f'],
                    emissive=gb['emissive_f'], roughness=gb['rough_f'],
                    metallic=gb['metal_f'], depth=gb['depth'])
    albedo = P.unpack_rgba8_u32(gb['gbuffer0'])
    normal = P.unpack_normal_oct_u32(gb['gbuffer1'])
    emissive = P.unpack_rgb9e5_u32(gb['gbuffer2'])
    rm = P.unpack_rgba8_u32(gb['gbuffer3'] & jnp.uint32(0xFFFF))
    return dict(albedo=albedo[..., :3], normal=normal, emissive=emissive,
                roughness=rm[..., 0], metallic=rm[..., 1],
                depth=gb['depth'])


def masked_peel_merge_compact(records, peel_depth, peel_tid, jitter, cfg,
                              cap_quads, atlas=None, num_textures: int = 0,
                              quad_taps: bool = False, aniso: int = 1,
                              emit_planes: bool = True, channels=None):
    """ALL masked peel layers -> merged winner channels in ONE compact
    pass, un-compacted by a single full-res GATHER (no scatter).

    The reference alpha-tests cutout fragments inside the base-pass PS
    (basepass.hlsl ALPHA_MASK_MODE discard) so the nearest PASSING
    fragment wins for free.  The TPU equivalent peels L visibility
    layers (fill_peel_stream, occluder-seeded so only fragments in
    front of the opaque surface survive), then must texture each layer
    to learn its alpha — but masked geometry covers a small screen
    fraction, so texturing full-screen per layer (~12 ms each at 1080p)
    is almost all waste.  This compacts the 2x2 pixel quads that contain
    ANY peel fragment, resolves + textures EVERY layer at compact rate,
    picks the nearest alpha-passing fragment per pixel in compact space,
    and expands only the winner's merge channels back to full res.

    vs the earlier per-layer compact resolve with a full-res SCATTER
    back (removed): the packed scatter alone cost ~12 ms/layer at 1080p
    and the per-layer sort/gather fixed costs repeated; here the sort,
    the un-compaction (one gather: quad -> compact slot from a cumsum
    rank) and the full-res merge run ONCE for all layers.

    Quads beyond cap_quads drop their fragments (bounded-amplification
    semantics — same contract as the pair lists).  Returns full-res
    {'passes' (H, W) bool, 'depth', 'tri_id', <merge channels>}; the
    caller jnp.where's them over the opaque GBuffer.
    """
    L, H, W = peel_tid.shape
    assert H % 2 == 0 and W % 2 == 0
    hq, wq = H // 2, W // 2
    q = hq * wq
    C = 256
    R = max(-(-int(min(cap_quads, q)) // C), 4)
    cap = R * C

    hit_any = (peel_tid >= 0).any(axis=0)                  # (H, W)
    hitq_img = hit_any.reshape(hq, 2, wq, 2).any(axis=(1, 3))
    hitq = hitq_img.reshape(-1)
    # ascending-q order of hit quads == cumsum rank (both stable), so
    # the build side (sort) and the expand side (cumsum) agree on slots
    key = jnp.where(hitq, jnp.arange(q, dtype=jnp.int32), jnp.int32(q))
    order = jax.lax.sort(key)[:cap]
    okq = order < q
    oq = jnp.where(okq, order, 0)
    qy = oq // wq
    qx = oq % wq
    d2 = jnp.arange(2, dtype=jnp.int32)
    py_i = 2 * qy[:, None, None] + d2[None, :, None]       # (cap, 2, 1)
    px_i = 2 * qx[:, None, None] + d2[None, None, :]       # (cap, 1, 2)
    flat_v = (py_i * W + px_i).reshape(-1)                 # (cap*4,)

    def quads_to_img(v):
        rest = v.shape[3:]
        v = v.reshape(R, C, 2, 2, *rest)
        v = jnp.moveaxis(v, 2, 1)
        return v.reshape(2 * R, 2 * C, *rest)

    # ONE packed gather pulls every layer's depth+tid into compact space
    dz = jnp.concatenate(
        [jnp.moveaxis(peel_depth, 0, -1),
         jax.lax.bitcast_convert_type(
             jnp.moveaxis(peel_tid, 0, -1), jnp.float32)], -1)
    img = quads_to_img(
        dz.reshape(H * W, 2 * L)[flat_v].reshape(cap, 2, 2, 2 * L))
    ok_img = quads_to_img(jnp.broadcast_to(
        okq[:, None, None], (cap, 2, 2)))
    pxc = quads_to_img(jnp.broadcast_to(
        px_i, (cap, 2, 2))).astype(jnp.float32)
    pyc = quads_to_img(jnp.broadcast_to(
        py_i, (cap, 2, 2))).astype(jnp.float32)
    pix = (pxc + 0.5, pyc + 0.5)

    # resolve + texture every layer at compact rate; nearest passing
    # fragment wins (layers arrive nearest-first from the peel fill)
    win = None
    depth_w = tid_w = None
    merged = {}
    want = None
    for li in range(L):
        depth_c = img[..., li]
        tid_c = jax.lax.bitcast_convert_type(img[..., L + li], jnp.int32)
        tid_c = jnp.where(ok_img, tid_c, -1)
        interp = resolve_interpolants(records, depth_c, tid_c, cfg,
                                      pixel_xy=pix, screen_wh=(W, H))
        gb_l = finish_gbuffer(interp, depth_c, tid_c, jitter, cfg,
                              atlas=atlas, num_textures=num_textures,
                              quad_taps=quad_taps, aniso=aniso,
                              emit_planes=emit_planes, pixel_xy=pix,
                              screen_wh=(W, H))
        # occluder-seeded peel: tid >= 0 already implies in front of the
        # opaque surface and depth > 0
        p_l = (gb_l['alpha'] >= gb_l['alpha_cutoff']) & (tid_c >= 0)
        sel = p_l if win is None else (p_l & ~win)
        if want is None:
            want = [k for k in gb_l
                    if k not in ('alpha', 'alpha_cutoff', 'depth',
                                 'tex_feedback', 'tex_desired_mip',
                                 'vt_tile_feedback', 'uv')
                    and (channels is None or k in channels)]
            if channels is not None and 'uv' in channels:
                want.append('uv')
        for k in want:
            v = gb_l[k]
            s = sel[..., None] if v.ndim == 3 else sel
            merged[k] = (jnp.where(s, v, 0)
                         if k not in merged
                         else jnp.where(s, v, merged[k]))
        depth_w = (jnp.where(sel, depth_c, 0.0) if depth_w is None
                   else jnp.where(sel, depth_c, depth_w))
        tid_w = (jnp.where(sel, tid_c, -1) if tid_w is None
                 else jnp.where(sel, tid_c, tid_w))
        win = p_l if win is None else (win | p_l)

    # pack winner channels (+ depth/tid) into one QUAD-rate row table —
    # all 4 pixels of a quad ride one row, so the expansion gather runs
    # at hq*wq rows (518k at 1080p), not H*W (gathers pay per ROW; the
    # per-pixel variant measured ~4x this pass).  'win' needs no lane:
    # tid_w is -1 exactly where no layer passed.
    names, widths, dtypes, parts = [], [], [], []
    for k in ['depth', 'tri_id'] + list(merged.keys()):
        v = {'depth': depth_w, 'tri_id': tid_w}.get(k, merged.get(k))
        names.append(k)
        dtypes.append(v.dtype)
        v2 = v[..., None] if v.ndim == 2 else v
        widths.append(v2.shape[-1])
        if k == 'tri_id':
            # tid rides as a FLOAT VALUE (exact to 2^24), not a bitcast:
            # the pad row needs a -1 tid constant, and a bitcast i32 -1
            # is an f32 NaN literal whose payload constant folding may
            # canonicalize (observed on TPU: pad tids read back >= 0,
            # every sky pixel "passed")
            v2 = v2.astype(jnp.float32)
        elif v2.dtype == jnp.bool_:
            v2 = v2.astype(jnp.uint32)
        if v2.dtype != jnp.float32:
            v2 = jax.lax.bitcast_convert_type(v2, jnp.float32)
        parts.append(v2)
    packed = jnp.concatenate(parts, -1)                    # (2R, 2C, ct)
    ct = packed.shape[-1]
    pq = jnp.moveaxis(packed.reshape(R, 2, C, 2, ct), 1, 2)
    # pad row for un-hit/overflow quads: every pixel's tri_id lane must
    # read -1 (passes = tri_id >= 0), everything else 0
    pad = jnp.zeros((4, ct), jnp.float32).at[:, 1].set(-1.0)
    table = jnp.concatenate(
        [pq.reshape(R * C, 4 * ct),                        # (cap, 4ct)
         pad.reshape(1, 4 * ct)], 0)

    slot = jnp.cumsum(hitq.astype(jnp.int32)) - 1          # rank
    validq = hitq & (slot < cap)
    idx = jnp.where(validq, slot, cap).reshape(hq, wq)
    rows_q = table[idx]                                    # ONE gather
    rows = jnp.moveaxis(
        rows_q.reshape(hq, wq, 2, 2, ct), 2, 1).reshape(H, W, ct)

    out = {}
    o = 0
    for k, wd, dt in zip(names, widths, dtypes):
        v = rows[..., o:o + wd]
        o += wd
        if k == 'tri_id':
            v = jnp.round(v).astype(jnp.int32)
        elif dt == jnp.bool_:
            v = jax.lax.bitcast_convert_type(v, jnp.uint32) > 0
        elif dt != jnp.float32:
            v = jax.lax.bitcast_convert_type(v, dt)
        out[k] = v[..., 0] if wd == 1 else v
    out['passes'] = out['tri_id'] >= 0
    return out
