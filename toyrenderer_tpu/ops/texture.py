"""Device-side texture sampling from the flat mip atlas.

The shading equivalent of the reference's bindless material sampling
(lightingcommon.hlsli:358-406: ResourceDescriptorHeap fetch + anisotropic
sampler + sampler-feedback write + MinMip residency clamp).  Here: dynamic
gathers into the flat u32 atlas with bilinear filtering, analytic
mip selection from UV derivatives, and the same min-resident-mip clamp the
virtual-texture system uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops.packing import unpack_rgba8_u32
from toyrenderer_tpu.scene.textures import MAX_MIPS, WRAP_REPEAT


VT_TILE = 64            # texels per tile side; one tile = 64*64 texel
VT_TILE_ROWS = VT_TILE * VT_TILE   # rows (4096 x 64B = 256KB: the 4-map
#                         equivalent of the reference's 64KB D3D12 tile)


def _texel_index(atlas: dict, row, x, y, mw):
    """Texel-row index for (x, y) of the mip described by desc `row`.

    Contiguous mips address offset + y*mw + x.  When the atlas carries a
    VT tile table ('tex_tile_table', engine/streaming.py
    TileStreamingManager) and the desc's slot 3 holds a tile base >= 0,
    the mip is stored as scattered 64x64-texel POOL TILES: the table maps
    (tile_base + tile-grid index) -> packed (delta << 24 | pool slot),
    where delta > 0 redirects to the co-located tile of a 2^delta coarser
    mip (per-REGION residency fallback — the RTXTS MinMip idea at tile
    granularity).  Quad-expanded rows are self-contained (each carries
    its own 2x2 footprint), so tiles never need neighbors.

    Returns (index, requested_tile_id) — tile id is -1 off the VT path.
    """
    base = row[..., 0]
    flat = base + y * mw + x
    if 'tex_tile_table' not in atlas:
        return flat, None
    table = atlas['tex_tile_table']
    tb = row[..., 3]
    wt = (mw + VT_TILE - 1) // VT_TILE
    tid = tb + (y // VT_TILE) * wt + (x // VT_TILE)
    ent = table[jnp.clip(tid, 0, table.shape[0] - 1)]
    delta = ent >> 24
    slot = ent & 0xFFFFFF
    xs = x >> delta
    ys = y >> delta
    idx_vt = (slot * VT_TILE_ROWS + (ys % VT_TILE) * VT_TILE
              + (xs % VT_TILE))
    vt = tb >= 0
    return jnp.where(vt, idx_vt, flat), jnp.where(vt, tid, -1)


def analytic_desc(w0, h0, mip):
    """Gather-free mip descriptor: (off_rel, mw, mh, mip_clamped).

    The atlas stores each texture's mips contiguously with floor-halving
    dims, so mip m lives at Σ_{j<m} max(w0>>j,1)*max(h0>>j,1) rows past
    the chain base and measures (max(w0>>m,1), max(h0>>m,1)) — an
    11-step vector loop instead of the per-quad descriptor-row gather
    (row gathers are latency-bound; this halves the sampler's gather
    count).  Mip clamps to the chain length floor(log2(max(w0,h0)))+1,
    matching the baked clamp of TextureAtlas.packed_desc for fully
    resident chains (streaming overrides keep the gather path).
    """
    w0i = jnp.maximum(w0.astype(jnp.int32), 1)
    h0i = jnp.maximum(h0.astype(jnp.int32), 1)
    nm = jnp.floor(jnp.log2(jnp.maximum(w0i, h0i).astype(jnp.float32)
                            )).astype(jnp.int32) + 1
    mip = jnp.minimum(mip, jnp.minimum(nm - 1, MAX_MIPS - 1))
    off = jnp.zeros_like(mip)
    for j in range(MAX_MIPS - 1):
        off = off + jnp.where(
            mip > j,
            jnp.maximum(w0i >> j, 1) * jnp.maximum(h0i >> j, 1), 0)
    mw = jnp.maximum(w0i >> mip, 1)
    mh = jnp.maximum(h0i >> mip, 1)
    return off, mw, mh, mip


def mip_from_derivatives(duv_dx, duv_dy, width, height):
    """Standard isotropic LOD: log2 of the max screen footprint in texels."""
    fx = jnp.square(duv_dx[..., 0] * width) + jnp.square(
        duv_dx[..., 1] * height)
    fy = jnp.square(duv_dy[..., 0] * width) + jnp.square(
        duv_dy[..., 1] * height)
    rho2 = jnp.maximum(jnp.maximum(fx, fy), 1e-12)
    return 0.5 * jnp.log2(rho2)


def sample_material_maps(atlas: dict, ent_id, uv, duv_dx=None,
                         duv_dy=None, wrap=None, base_wh=None,
                         aniso: int = 1, base_rows=None):
    """Bilinear-sample ALL four material maps with ONE texel-row gather
    per tap.

    ent_id (...,) i32 material atlas entries (< 0 -> neutral maps),
    uv (..., 2), duv_dx/duv_dy optional analytic derivatives.

    Per-pixel memory traffic is exactly TWO row gathers per tap: one
    packed descriptor row [offset, w, h] (mip clamping + residency
    redirection baked at build, see TextureAtlas.packed_desc) and one
    16-u32 row holding the 2x2 bilinear quads of base/normal/MR/emissive.
    `wrap`/`base_wh` can be supplied per-pixel (baked into resolve
    records) to avoid two more tiny-table gathers.

    aniso > 1 enables software anisotropic filtering (the reference uses
    a MaxAnisotropy hardware sampler, lightingcommon.hlsli:358-406):
    `aniso` taps spread along the MAJOR UV-gradient axis, with the mip
    chosen from the major footprint divided by the tap count (the D3D
    anisotropic LOD rule, clamped at the minor footprint) — grazing-angle
    surfaces stay sharp instead of over-blurring to the isotropic mip.

    Returns dict(base (..., 4), normal (..., 4), mr (..., 4),
                 emissive (..., 4), desired (...,)) — raw [0, 1] values;
    sRGB decode / channel semantics are the caller's (gbuffer resolve).
    """
    tid = jnp.maximum(ent_id, 0)
    if base_wh is None:
        d0 = atlas['tex_desc'][tid * MAX_MIPS]
        w0 = d0[..., 1].astype(jnp.float32)
        h0 = d0[..., 2].astype(jnp.float32)
    else:
        w0, h0 = base_wh
    if wrap is None:
        wrap = atlas['tex_wrap'][tid]

    d_major = None
    if duv_dx is not None and aniso > 1:
        fx2 = jnp.square(duv_dx[..., 0] * w0) + jnp.square(
            duv_dx[..., 1] * h0)
        fy2 = jnp.square(duv_dy[..., 0] * w0) + jnp.square(
            duv_dy[..., 1] * h0)
        p_max = jnp.sqrt(jnp.maximum(jnp.maximum(fx2, fy2), 1e-12))
        p_min = jnp.sqrt(jnp.maximum(jnp.minimum(fx2, fy2), 1e-12))
        # D3D11 anisotropic LOD: footprint shrunk by the taps taken
        # along the major axis, never finer than the minor footprint
        desired = jnp.log2(jnp.maximum(p_max / aniso, p_min))
        d_major = jnp.where((fx2 >= fy2)[..., None], duv_dx, duv_dy)
    elif duv_dx is not None:
        desired = mip_from_derivatives(duv_dx, duv_dy, w0, h0)
    else:
        desired = jnp.zeros(uv.shape[:-1], jnp.float32)
    mip = jnp.clip(jnp.round(desired), 0.0,
                   MAX_MIPS - 1.0).astype(jnp.int32)

    if base_rows is not None:
        # gather-free analytic descriptors (see analytic_desc); callers
        # guarantee a fully resident, ATLAS_ALIGN-aligned atlas
        off_rel, mw, mh, mip = analytic_desc(w0, h0, mip)
        off = base_rows + off_rel
        row = None
    else:
        row = atlas['tex_desc'][tid * MAX_MIPS + mip]     # (..., 4)
        off = row[..., 0]
        mw = row[..., 1]
        mh = row[..., 2]

    tile_id = None

    def tap(uv_t):
        nonlocal tile_id
        u = uv_t[..., 0] * mw.astype(jnp.float32) - 0.5
        v = uv_t[..., 1] * mh.astype(jnp.float32) - 0.5
        x0 = jnp.floor(u)
        y0 = jnp.floor(v)
        fx = (u - x0)[..., None]
        fy = (v - y0)[..., None]
        # single row gather: the row holds the full 2x2 footprint of
        # every map (wrap baked at build), so only the BASE texel needs
        # wrapping
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        rep_x = jnp.mod(x0i, jnp.maximum(mw, 1))
        rep_y = jnp.mod(y0i, jnp.maximum(mh, 1))
        x = jnp.where(wrap == WRAP_REPEAT, rep_x,
                      jnp.clip(x0i, 0, mw - 1))
        y = jnp.where(wrap == WRAP_REPEAT, rep_y,
                      jnp.clip(y0i, 0, mh - 1))
        if row is None:
            idx, tid_t = off + y * mw + x, None
        else:
            idx, tid_t = _texel_index(atlas, row, x, y, mw)
        if tid_t is not None and tile_id is None:
            tile_id = tid_t
        idx = jnp.clip(idx, 0, atlas['tex_texels'].shape[0] - 1)
        rows = atlas['tex_texels'][idx]                   # (..., 16) u32
        maps = []
        for mi in range(4):
            quad = unpack_rgba8_u32(rows[..., mi * 4:(mi + 1) * 4])
            maps.append(
                (quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx)
                * (1 - fy)
                + (quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx)
                * fy)
        return maps

    if d_major is None:
        acc = tap(uv)
    else:
        acc = None
        for i in range(aniso):
            t = (i + 0.5) / aniso - 0.5
            m = tap(uv + d_major * t)
            acc = m if acc is None else [a + b for a, b in zip(acc, m)]
        acc = [a * (1.0 / aniso) for a in acc]

    neutral = jnp.asarray([[1.0, 1.0, 1.0, 1.0],
                           [0.5, 0.5, 1.0, 1.0],
                           [1.0, 1.0, 1.0, 1.0],
                           [1.0, 1.0, 1.0, 1.0]], jnp.float32)
    valid = (ent_id >= 0)[..., None]
    out = {}
    for mi, name in enumerate(('base', 'normal', 'mr', 'emissive')):
        out[name] = jnp.where(valid, acc[mi], neutral[mi])
    out['desired'] = desired
    if tile_id is not None:
        out['tile_id'] = jnp.where(ent_id >= 0, tile_id, -1)
    return out


def _minpool2(x):
    """2x2 stride-2 min pool of a 2D plane — lax.reduce_window hits the
    TPU fast path (same op the HZB chain uses); strided slicing/jnp.repeat
    on the lane dim would be relayout shuffles costing ms at 1080p."""
    return jax.lax.reduce_window(x, x.dtype.type(jnp.inf)
                                 if jnp.issubdtype(x.dtype, jnp.floating)
                                 else jnp.iinfo(x.dtype).max,
                                 jax.lax.min, (2, 2), (2, 2), 'VALID')


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (2, 2), (2, 2), 'VALID')


def _quad_expand_ch(x):
    """(Hq, Wq, C) -> (2Hq, 2Wq, C) nearest expansion.  With a trailing
    channel dim the minor (sublane, lane) dims are (W, C), so both
    repeats avoid lane-dim relayouts (measured 0.07 ms at 1080p x 22ch
    vs 0.4 ms for broadcast+reshape and ~5 ms for 2D-plane repeats)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


def sample_material_maps_quad(atlas: dict, ent_id, uv, duv_dx, duv_dy,
                              wrap, base_wh, base_rows=None):
    """Quad-shared material sampling: ONE atlas row gather per 2x2 pixel
    quad instead of per pixel (gathers are latency-bound per ROW on TPU,
    so tap count — not width — sets the cost; this is 4x fewer taps).

    The quad samples at mip+1 (one level coarser than the per-pixel
    footprint) so its 2x2 texel row covers all four pixels; each pixel
    then applies its OWN bilinear weights inside that footprint.  The
    net effect is per-pixel bilinear filtering at a +1 mip bias — the
    speed/sharpness trade the reference makes with its half-resolution
    passes, recovered partly by TAA.  The quad representative is the
    per-field 2x2 min (fields agree exactly on single-material quads;
    mixed quads are silhouette edges, <2% of pixels, which reuse the
    representative's row).  Untextured pixels still resolve to neutral.

    All inputs are FULL-resolution (H, W[, n]) with H, W even; returns
    the same dict as sample_material_maps at full resolution ('desired'
    is the biased mip actually sampled, at quad rate, expanded — the
    feedback path keeps residency matched to real use).
    """
    f32 = jnp.float32
    big = jnp.int32(1 << 20)
    u0_q = _minpool2(uv[..., 0])
    v0_q = _minpool2(uv[..., 1])

    # footprint of the WHOLE quad: max per-pixel footprint + 1 level
    des_px = mip_from_derivatives(duv_dx, duv_dy, base_wh[0], base_wh[1])
    des_q = _maxpool2(des_px) + 1.0
    mip = jnp.clip(jnp.round(des_q), 0.0, MAX_MIPS - 1.0).astype(jnp.int32)

    if base_rows is not None:
        # analytic path: pool base+tex as ONE key (base is a multiple of
        # ATLAS_ALIGN >= 64 > tex, so the min picks one pixel's pair and
        # the pair decodes back exactly), then take the representative
        # pixel's w0/h0/wrap via a match-masked pool — no descriptor-row
        # gather at all (see analytic_desc)
        big2 = jnp.int32(1 << 30)
        v_px = jnp.where(ent_id >= 0,
                         base_rows + jnp.maximum(ent_id, 0), big2)
        v_q = _minpool2(v_px)
        sel = v_px == _quad_expand_ch(v_q[..., None])[..., 0]
        w0_q = _minpool2(jnp.where(sel, base_wh[0], jnp.inf))
        h0_q = _minpool2(jnp.where(sel, base_wh[1], jnp.inf))
        wrap_q = _minpool2(jnp.where(sel, wrap, big))
        from toyrenderer_tpu.scene.textures import ATLAS_ALIGN
        safe_v = jnp.where(v_q < big2, v_q, 0)
        base_q = (safe_v // ATLAS_ALIGN) * ATLAS_ALIGN
        tid_q = safe_v % ATLAS_ALIGN       # < 64 by construction
        w0_q = jnp.where(jnp.isfinite(w0_q), w0_q, 1.0)
        h0_q = jnp.where(jnp.isfinite(h0_q), h0_q, 1.0)
        off_rel, mw, mh, mip = analytic_desc(w0_q, h0_q, mip)
        off = base_q + off_rel
        row = None
    else:
        tid_q = jnp.minimum(
            _minpool2(jnp.where(ent_id >= 0, ent_id, big)),
            jnp.int32(atlas['tex_wrap'].shape[0] - 1))
        tid_q = jnp.maximum(tid_q, 0)
        wrap_q = _minpool2(wrap)
        row = atlas['tex_desc'][tid_q * MAX_MIPS + mip]   # (Hq, Wq, 4)
        off, mw, mh = row[..., 0], row[..., 1], row[..., 2]

    u_q = u0_q * mw.astype(f32) - 0.5
    v_q = v0_q * mh.astype(f32) - 0.5
    x0 = jnp.floor(u_q)
    y0 = jnp.floor(v_q)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    rep_x = jnp.mod(x0i, jnp.maximum(mw, 1))
    rep_y = jnp.mod(y0i, jnp.maximum(mh, 1))
    x = jnp.where(wrap_q == WRAP_REPEAT, rep_x, jnp.clip(x0i, 0, mw - 1))
    y = jnp.where(wrap_q == WRAP_REPEAT, rep_y, jnp.clip(y0i, 0, mh - 1))
    if row is None:
        idx, tile_id_q = off + y * mw + x, None
    else:
        idx, tile_id_q = _texel_index(atlas, row, x, y, mw)
    idx = jnp.clip(idx, 0, atlas['tex_texels'].shape[0] - 1)
    rows_q = atlas['tex_texels'][idx]                     # (Hq, Wq, 16)

    # ONE channel-packed nearest upsample carries the gathered rows AND
    # the quad metadata back to full res (no 2D-plane repeats).  The
    # rgba8 unpack happens at QUAD rate BEFORE the expansion — at full
    # res the 16-u32 shift/mask/convert chain ran 4x redundantly on
    # duplicated rows (measured ~6 ms/frame of Pack/Unpack fusions at
    # 1080p x 3 sampling passes); expanding the unpacked f32 planes
    # instead is pure streaming repeat
    meta_q = jnp.stack([x0, y0, mw.astype(f32), mh.astype(f32),
                        u_q, v_q], axis=-1)               # (Hq, Wq, 6)
    meta = _quad_expand_ch(meta_q)                        # (H, W, 6)
    quads_q = [unpack_rgba8_u32(rows_q[..., mi * 4:(mi + 1) * 4])
               for mi in range(4)]          # 4 x (Hq, Wq, 4, 4) f32
    # keep the expanded maps as FLAT 16-channel planes: the former
    # (H, W, 4, 4) reshape forced a T(8,128)->T(4,128) relayout + copy
    # per map (~0.85 ms x 4 at 1080p in the round-5 trace); the bilinear
    # below slices texel channels instead (free on the minor dim)
    quads = [_quad_expand_ch(q.reshape(*q.shape[:2], 16))
             for q in quads_q]              # 4 x (H, W, 16)

    # full-res per-pixel weights INSIDE the quad's 2x2 footprint
    u_p = uv[..., 0] * meta[..., 2] - 0.5
    v_p = uv[..., 1] * meta[..., 3] - 0.5
    fx = jnp.clip(u_p - meta[..., 0], 0.0, 1.0)[..., None]
    fy = jnp.clip(v_p - meta[..., 1], 0.0, 1.0)[..., None]
    # REPEAT wrap discontinuity inside a quad: offsets land far outside
    # [0, 1]; snap those pixels to the representative's own weights
    ok_u = jnp.abs(u_p - meta[..., 4]) < 2.0
    ok_v = jnp.abs(v_p - meta[..., 5]) < 2.0
    fq_x = jnp.clip(meta[..., 4] - meta[..., 0], 0.0, 1.0)[..., None]
    fq_y = jnp.clip(meta[..., 5] - meta[..., 1], 0.0, 1.0)[..., None]
    fx = jnp.where(ok_u[..., None], fx, fq_x)
    fy = jnp.where(ok_v[..., None], fy, fq_y)
    neutral = jnp.asarray([[1.0, 1.0, 1.0, 1.0],
                           [0.5, 0.5, 1.0, 1.0],
                           [1.0, 1.0, 1.0, 1.0],
                           [1.0, 1.0, 1.0, 1.0]], jnp.float32)
    valid = (ent_id >= 0)[..., None]
    out = {}
    for mi, name in enumerate(('base', 'normal', 'mr', 'emissive')):
        quad = quads[mi]                                  # (H, W, 16)
        c = ((quad[..., 0:4] * (1 - fx) + quad[..., 4:8] * fx)
             * (1 - fy)
             + (quad[..., 8:12] * (1 - fx) + quad[..., 12:16] * fx)
             * fy)
        out[name] = jnp.where(valid, c, neutral[mi])
    out['desired'] = _quad_expand_ch(des_q[..., None])[..., 0]
    if tile_id_q is not None:
        tile_full = _quad_expand_ch(tile_id_q[..., None])[..., 0]
        out['tile_id'] = jnp.where(valid[..., 0], tile_full, -1)
    return out


def srgb_to_linear(c):
    """Polynomial sRGB -> linear approximation (max err ~1e-3), applied to
    base/emissive samples (the reference uses hardware sRGB views)."""
    return c * (c * (c * 0.305306011 + 0.682171111) + 0.012522878)


def sample_texture(atlas: dict, tex_id, uv, duv_dx=None, duv_dy=None,
                   feedback: bool = False, wrap=None, base_wh=None):
    """Base-color-only sample (..., 4); thin wrapper over
    sample_material_maps for callers that only need one map."""
    maps = sample_material_maps(atlas, tex_id, uv, duv_dx, duv_dy,
                                wrap=wrap, base_wh=base_wh)
    if feedback:
        return maps['base'], maps['desired']
    return maps['base']


def vt_tile_feedback(tile_id, desired_mip, num_tiles: int):
    """Per-TILE min desired mip — sampler feedback at 64x64-texel tile
    granularity (TextureFeedbackManager.cpp resolve parity).  tile_id
    (H, W) i32 from the sampler (-1 = no VT tile sampled); returns
    (num_tiles,) f32 with +inf for untouched tiles."""
    import jax
    flat_id = jnp.where(tile_id >= 0, tile_id, num_tiles).reshape(-1)
    mins = jax.ops.segment_min(
        desired_mip.reshape(-1).astype(jnp.float32), flat_id,
        num_segments=num_tiles + 1)
    return mins[:num_tiles]


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
