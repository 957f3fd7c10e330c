"""Tile-binned software rasterizer producing a visibility buffer.

This is the TPU replacement for the reference's hardware meshlet pipeline
(AS_Main/MS_Main/PS_Main in source/shaders/basepass.hlsl + indirect dispatch
in source/BasePassRenderers.cpp:406-502).  There is no rasterizer primitive
on a TPU, so the design is a sort-middle software raster reshaped for the
VPU, using 2D-HOMOGENEOUS edge functions (Olano-Greer style):

  * Edge equations are cross products of clip-space vertices projected to a
    normalized [0,1]^2 homogeneous screen space — NO near-plane clipping
    stage exists or is needed; triangles crossing w=0 rasterize only their
    visible sheet (guarded by an interpolated-w > 0 test).  Per-vertex
    scale normalization keeps everything in f32-friendly ranges.
  * Perspective-correct barycentrics fall out of the same edge values
    (lambda_i ∝ L_i * inv_scale_i), so the visibility resolve needs no 1/w
    bookkeeping.

Stages:
  1. `setup_triangles`  — dense edge/depth setup + backface & degenerate
                          rejection (all masked, no branches)
  2. `bin_triangles`    — each small triangle expands to a STATIC grid of
                          (tile, tri) candidate slots; one global
                          `lax.sort` by tile id + `searchsorted` yields
                          per-tile triangle lists in a fixed-capacity
                          (num_tiles, K) table.  Triangles spanning more
                          tiles than the slot grid (or crossing w=0) go to
                          a "big" list tested by every tile.  Capacity
                          overflow drops triangles — the same bounded-
                          amplification semantics as the reference's
                          overflow drop (gpuculling.hlsl:69-74).
  3. `fill_visibility`  — per tile, scan chunks of its triangle list,
                          evaluate 3 edge functions over the TH x TW pixel
                          block (TW = 128 to match the VPU lane width),
                          reverse-Z depth-max reduce to (tri_id, depth)
                          per pixel: the visibility buffer.

Shading happens later from the visibility buffer (see gbuffer.py), which
keeps this inner loop tiny and bandwidth-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RasterConfig:
    width: int
    height: int
    tile_h: int = 16
    tile_w: int = 128
    max_tris_per_tile: int = 512     # K: per-tile list capacity
    chunk: int = 32                  # C: triangles processed per inner step
    bin_slots_y: int = 4             # static per-triangle tile-slot grid
    #                                  (4x2 = 64x256 px covers 99.5% of a
    #                                  Sponza-class view's triangles; the
    #                                  rest go to the big list)
    bin_slots_x: int = 2
    max_big_tris: int = 512          # B: full-screen-tested triangle budget
    tile_batch: int = 32             # TB: tiles processed per map step
    pair_capacity: int | None = None  # global (tile, tri) pair budget for
    #                                   the streaming fill; None = T (the
    #                                   triangle count), clamped to tiles*K
    compact_frac: float = 0.5        # small-triangle compaction capacity
    #                                  as a fraction of T: LOD/culling
    #                                  leave most slots invalid, so valid
    #                                  tris compact to this prefix before
    #                                  slot expansion (sort shrinks ~3x);
    #                                  overflow drops, like every bounded
    #                                  amplification path here
    bin_split: bool = True           # span-classed slot expansion: tris
    #                                  spanning ONE tile get 1 slot and
    #                                  2x1-span tris get 2 instead of the
    #                                  full Sy*Sx grid — a Sponza-class
    #                                  view is ~77% single-tile / ~15%
    #                                  2x1, so the global bin sort
    #                                  shrinks ~3x (1.26M -> 0.39M slot
    #                                  keys on the courtyard at 1080p)
    short_frac: float = 0.125        # 2x1-span class capacity (frac of T)
    rest_frac: float = 0.0625        # full-grid class capacity (frac of T)

    def resolve_pair_capacity(self, t: int) -> int:
        # min with t: a content-measured global budget must not INFLATE
        # the chunk grid of small streams (late phase, masked set) past
        # their own triangle count — t was the old default bound
        cap = self.pair_capacity if self.pair_capacity else t
        return max(min(cap, t, self.num_tiles * self.max_tris_per_tile),
                   256)

    def compact_cap(self, t: int) -> int:
        # sublane-aligned static capacity of the compacted small set
        return min(max(-(-int(t * self.compact_frac) // 8) * 8, 256), t)

    def short_cap(self, t: int) -> int:
        return min(max(-(-int(t * self.short_frac) // 8) * 8, 256), t)

    def rest_cap(self, t: int) -> int:
        return min(max(-(-int(t * self.rest_frac) // 8) * 8, 256), t)

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def setup_triangles(geo: dict, cfg: RasterConfig) -> dict:
    """Clip-space triangles -> homogeneous edge equations ("setup").

    geo: output of geometry.meshlet_clip_triangles.
    All arrays are (T, ...); invalid triangles get an empty tile bbox so
    they never bin.
    """
    clip = geo['clip']                              # (T, 3, 4)
    w = clip[..., 3]
    # normalized homogeneous screen coords: x in [0,1]*w, y-down
    xh = clip[..., 0] * 0.5 + 0.5 * w
    yh = 0.5 * w - clip[..., 1] * 0.5
    v = jnp.stack([xh, yh, w], axis=-1)             # (T, 3, 3)

    # per-vertex positive scale normalization (projective invariant for
    # coverage; tracked via inv_scale for barycentrics)
    s = jnp.maximum(jnp.max(jnp.abs(v), axis=-1), 1e-20)   # (T, 3)
    vs = v / s[..., None]
    inv_s = 1.0 / s

    n0 = jnp.cross(vs[:, 1], vs[:, 2])              # edge opposite v0
    n1 = jnp.cross(vs[:, 2], vs[:, 0])
    n2 = jnp.cross(vs[:, 0], vs[:, 1])
    det = jnp.sum(vs[:, 0] * n0, axis=-1)           # orientation (scaled)

    # glTF CCW front faces project to det < 0 in this y-down space
    front = det < 0.0
    keep = (geo['tri_valid'] & (det != 0.0)
            & (front | geo['double_sided'])
            & jnp.any(w > 1e-6, axis=-1))
    # L_i(v_i) == det, so interior edge values carry det's sign; normalize
    # to "inside iff all L_i >= 0" for either winding
    flip = jnp.where(det < 0.0, -1.0, 1.0)[:, None]
    edges = jnp.stack([n0, n1, n2], axis=1) * flip[..., None]  # (T, 3, 3)

    # depth interpolation: depth(p) = sum(L_i * zs_i) / sum(L_i * ws_i)
    zs = clip[..., 2] * inv_s                       # (T, 3)
    ws = w * inv_s

    # tile bbox: NDC bbox when fully in front; else full screen (big path)
    all_front = jnp.all(w > 1e-6, axis=-1)
    w_safe = jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)
    sx = xh / w_safe                                # [0,1] when in front
    sy = yh / w_safe
    xmin = jnp.min(sx, -1)
    xmax = jnp.max(sx, -1)
    ymin = jnp.min(sy, -1)
    ymax = jnp.max(sy, -1)
    off = all_front & ((xmax < 0) | (ymax < 0) | (xmin >= 1) | (ymin >= 1))
    keep = keep & ~off
    big = 1e9
    xmin = jnp.where(all_front, xmin, 0.0)
    ymin = jnp.where(all_front, ymin, 0.0)
    xmax = jnp.where(all_front, xmax, big)
    ymax = jnp.where(all_front, ymax, big)
    tx0 = jnp.clip(jnp.floor(xmin * cfg.width / cfg.tile_w),
                   0, cfg.tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax * cfg.width / cfg.tile_w),
                   0, cfg.tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin * cfg.height / cfg.tile_h),
                   0, cfg.tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax * cfg.height / cfg.tile_h),
                   0, cfg.tiles_y - 1)
    tx0 = jnp.where(keep, tx0, 1.0).astype(jnp.int32)
    tx1 = jnp.where(keep, tx1, 0.0).astype(jnp.int32)
    ty0 = jnp.where(keep, ty0, 1.0).astype(jnp.int32)
    ty1 = jnp.where(keep, ty1, 0.0).astype(jnp.int32)

    out = dict(
        edges=edges, zs=zs, ws=ws, inv_s=inv_s,
        tx0=tx0, tx1=tx1, ty0=ty0, ty1=ty1, valid=keep,
        vtx_ids=geo['vtx_ids'], inst_id=geo['inst_id'],
        mat_id=geo['mat_id'],
    )
    if 'pair_meshlet' in geo:
        out['pair_meshlet'] = geo['pair_meshlet']
        out['pair_inst'] = geo['pair_inst']
    return out


def eval_edges(setup: dict, tid, pxn, pyn):
    """Edge values L (..., 3) for triangles `tid` at normalized pixel
    coords pxn/pyn (broadcastable).  Shared by fill and resolve."""
    e = setup['edges'][tid]                         # (..., 3, 3)
    return (e[..., 0] * pxn[..., None] + e[..., 1] * pyn[..., None]
            + e[..., 2])


# Depth peeling re-rasterizes the next layer against the previous layer's
# stored depth; a fragment of the SAME surface must never pass its own
# bound.  Exact equality held only while XLA's FMA contraction happened to
# agree between the two evaluation sites — a ~1-ulp mismatch makes the
# front surface self-leak into layer 2.  The bound therefore excludes a
# ~32-ulp relative band below the stored depth (sub-millimeter at any
# scale; genuinely coincident layers are excluded BY DESIGN — the shared
# diagonal of a quad must not occupy two layers).
PEEL_BOUND = 1.0 - 4e-6


def _coverage_depth(setup, ids, pxn, pyn):
    """(inside, depth) for candidate triangle ids at pixel grids.

    ids: (..., C) i32 (−1 = empty); pxn/pyn: (..., 1, TH, TW) normalized.
    Returns inside (..., C, TH, TW) bool, depth f32 (reverse-Z; −1 outside).
    """
    ok = ids >= 0
    idx = jnp.maximum(ids, 0)
    ok = ok & setup['valid'][idx]
    e = setup['edges'][idx]                          # (..., C, 3, 3)
    zs = setup['zs'][idx]
    ws = setup['ws'][idx]
    # affine depth numerator/denominator — SAME association order as
    # raster_pallas.pack_tri_records so XLA and Pallas fills stay
    # bit-identical (num = sum_v l_v * z_v is affine in the pixel; the
    # coefficient fold happens at triangle rate, the eval at pixel rate)
    numc = (e[..., 0, :] * zs[..., 0, None] + e[..., 1, :] * zs[..., 1, None]
            + e[..., 2, :] * zs[..., 2, None])       # (..., C, 3)
    denc = (e[..., 0, :] * ws[..., 0, None] + e[..., 1, :] * ws[..., 1, None]
            + e[..., 2, :] * ws[..., 2, None])

    def L(i):
        return (e[..., i, 0, None, None] * pxn
                + e[..., i, 1, None, None] * pyn
                + e[..., i, 2, None, None])
    l0, l1, l2 = L(0), L(1), L(2)
    num = (numc[..., 0, None, None] * pxn + numc[..., 1, None, None] * pyn
           + numc[..., 2, None, None])
    den = (denc[..., 0, None, None] * pxn + denc[..., 1, None, None] * pyn
           + denc[..., 2, None, None])
    inside = ((jnp.minimum(jnp.minimum(l0, l1), l2) >= 0) & (den > 0)
              & ok[..., None, None])
    depth = jnp.where(inside, num / jnp.where(den == 0, 1.0, den), -1.0)
    return inside, depth


def _sort_pairs(setup: dict, cfg: RasterConfig):
    """Shared binning core: expand small triangles to (tile, tri) pairs,
    sort by tile, and compact big triangles.

    Returns (vals_s sorted tri ids (T*S,), offs (num_tiles+1,),
             counts (num_tiles,) i32 UNclamped, big_list (B,) i32).
    """
    t = setup['valid'].shape[0]
    tx0, tx1 = setup['tx0'], setup['tx1']
    ty0, ty1 = setup['ty0'], setup['ty1']
    spans_x = tx1 - tx0 + 1
    spans_y = ty1 - ty0 + 1
    is_big = setup['valid'] & ((spans_x > cfg.bin_slots_x)
                               | (spans_y > cfg.bin_slots_y))
    small = setup['valid'] & ~is_big

    # --- compact the small set first: culling/LOD leave most of the
    # static slot budget INVALID (a Sponza-class culled view keeps ~30%),
    # so sorting T x S slot keys wastes ~3x.  One T-element sort brings
    # valid tris to a static prefix (capacity overflow drops — bounded
    # amplification), then only that prefix slot-expands -----------------
    packed = None
    if cfg.tiles_x <= 256 and cfg.tiles_y <= 128:   # i32 sign headroom
        # ONE packed gather instead of four: the compaction gathers are
        # latency-bound per ROW (4 x (CC,) random fetches measured ~1 ms
        # each per phase); tile coords fit u8 (tiles_x <= 16,
        # tiles_y <= 128 at 2048^2), so pack tx0|tx1|ty0|ty1 into one
        # i32 T-dense (cheap VPU bit ops) and unpack after the gather
        packed = (tx0 | (tx1 << 8) | (ty0 << 16) | (ty1 << 24))

    def _compact_coords(mask, cap):
        """Sort-compact `mask`'s tri ids to a `cap` static prefix and
        gather their tile bboxes; returns (oc, ok, tx0c, tx1c, ty0c,
        ty1c)."""
        ckey = jnp.where(mask, jnp.arange(t, dtype=jnp.int32),
                         jnp.int32(t))
        order = jax.lax.sort(ckey)[:cap]               # valid-first ids
        ok = order < t
        oc_ = jnp.where(ok, order, 0)
        if packed is not None:
            pc_ = packed[oc_]
            return (oc_, ok, pc_ & 0xFF, (pc_ >> 8) & 0xFF,
                    (pc_ >> 16) & 0xFF, (pc_ >> 24) & 0xFF)
        return (oc_, ok, tx0[oc_], tx1[oc_], ty0[oc_], ty1[oc_])

    def _expand(mask, cap, sy_n, sx_n):
        """Slot-expand a span class to (cap * sy_n * sx_n) tile keys."""
        oc_, ok, tx0c, tx1c, ty0c, ty1c = _compact_coords(mask, cap)
        sy_ = jnp.arange(sy_n, dtype=jnp.int32)
        sx_ = jnp.arange(sx_n, dtype=jnp.int32)
        ty = ty0c[:, None, None] + sy_[None, :, None]  # (cap, sy, 1)
        tx = tx0c[:, None, None] + sx_[None, None, :]  # (cap, 1, sx)
        in_range = ((ty <= ty1c[:, None, None])
                    & (tx <= tx1c[:, None, None]) & ok[:, None, None])
        tile_id = ty * cfg.tiles_x + tx                # (cap, sy, sx)
        sentinel = jnp.int32(cfg.num_tiles)
        keys_ = jnp.where(in_range, tile_id, sentinel).reshape(-1)
        vals_ = jnp.broadcast_to(
            oc_[:, None, None], tile_id.shape).reshape(-1)
        return keys_, vals_

    sy_full, sx_full = cfg.bin_slots_y, cfg.bin_slots_x
    use_split = cfg.bin_split and (sy_full * sx_full > 2)
    drop = {}

    def _class_drop(name, mask, cap):
        n = jnp.sum(mask.astype(jnp.int32))
        drop[name] = jnp.maximum(n - cap, 0)

    if use_split:
        # span-classed expansion: most tris span ONE tile (1 slot), the
        # next-biggest class spans 2x1 (2 slots); only the residue pays
        # the full Sy*Sx grid.  Same (tile, tri) pair set as the
        # monolithic expansion (bitwise-equal sorted output), ~3x fewer
        # slot keys through the global sort.  Each class's capacity
        # overflow drops independently — bounded amplification.
        tiny = small & (spans_x == 1) & (spans_y == 1)
        short = small & (spans_x == 1) & (spans_y == 2)
        rest = small & ~tiny & ~short
        _class_drop('drop_tiny', tiny, cfg.compact_cap(t))
        _class_drop('drop_short', short, cfg.short_cap(t))
        _class_drop('drop_rest', rest, cfg.rest_cap(t))
        parts = [_expand(tiny, cfg.compact_cap(t), 1, 1),
                 _expand(short, cfg.short_cap(t), 2, 1),
                 _expand(rest, cfg.rest_cap(t), sy_full, sx_full)]
        keys = jnp.concatenate([p[0] for p in parts])
        tri_ids = jnp.concatenate([p[1] for p in parts])
    else:
        _class_drop('drop_small', small, cfg.compact_cap(t))
        keys, tri_ids = _expand(small, cfg.compact_cap(t), sy_full,
                                sx_full)
    tri_bits = max(t - 1, 1).bit_length()
    if tri_bits + (cfg.num_tiles + 1).bit_length() <= 31:
        # single-key sort: (tile << tri_bits) | tri — ~2x faster than a
        # lexicographic two-operand sort
        combined = (keys << tri_bits) | tri_ids
        combined = jax.lax.sort(combined)
        keys_s = combined >> tri_bits
        vals_s = combined & ((1 << tri_bits) - 1)
    else:
        keys_s, vals_s = jax.lax.sort((keys, tri_ids), num_keys=1)

    tile_range = jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32)
    offs = jnp.searchsorted(keys_s, tile_range, side='left')
    counts = (offs[1:] - offs[:-1]).astype(jnp.int32)

    # --- big triangles: compact into fixed B slots.  Sort-based stream
    # compaction: a scatter-max over T updates serializes on TPU
    # (~0.9 ms at 100k tris); sorting T small keys costs ~0.15 ms -------
    b = cfg.max_big_tris
    key = jnp.where(is_big, jnp.arange(t, dtype=jnp.int32), jnp.int32(t))
    big_sorted = jax.lax.sort(key)[:min(b, t)]
    if t < b:                                       # tiny scenes
        big_sorted = jnp.concatenate(
            [big_sorted, jnp.full((b - t,), t, jnp.int32)])
    num_big = jnp.sum(is_big.astype(jnp.int32))
    big_list = jnp.where(jnp.arange(b) < jnp.minimum(num_big, b),
                         big_sorted, -1)
    # silent-drop telemetry (round 4: honest LODs made every bounded
    # path's overflow a REAL possibility — the courtyard lost whole
    # slabs/beams before these counters existed).  Per-tile K overflow
    # is the pairs a tile binned beyond its list capacity.
    drop['drop_big'] = jnp.maximum(num_big - b, 0)
    drop['drop_tile_k'] = jnp.sum(jnp.maximum(
        counts - cfg.max_tris_per_tile, 0))
    return vals_s, offs, counts, big_list, drop


def bin_triangles(setup: dict, cfg: RasterConfig):
    """Build the per-tile triangle table + the big-triangle list.

    Returns:
      tile_table: (num_tiles, K) i32 triangle ids, -1 padded
      tile_count: (num_tiles,) i32
      big_list:   (B,) i32 triangle ids, -1 padded
      drop:       dict of overflow counters from _sort_pairs (silent-drop
                  telemetry — every bounded path reports its overflow)
    """
    vals_s, offs, counts, big_list, drop = _sort_pairs(setup, cfg)
    k_ = jnp.arange(cfg.max_tris_per_tile, dtype=jnp.int32)
    gather_idx = offs[:-1, None] + k_[None, :]          # (tiles, K)
    in_list = k_[None, :] < counts[:, None]
    gather_idx = jnp.clip(gather_idx, 0, vals_s.shape[0] - 1)
    tile_table = jnp.where(in_list, vals_s[gather_idx], -1)
    return (tile_table, jnp.minimum(counts, cfg.max_tris_per_tile),
            big_list, drop)


def bin_pairs_stream(setup: dict, cfg: RasterConfig):
    """Streaming bins for the chunk-grid Pallas fill: no (tiles, K) table.

    Returns dict with
      vals_s (T*S,) sorted tri ids, offs (num_tiles+1,),
      counts (num_tiles,) clamped to K, big_list (B,).
    The fused fill consumes these via `fill_resolve_stream`.
    """
    vals_s, offs, counts, big_list, drop = _sort_pairs(setup, cfg)
    return dict(vals_s=vals_s, offs=offs,
                counts=jnp.minimum(counts, cfg.max_tris_per_tile),
                big_list=big_list, drop=drop)


def fill_visibility(setup: dict, tile_table, big_list, cfg: RasterConfig,
                    init_depth=None, init_tri_id=None, emit_base: int = 0,
                    peel_depth=None):
    """Rasterize per-tile lists -> (depth (H,W) f32, tri_id (H,W) i32).

    depth is reverse-Z (greater == closer, 0 == far/background);
    tri_id is -1 where nothing was drawn.  Optional init planes continue a
    previous fill (phase 2 of the 2-phase occlusion pipeline).
    peel_depth: optional (H, W) EXCLUSIVE near bound — only fragments
    strictly farther (depth < peel_depth) can win, yielding the next
    depth layer (depth-peeling OIT).
    """
    th, tw = cfg.tile_h, cfg.tile_w
    tb = cfg.tile_batch
    n_tiles = cfg.num_tiles
    n_batches = -(-n_tiles // tb)
    tiles_pad = n_batches * tb

    col = (jax.lax.broadcasted_iota(jnp.float32, (1, 1, th, tw), 3) + 0.5)
    row = (jax.lax.broadcasted_iota(jnp.float32, (1, 1, th, tw), 2) + 0.5)
    inv_w_img = 1.0 / cfg.width
    inv_h_img = 1.0 / cfg.height

    big_b = jnp.broadcast_to(big_list[None, :], (tb, big_list.shape[0]))

    if init_depth is not None:
        from toyrenderer_tpu.ops.raster_pallas import _image_to_tiles
        init_z_tiles = _image_to_tiles(init_depth, cfg)
        init_id_tiles = _image_to_tiles(init_tri_id, cfg)
    if peel_depth is not None:
        from toyrenderer_tpu.ops.raster_pallas import _image_to_tiles
        peel_tiles = _image_to_tiles(peel_depth, cfg)

    def raster_chunk(ids, pxn, pyn, peel, best):
        """ids (TB, C); pxn/pyn (TB,1,TH,TW); best = (z, id) per pixel."""
        inside, depth = _coverage_depth(setup, ids, pxn, pyn)
        if peel is not None:
            depth = jnp.where(depth < peel[:, None] * PEEL_BOUND,
                              depth, -1.0)
        best_z, best_id = best
        emit_ids = jnp.where(ids >= 0, ids + emit_base, ids)
        cz = jnp.max(depth, axis=1)                              # (TB,TH,TW)
        carg = jnp.argmax(depth, axis=1)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(emit_ids[:, :, None, None], depth.shape),
            carg[:, None], axis=1)[:, 0]
        upd = cz > best_z
        return (jnp.where(upd, cz, best_z),
                jnp.where(upd, cid, best_id))

    k = cfg.max_tris_per_tile
    c = min(cfg.chunk, k)
    n_chunks = -(-k // c)
    c_big = min(cfg.chunk, cfg.max_big_tris)
    n_big_chunks = -(-cfg.max_big_tris // c_big)

    def do_batch(batch_idx):
        tile_ids = batch_idx * tb + jnp.arange(tb, dtype=jnp.int32)
        tile_ids = jnp.minimum(tile_ids, n_tiles - 1)
        ty = tile_ids // cfg.tiles_x
        tx = tile_ids % cfg.tiles_x
        pxn = (tx[:, None, None, None].astype(jnp.float32) * tw
               + col) * inv_w_img
        pyn = (ty[:, None, None, None].astype(jnp.float32) * th
               + row) * inv_h_img
        table = tile_table[tile_ids]                  # (TB, K)

        if init_depth is not None:
            best = (init_z_tiles[tile_ids], init_id_tiles[tile_ids])
        else:
            best = (jnp.zeros((tb, th, tw), jnp.float32),
                    jnp.full((tb, th, tw), -1, jnp.int32))
        peel = (peel_tiles[tile_ids] if peel_depth is not None else None)

        def body(i, best):
            ids = jax.lax.dynamic_slice(table, (0, i * c), (tb, c))
            return raster_chunk(ids, pxn, pyn, peel, best)
        best = jax.lax.fori_loop(0, n_chunks, body, best)

        def body_big(i, best):
            ids = jax.lax.dynamic_slice(big_b, (0, i * c_big),
                                        (tb, c_big))
            return raster_chunk(ids, pxn, pyn, peel, best)
        best = jax.lax.fori_loop(0, n_big_chunks, body_big, best)
        return best

    z, tid = jax.lax.map(do_batch, jnp.arange(n_batches, dtype=jnp.int32))
    z = z.reshape(tiles_pad, th, tw)[:n_tiles]
    tid = tid.reshape(tiles_pad, th, tw)[:n_tiles]

    def to_image(x):
        img = x.reshape(cfg.tiles_y, cfg.tiles_x, th, tw)
        img = jnp.transpose(img, (0, 2, 1, 3))
        img = img.reshape(cfg.tiles_y * th, cfg.tiles_x * tw)
        return img[:cfg.height, :cfg.width]

    return to_image(z), to_image(tid)


def rasterize(geo: dict, cfg: RasterConfig, use_pallas: bool = False,
              init_depth=None, init_tri_id=None, tri_id_base: int = 0):
    """setup + bin + fill; returns (setup, depth, tri_id).

    tri_id_base offsets emitted triangle ids (phase-2 fills use it so ids
    index into the concatenated multi-phase setup).
    """
    setup = setup_triangles(geo, cfg)
    tile_table, tile_count, big_list, _ = bin_triangles(setup, cfg)
    if use_pallas:
        from toyrenderer_tpu.ops.raster_pallas import fill_visibility_pallas
        depth, tri_id = fill_visibility_pallas(
            setup, tile_table, tile_count, big_list, cfg,
            init_depth=init_depth, init_tri_id=init_tri_id,
            emit_base=tri_id_base)
    else:
        depth, tri_id = fill_visibility(
            setup, tile_table, big_list, cfg,
            init_depth=init_depth, init_tri_id=init_tri_id,
            emit_base=tri_id_base)
    return setup, depth, tri_id


def rasterize_bruteforce(geo: dict, cfg: RasterConfig):
    """Reference path: every triangle vs every pixel (tests / tiny scenes)."""
    setup = setup_triangles(geo, cfg)
    t = setup['valid'].shape[0]
    pxn = ((jax.lax.broadcasted_iota(
        jnp.float32, (cfg.height, cfg.width), 1) + 0.5) / cfg.width)
    pyn = ((jax.lax.broadcasted_iota(
        jnp.float32, (cfg.height, cfg.width), 0) + 0.5) / cfg.height)

    def body(i, best):
        best_z, best_id = best
        ids = jnp.full((1,), i, jnp.int32)
        inside, depth = _coverage_depth(
            setup, ids[None], pxn[None, None], pyn[None, None])
        depth = depth[0, 0]
        upd = depth > best_z
        return (jnp.where(upd, depth, best_z),
                jnp.where(upd, i, best_id))

    best = (jnp.zeros((cfg.height, cfg.width), jnp.float32),
            jnp.full((cfg.height, cfg.width), -1, jnp.int32))
    z, tid = jax.lax.fori_loop(0, t, body, best)
    return setup, z, tid
