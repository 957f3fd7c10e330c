"""Pallas TPU kernel for the visibility-buffer fill.

The XLA fill (raster.py:fill_visibility) pays full per-tile capacity cost
and materializes (C, TH, TW) intermediates through HBM.  This kernel keeps
the per-tile z/id state in VMEM, streams each tile's triangle records via
the Pallas pipeline (automatic double-buffered DMA), and — crucially — runs
a `fori_loop` bounded by the tile's REAL triangle count (scalar-prefetched),
so cost is proportional to binned work, like the reference's GPU-driven
indirect dispatch (BasePassRenderers.cpp:497-502).

Triangle records are packed by `pack_tri_records` in XLA (one dense gather,
sequential per tile) into (tiles, K, 16) f32:
  [0:9]  edge equations (3 x 3, normalized homogeneous screen space)
  [9:12] zs (z_clip * inv_scale per vertex)
  [12:15] ws (w_clip * inv_scale per vertex)
  [15]   global triangle id as f32 (ids < 2^24 are exact), packed into
         the record so the kernel streams ONE array — Mosaic requires
         128-aligned dynamic slices on the lane dim, which a separate
         (K,) id vector cannot satisfy at chunk granularity.  Slot
         validity comes from the scalar-prefetched per-tile counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toyrenderer_tpu.ops.gbuffer import INTERP_C
from toyrenderer_tpu.ops.raster import PEEL_BOUND, RasterConfig

REC = 16


def pack_tri_records(setup: dict, ids=None) -> jnp.ndarray:
    """(T, 16) f32 packed records from the triangle setup.  Slot 15 holds
    the triangle id as f32 (exact below 2^24); pass explicit `ids` to bake
    emit offsets / -1 sentinels.

    Slots 9:12 / 12:15 hold the AFFINE depth numerator / denominator
    coefficients (sum_v edges[v] * zs[v] / ws[v]): num(x, y) is affine in
    the pixel, so pre-folding the z/w dot products at pack time (T-rate,
    XLA) replaces two 3-term dot products per pixel with two affine evals
    in the kernel (pixel-rate, VPU).  raster._coverage_depth mirrors the
    same association order, keeping XLA/Pallas fills bit-identical."""
    t = setup['valid'].shape[0]
    if ids is None:
        ids = jnp.arange(t, dtype=jnp.int32)
    e = setup['edges']                                   # (T, 3, 3)
    numc = (e[:, 0] * setup['zs'][:, 0:1] + e[:, 1] * setup['zs'][:, 1:2]
            + e[:, 2] * setup['zs'][:, 2:3])             # (T, 3)
    denc = (e[:, 0] * setup['ws'][:, 0:1] + e[:, 1] * setup['ws'][:, 1:2]
            + e[:, 2] * setup['ws'][:, 2:3])             # (T, 3)
    rec = jnp.concatenate([
        e.reshape(t, 9),
        numc,
        denc,
        ids.astype(jnp.float32)[:, None],
    ], axis=1)
    return rec


def _fill_kernel(counts_ref,            # scalar prefetch: (tiles,) i32
                 bigcount_ref,          # scalar prefetch: (1,) i32
                 # NOTE: prefetch arrays must stay 1D — Mosaic pads the
                 # minor dim of SMEM arrays to 128, so a (tiles, 2) table
                 # would cost 64x its size against the 1MB SMEM budget
                 rec_ref,               # (1, K, 16) f32 tile triangle recs
                 bigrec_ref,            # (B, 16) f32 big-triangle records
                 init_z_ref,            # (TH, TW) f32
                 init_id_ref,           # (TH, TW) i32
                 z_out,                 # (TH, TW) f32
                 id_out,                # (TH, TW) i32
                 *, cfg: RasterConfig, chunk: int, emit_base: int):
    i = pl.program_id(0)
    ty = i // cfg.tiles_x
    tx = i % cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w

    colf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    rowf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5
    pxn = (tx.astype(jnp.float32) * tw + colf) * (1.0 / cfg.width)
    pyn = (ty.astype(jnp.float32) * th + rowf) * (1.0 / cfg.height)

    z_out[...] = init_z_ref[...]
    id_out[...] = init_id_ref[...]

    c = chunk

    def make_body(rec_src):
        # batched (G,1,1) x (1,8,128) edge evaluation — see raster_rows
        g = 8
        nh = th // 8

        colf8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, tw), 1).astype(jnp.float32) + 0.5
        rowf8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, tw), 0).astype(jnp.float32) + 0.5
        px8 = (tx.astype(jnp.float32) * tw + colf8) * (1.0 / cfg.width)

        def body(ci, _):
            base = pl.multiple_of(ci * c, c)
            rec = rec_src(base)                       # (C, 16)
            halves = []
            for h in range(nh):
                sl = slice(h * 8, (h + 1) * 8)
                pxh = px8[None]
                pyh = ((ty.astype(jnp.float32) * th + h * 8 + rowf8)
                       * (1.0 / cfg.height))[None]
                bz = z_out[sl, :]
                bi = id_out[sl, :]
                for r0 in range(0, c, g):
                    rg = rec[r0:r0 + g]

                    def colm(f, rg=rg):
                        return rg[:, f:f + 1][:, :, None]
                    l0 = colm(0) * pxh + colm(1) * pyh + colm(2)
                    l1 = colm(3) * pxh + colm(4) * pyh + colm(5)
                    l2 = colm(6) * pxh + colm(7) * pyh + colm(8)
                    # affine num/den coefficients (pack_tri_records)
                    num = colm(9) * pxh + colm(10) * pyh + colm(11)
                    den = colm(12) * pxh + colm(13) * pyh + colm(14)
                    inside = ((jnp.minimum(jnp.minimum(l0, l1), l2)
                               >= 0.0) & (den > 0.0))
                    depth = jnp.where(
                        inside, num / jnp.where(den == 0.0, 1.0, den),
                        -1.0)
                    # tree-reduce winner (first-wins ties, see
                    # raster_rows); chunk overshoot reads -1-id slots —
                    # mask those records out by id sign
                    idp = colm(15) * jnp.ones((1, 8, tw))
                    nodes = []
                    for r in range(g):
                        d_r = jnp.where(idp[r] >= 0.0, depth[r], -1.0)
                        nodes.append(
                            (d_r, idp[r].astype(jnp.int32) + emit_base))
                    while len(nodes) > 1:
                        nxt = []
                        for a, b in zip(nodes[0::2], nodes[1::2]):
                            t = b[0] > a[0]
                            nxt.append((jnp.maximum(a[0], b[0]),
                                        jnp.where(t, b[1], a[1])))
                        nodes = nxt
                    dw, iw = nodes[0]
                    upd = dw > bz
                    bz = jnp.where(upd, dw, bz)
                    bi = jnp.where(upd, iw, bi)
                halves.append((bz, bi))
            for h in range(nh):
                sl = slice(h * 8, (h + 1) * 8)
                z_out[sl, :] = halves[h][0]
                id_out[sl, :] = halves[h][1]
            return 0
        return body

    count = counts_ref[i]
    n_chunks = (count + c - 1) // c
    jax.lax.fori_loop(
        0, n_chunks, make_body(lambda b: rec_ref[0, pl.ds(b, c), :]), 0)

    big_count = bigcount_ref[0]
    n_big = (big_count + c - 1) // c
    jax.lax.fori_loop(
        0, n_big, make_body(lambda b: bigrec_ref[pl.ds(b, c), :]), 0)


def fill_visibility_pallas(setup: dict, tile_table, tile_count, big_list,
                           cfg: RasterConfig, init_depth=None,
                           init_tri_id=None, chunk: int = 8,
                           emit_base: int = 0):
    """Pallas fill: returns (depth (H, W) f32, tri_id (H, W) i32).

    Output blocks are placed straight into the (padded) image by the
    BlockSpec index map — no tile<->image transposes anywhere."""
    rec = pack_tri_records(setup)                     # (T, 16)
    safe = jnp.maximum(tile_table, 0)
    tile_recs = rec[safe]                             # (tiles, K, 16)
    # re-stamp slot 15 with the TABLE's id (-1 for empty slots)
    tile_recs = tile_recs.at[:, :, 15].set(tile_table.astype(jnp.float32))
    big_safe = jnp.maximum(big_list, 0)
    big_recs = rec[big_safe]                          # (B, 16)
    big_recs = big_recs.at[:, 15].set(big_list.astype(jnp.float32))
    big_count = jnp.sum((big_list >= 0).astype(jnp.int32)).reshape(1)

    n_tiles = cfg.num_tiles
    th, tw = cfg.tile_h, cfg.tile_w
    hp, wp = cfg.tiles_y * th, cfg.tiles_x * tw
    if init_depth is None:
        init_z = jnp.zeros((hp, wp), jnp.float32)
        init_id = jnp.full((hp, wp), -1, jnp.int32)
    else:
        init_z = pad_image(init_depth, cfg)
        init_id = pad_image(init_tri_id, cfg, fill=-1)

    tile_block = pl.BlockSpec(
        (th, tw), lambda i, c, b: (i // cfg.tiles_x, i % cfg.tiles_x),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, cfg.max_tris_per_tile, REC),
                         lambda i, c, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.max_big_tris, REC),
                         lambda i, c, b: (0, 0), memory_space=pltpu.VMEM),
            tile_block,
            tile_block,
        ],
        out_specs=[tile_block, tile_block],
    )
    z, tid = pl.pallas_call(
        functools.partial(_fill_kernel, cfg=cfg, chunk=chunk,
                          emit_base=emit_base),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ),
        grid_spec=grid_spec,
    )(tile_count, big_count, tile_recs, big_recs, init_z, init_id)
    return crop_image(z, cfg), crop_image(tid, cfg)


def pad_image(img, cfg: RasterConfig, fill=0):
    """(..., H, W) -> (..., Hpad, Wpad) padded to the tile grid."""
    hpad = cfg.tiles_y * cfg.tile_h - img.shape[-2]
    wpad = cfg.tiles_x * cfg.tile_w - img.shape[-1]
    if hpad == 0 and wpad == 0:
        return img
    pad = [(0, 0)] * (img.ndim - 2) + [(0, hpad), (0, wpad)]
    return jnp.pad(img, pad, constant_values=fill)


def crop_image(img, cfg: RasterConfig):
    """(..., Hpad, Wpad) -> (..., H, W)."""
    return img[..., :cfg.height, :cfg.width]


def _image_to_tiles(img, cfg: RasterConfig):
    """(H, W) -> (tiles, TH, TW) — XLA-fill helper (raster.py)."""
    th, tw = cfg.tile_h, cfg.tile_w
    p = pad_image(img, cfg)
    p = p.reshape(cfg.tiles_y, th, cfg.tiles_x, tw)
    return jnp.transpose(p, (0, 2, 1, 3)).reshape(cfg.num_tiles, th, tw)


def _tiles_to_image(tiles, cfg: RasterConfig):
    """(tiles, TH, TW) -> (H, W) — XLA-fill helper (raster.py)."""
    th, tw = cfg.tile_h, cfg.tile_w
    img = tiles.reshape(cfg.tiles_y, cfg.tiles_x, th, tw)
    img = jnp.transpose(img, (0, 2, 1, 3))
    img = img.reshape(cfg.tiles_y * th, cfg.tiles_x * tw)
    return crop_image(img, cfg)


# ---------------------------------------------------------------------------
# Streamed fill + resolve: chunk grid over REAL binned pairs
# ---------------------------------------------------------------------------
#
# The per-pixel gather of resolve records (records[tri_id]) is the single
# most expensive op of the frame on TPU (~34 ms at 1080p: 2M random 256-byte
# rows).  This kernel removes it entirely: the fill tracks each pixel's
# winning LOCAL slot in the tile's triangle list, then fetches the records
# with ONE-HOT MATMULS on the MXU — (pixels x slots) @ (slots x R) — the
# classic TPU gather-as-matmul reshaping.  Binning produces a SORTED pair
# stream (raster.bin_pairs_stream) and the Pallas grid walks chunk-aligned
# slices of it:
#
#   grid step j  =  one chunk of CHUNK_S pair records of tile chunk_tile[j]
#
# Output blocks are indexed by the scalar-prefetched chunk_tile, so a tile's
# depth/id/record state stays resident in VMEM across its consecutive
# chunks (the Pallas revisiting pipeline) and is flushed exactly once.  The
# per-tile record list is accumulated into a VMEM scratch so the one-hot
# MXU resolve fetch runs on the last chunk.  Cost is proportional to REAL
# binned work + one mandatory chunk per tile — the GPU-driven-indirect
# contract (BasePassRenderers.cpp:497-502) with tighter constants.
#
# The epilogue then resolves the fetched records to the per-pixel
# INTERPOLANT STACK right in VMEM (barycentric interpolation, analytic UV
# derivatives, cotangent frame — see gbuffer.resolve_interpolants, the XLA
# reference implementation): only INTERP_C=32 planes leave the kernel
# instead of the raw 64-float records, halving output bandwidth and
# removing the dense XLA resolve pass entirely.

CHUNK_S = 32     # default stream chunk; cfg.chunk overrides


def _fill_resolve_stream_kernel(
        chunk_tile_ref,      # prefetch (CH,) i32: tile of each chunk
        chunk_base_ref,      # prefetch (tiles,) i32: first chunk of tile
        count_ref,           # prefetch (tiles,) i32: effective pair count
        bigcount_ref,        # prefetch (1,) i32 — 1D only: Mosaic pads
        #                      SMEM minor dims to 128 (a (tiles, 2) table
        #                      would cost 64x its size of the 1MB budget)
        bighit_ref,          # prefetch (tiles,) i32: 1 if any big tri's
        #                      bbox intersects the tile (gates big loop)
        comb_ref,            # (1, C, 16+R) streamed pair records
        bigcomb_ref,         # (B, 16+R) big-triangle records (resident)
        init_z_ref,          # (TH, TW) f32 (block at the tile's position)
        init_id_ref,         # (TH, TW) i32
        init_rec_ref,        # (INTERP_C, TH, TW) f32
        z_out, id_out,       # (TH, TW)
        rec_out,             # (INTERP_C, TH, TW) f32 interpolant stack
        slot_scr,            # VMEM (TH, TW) i32
        rec_scr,             # VMEM (K, R) f32
        fet_scr,             # VMEM (TH, R, TW) f32 fetched-record planes
        *, cfg: RasterConfig, chunk: int, emit_base: int, rec_width: int,
        peel_ref=None,       # optional (TH, TW) exclusive near bound
        smem_ref=None):      # optional (1, C, 16) SMEM record block
    j = pl.program_id(0)
    n_ch = pl.num_programs(0)
    tile = chunk_tile_ref[j]
    first = jnp.logical_or(
        j == 0, chunk_tile_ref[jnp.maximum(j - 1, 0)] != tile)
    last = jnp.logical_or(
        j == n_ch - 1, chunk_tile_ref[jnp.minimum(j + 1, n_ch - 1)] != tile)
    c = chunk
    slot_base = (j - chunk_base_ref[tile]) * c
    count = count_ref[tile]
    big_count = bigcount_ref[0]

    th, tw = cfg.tile_h, cfg.tile_w
    k_cap = cfg.max_tris_per_tile
    b_cap = cfg.max_big_tris
    ty = tile // cfg.tiles_x
    tx = tile % cfg.tiles_x
    colf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    rowf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5
    pxn = (tx.astype(jnp.float32) * tw + colf) * (1.0 / cfg.width)
    pyn = (ty.astype(jnp.float32) * th + rowf) * (1.0 / cfg.height)

    @pl.when(first)
    def _():
        z_out[...] = init_z_ref[...]
        id_out[...] = init_id_ref[...]
        slot_scr[...] = jnp.full((th, tw), -1, jnp.int32)
        # the one-hot fetch contracts EVERY scratch row (x 0 for losers);
        # stale inf/NaN rows would poison the sum
        rec_scr[...] = jnp.zeros((k_cap, rec_width), jnp.float32)

    # Batched edge evaluation: triangle fields are (G,1) static column
    # slices of the record block, broadcast (G,1,1) x (1,8,128) against
    # 8-row pixel slabs — one op chain tests G triangles x 1024 pixels.
    # The per-triangle scalar-extract formulation (16 extracts/tri)
    # measured ~10x slower — scalar extracts dominate, not VPU flops
    # (see ops/bvh_pallas.py).  G=8 keeps the batch one vreg tile per
    # element and the sublane dim a single tile (Mosaic (K,1,1)-
    # broadcast constraint); z/id/slot state moves in 8-row HALVES read
    # and written straight from the refs (sublane-slicing a multi-tile
    # VALUE around these 3D ops crashes the Mosaic layout pass).
    g = 8
    nh = th // 8

    def _sl(h):
        return slice(h * 8, (h + 1) * 8)

    def read_halves():
        return [(z_out[_sl(h), :], id_out[_sl(h), :],
                 slot_scr[_sl(h), :]) for h in range(nh)]

    def write_halves(halves):
        for h in range(nh):
            z_out[_sl(h), :] = halves[h][0]
            id_out[_sl(h), :] = halves[h][1]
            slot_scr[_sl(h), :] = halves[h][2]

    colf8 = jax.lax.broadcasted_iota(
        jnp.int32, (8, tw), 1).astype(jnp.float32) + 0.5
    rowf8 = jax.lax.broadcasted_iota(
        jnp.int32, (8, tw), 0).astype(jnp.float32) + 0.5
    px8 = (tx.astype(jnp.float32) * tw + colf8) * (1.0 / cfg.width)

    def raster_rows(read_group, base, limit, slot_origin, halves):
        """Count-bounded chunk raster: g=8-record groups run in a
        fori_loop bounded by the REAL remaining pair count (ceil at g),
        so VPU cost tracks binned pairs at g granularity instead of
        rounding every tile up to the full chunk (at chunk=128 a
        10-pair tile used to pay for 128 — measured 397 -> 216 ms
        deferred just from halving the chunk; this removes the
        rounding entirely and lets big chunks amortize grid steps).
        read_group: r0 -> (g, 16) record block read from a ref.

        Winner selection is a TREE REDUCTION over the group (left
        priority on depth ties == the sequential cascade's first-wins
        semantics, bit-identical results): the 8-step insertion cascade
        cost 5 vreg-ops x g records per half; the tree costs ~g/2 at
        the leaves where ids/slots are still (1,1) scalars."""
        ng = jnp.clip((limit - base + (g - 1)) // g, 0, c // g)
        pxh = px8[None]
        pyhs = [((ty.astype(jnp.float32) * th + h * 8 + rowf8)
                 * (1.0 / cfg.height))[None] for h in range(nh)]

        def body(gi, hs):
            r0 = pl.multiple_of(gi * g, g)
            rg = read_group(r0)

            def colm(f):
                return rg[:, f:f + 1][:, :, None]      # (g, 1, 1)
            # (g,1,1)x(1,8,tw) broadcast is the Mosaic-legal shape;
            # a (1,1)->(8,tw) broadcast at select time is NOT
            # ("Broadcast in both sublanes and lanes" is unimplemented)
            idp = (colm(15) * jnp.ones((1, 8, tw))).astype(jnp.int32)
            out = []
            for h in range(nh):
                sl = _sl(h)
                pyh = pyhs[h]
                bz, bi, bs = hs[3 * h], hs[3 * h + 1], hs[3 * h + 2]
                l0 = colm(0) * pxh + colm(1) * pyh + colm(2)
                l1 = colm(3) * pxh + colm(4) * pyh + colm(5)
                l2 = colm(6) * pxh + colm(7) * pyh + colm(8)
                # records carry AFFINE num/den coefficients (pre-folded
                # z/w dots, pack_tri_records): 2 affine evals instead of
                # two 3-term dot products over the l's
                num = colm(9) * pxh + colm(10) * pyh + colm(11)
                den = colm(12) * pxh + colm(13) * pyh + colm(14)
                inside = ((jnp.minimum(jnp.minimum(l0, l1), l2) >= 0.0)
                          & (den > 0.0))
                depth = jnp.where(
                    inside, num / jnp.where(den == 0.0, 1.0, den), -1.0)
                if peel_ref is not None:
                    # depth peeling: only fragments strictly FARTHER
                    # than the previous layer may win (relative-epsilon
                    # bound — see raster.PEEL_BOUND: recomputed depths
                    # are not bit-reproducible across fusion contexts)
                    depth = jnp.where(
                        depth < peel_ref[sl, :][None] * PEEL_BOUND,
                        depth, -1.0)
                nodes = []
                for r in range(g):
                    ok = base + r0 + r < limit         # traced scalar
                    d_r = jnp.where(ok, depth[r], -1.0)
                    s_r = slot_origin + base + r0 + r  # traced scalar
                    nodes.append((d_r, idp[r] + emit_base, s_r))
                while len(nodes) > 1:
                    nxt = []
                    for a, b in zip(nodes[0::2], nodes[1::2]):
                        t = b[0] > a[0]
                        nxt.append((jnp.maximum(a[0], b[0]),
                                    jnp.where(t, b[1], a[1]),
                                    jnp.where(t, b[2], a[2])))
                    nodes = nxt
                dw, iw, sw = nodes[0]
                upd = dw > bz
                bz = jnp.where(upd, dw, bz)
                bi = jnp.where(upd, iw, bi)
                bs = jnp.where(upd, sw, bs)
                out += [bz, bi, bs]
            return tuple(out)

        flat = tuple(x for hh in halves for x in hh)
        flat = jax.lax.fori_loop(0, ng, body, flat)
        return [(flat[3 * h], flat[3 * h + 1], flat[3 * h + 2])
                for h in range(nh)]

    def raster_rows_smem(base, limit, slot_origin, halves):
        """Scalar-operand chunk raster: record fields come from the SMEM
        block as native scalars, so every VPU op takes a free scalar
        operand instead of a lane-slice broadcast of the record vreg.
        Round-5 probe: the batched form's 21 ms of 'math' collapsed to
        ~0 with scalar operands — materializing the 15 (g,1,1) slices
        per group was the real cost, not arithmetic.  (The round-1
        scalar design was 10x slower because it extracted from VMEM
        VECTORS; SMEM scalar loads ride the scalar unit.)"""
        pys = [(ty.astype(jnp.float32) * th + h * 8 + rowf8)
               * (1.0 / cfg.height) for h in range(nh)]
        ng = jnp.clip((limit - base + (g - 1)) // g, 0, c // g)

        def body(gi, flat):
            r0 = gi * g
            st = [list(flat[3 * h:3 * h + 3]) for h in range(nh)]
            for r in range(g):
                idx = r0 + r
                v = [smem_ref[0, idx, k] for k in range(16)]
                ok = base + idx < limit
                ci = v[15].astype(jnp.int32) + emit_base
                cs = slot_origin + base + idx
                for h in range(nh):
                    px, py = px8, pys[h]
                    l0 = v[0] * px + v[1] * py + v[2]
                    l1 = v[3] * px + v[4] * py + v[5]
                    l2 = v[6] * px + v[7] * py + v[8]
                    num = v[9] * px + v[10] * py + v[11]
                    den = v[12] * px + v[13] * py + v[14]
                    inside = ((jnp.minimum(jnp.minimum(l0, l1), l2)
                               >= 0.0) & (den > 0.0))
                    d = jnp.where(
                        inside,
                        num / jnp.where(den == 0.0, 1.0, den), -1.0)
                    if peel_ref is not None:
                        d = jnp.where(
                            d < peel_ref[_sl(h), :] * PEEL_BOUND,
                            d, -1.0)
                    upd = (d > st[h][0]) & ok
                    st[h][0] = jnp.where(upd, d, st[h][0])
                    st[h][1] = jnp.where(upd, ci, st[h][1])
                    st[h][2] = jnp.where(upd, cs, st[h][2])
            return tuple(x for hh in st for x in hh)

        flat = tuple(x for hh in halves for x in hh)
        flat = jax.lax.fori_loop(0, ng, body, flat)
        return [(flat[3 * h], flat[3 * h + 1], flat[3 * h + 2])
                for h in range(nh)]

    # padding chunks (mandatory chunk of an empty tile / budget replay)
    # skip the raster entirely — at 1080p ~half the grid steps are
    # empty-tile mandatory chunks, pure VPU waste without this guard
    @pl.when(slot_base < count)
    def _():
        if smem_ref is not None:
            write_halves(raster_rows_smem(slot_base, count, 0,
                                          read_halves()))
        else:
            write_halves(raster_rows(
                lambda r0: comb_ref[0, pl.ds(r0, g), :16],
                slot_base, count, 0, read_halves()))

    # stash this chunk's resolve records for the epilogue's one-hot fetch
    # (padding chunks past K are masked by `count` and must not clobber)
    @pl.when(jnp.logical_and(slot_base < k_cap, slot_base < count))
    def _():
        rec_scr[pl.ds(slot_base, c), :] = comb_ref[0, :, 16:]

    @pl.when(last)
    def _():
        # big triangles: only tiles their bboxes intersect test the
        # resident list (bighit prefetch)
        @pl.when(bighit_ref[tile] > 0)
        def _():
            def big_body(ci, halves):
                base = pl.multiple_of(ci * c, c)
                return raster_rows(
                    lambda r0: bigcomb_ref[pl.ds(base + r0, g), :16],
                    base, big_count, k_cap, halves)
            write_halves(jax.lax.fori_loop(
                0, (big_count + c - 1) // c, big_body, read_halves()))

        # one-hot MXU record fetch, count-blocked and bit-faithful:
        #   - MXU matmuls run in bf16 regardless of f32 inputs, which
        #     silently rounds fetched records (texture statics/ids break;
        #     UVs swim).  Each 128-slot block is split hi = bf16(rec),
        #     lo = rec - hi; one-hots are exact in bf16, so hi fetches
        #     exactly and lo restores ~17 mantissa bits.
        #   - blocks iterate ceil(count/128) instead of the full K cap,
        #     so fetch FLOPs track real binned work.
        fet_scr[...] = jnp.zeros((th, rec_width, tw), jnp.float32)
        dn = (((0,), (0,)), ((), ()))

        def fetch_blocks(src, nblk, bsz, slot_shift):
            def blk(b, _):
                rows = src(b, bsz)                       # (bsz, R) f32
                hi = rows.astype(jnp.bfloat16)
                lo = (rows - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                for r in range(th):
                    srow = slot_scr[r:r + 1, :] - slot_shift - b * bsz
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (bsz, tw), 0)
                    oh = (iota == srow).astype(jnp.bfloat16)
                    fet_scr[r] += (
                        jax.lax.dot_general(
                            hi, oh, dn,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            lo, oh, dn,
                            preferred_element_type=jnp.float32))
                return 0
            jax.lax.fori_loop(0, nblk, blk, 0)

        kb = 128 if k_cap % 128 == 0 else k_cap
        fetch_blocks(lambda b, s: rec_scr[pl.ds(b * s, s), :],
                     (jnp.minimum(count, k_cap) + kb - 1) // kb, kb, 0)
        bb = 128 if b_cap % 128 == 0 else b_cap

        @pl.when(bighit_ref[tile] > 0)
        def _():
            fetch_blocks(lambda b, s: bigcomb_ref[pl.ds(b * s, s), 16:],
                         (big_count + bb - 1) // bb, bb, k_cap)

        # --- in-VMEM interpolant resolve (gbuffer.resolve_interpolants
        # parity — the XLA function is the tested reference).  All math
        # runs on full (TH, TW) VPU blocks; record slot k of the fetched
        # records is the plane fe(k).
        def fe(k):
            return fet_scr[:, k, :]                    # (TH, TW)

        def bary(dx, dy):
            lw = [(fe(3 * v) * (pxn + dx) + fe(3 * v + 1) * (pyn + dy)
                   + fe(3 * v + 2)) * fe(9 + v) for v in range(3)]
            d = lw[0] + lw[1] + lw[2]
            d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
            return [x / d for x in lw]

        pc = bary(0.0, 0.0)
        pc_x = bary(1.0 / cfg.width, 0.0)
        pc_y = bary(0.0, 1.0 / cfg.height)

        def lerp3(base, pcv):
            return [fe(base + i) * pcv[0] + fe(base + 3 + i) * pcv[1]
                    + fe(base + 6 + i) * pcv[2] for i in range(3)]

        def lerp2(base, pcv):
            return [fe(base + i) * pcv[0] + fe(base + 2 + i) * pcv[1]
                    + fe(base + 4 + i) * pcv[2] for i in range(2)]

        nr = lerp3(12, pc)
        nn = jnp.sqrt(nr[0] * nr[0] + nr[1] * nr[1] + nr[2] * nr[2])
        nn = jnp.maximum(nn, 1e-20)
        n_w = [x / nn for x in nr]
        uv = lerp2(21, pc)
        duv_dx = [a - b for a, b in zip(lerp2(21, pc_x), uv)]
        duv_dy = [a - b for a, b in zip(lerp2(21, pc_y), uv)]
        prev_xyw = lerp3(27, pc)
        pos = lerp3(49, pc)
        dp1 = [a - b for a, b in zip(lerp3(49, pc_x), pos)]
        dp2 = [a - b for a, b in zip(lerp3(49, pc_y), pos)]

        def cross(a, b):
            return [a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0]]

        # cotangent frame (Schueler); degenerate UVs -> T = B = 0
        dp1perp = cross(n_w, dp1)
        dp2perp = cross(dp2, n_w)
        t_vec = [dp2perp[i] * duv_dx[0] + dp1perp[i] * duv_dy[0]
                 for i in range(3)]
        b_vec = [dp2perp[i] * duv_dx[1] + dp1perp[i] * duv_dy[1]
                 for i in range(3)]
        m2 = jnp.maximum(sum(x * x for x in t_vec),
                         sum(x * x for x in b_vec))
        inv_max = jax.lax.rsqrt(jnp.maximum(m2, 1e-20))
        duv2 = (sum(x * x for x in duv_dx) + sum(x * x for x in duv_dy))
        ok_tbn = jnp.logical_and(m2 > 1e-16, duv2 > 1e-12)
        t_n = [jnp.where(ok_tbn, x * inv_max, 0.0) for x in t_vec]
        b_n = [jnp.where(ok_tbn, x * inv_max, 0.0) for x in b_vec]

        planes = (n_w + uv + duv_dx + duv_dy + t_n + b_n
                  + [fe(36 + i) for i in range(4)]     # base color factor
                  + [fe(40), fe(41)]                   # metallic, roughness
                  + [fe(42 + i) for i in range(3)]     # emissive
                  + [fe(45), fe(46), fe(47), fe(48)]   # mat/tex/statics/cut
                  + prev_xyw + [fe(58)])
        keep = slot_scr[...] < 0                       # init/background
        for k, p in enumerate(planes):
            rec_out[k] = jnp.where(keep, init_rec_ref[k], p)


def _fill_resolve_stream_kernel_peel(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, bigcomb_ref, init_z_ref, init_id_ref,
        init_rec_ref, peel_ref, z_out, id_out, rec_out, slot_scr,
        rec_scr, fet_scr, **kw):
    """Depth-peeling entry: same kernel with the extra peel-bound input
    (positional ref order differs, so it needs its own signature)."""
    _fill_resolve_stream_kernel(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, bigcomb_ref, init_z_ref, init_id_ref,
        init_rec_ref, z_out, id_out, rec_out, slot_scr, rec_scr,
        fet_scr, peel_ref=peel_ref, **kw)


def _fill_resolve_stream_kernel_smem(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, comb16_ref, bigcomb_ref, init_z_ref,
        init_id_ref, init_rec_ref, z_out, id_out, rec_out, slot_scr,
        rec_scr, fet_scr, **kw):
    """SMEM-records entry: the 16-wide raster block rides an SMEM
    BlockSpec so the inner loop reads native scalar operands."""
    _fill_resolve_stream_kernel(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, bigcomb_ref, init_z_ref, init_id_ref,
        init_rec_ref, z_out, id_out, rec_out, slot_scr, rec_scr,
        fet_scr, smem_ref=comb16_ref, **kw)


def _fill_resolve_stream_kernel_smem_peel(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, comb16_ref, bigcomb_ref, init_z_ref,
        init_id_ref, init_rec_ref, peel_ref, z_out, id_out, rec_out,
        slot_scr, rec_scr, fet_scr, **kw):
    _fill_resolve_stream_kernel(
        chunk_tile_ref, chunk_base_ref, count_ref, bigcount_ref,
        bighit_ref, comb_ref, bigcomb_ref, init_z_ref, init_id_ref,
        init_rec_ref, z_out, id_out, rec_out, slot_scr, rec_scr,
        fet_scr, peel_ref=peel_ref, smem_ref=comb16_ref, **kw)


def _stream_layout(setup: dict, bins: dict, cfg: RasterConfig, comb,
                   chunk: int):
    """Chunk-grid layout shared by the streamed fill kernels: per-chunk
    tile table (empty tiles get NO chunks; tiles a big triangle's bbox
    touches get at least one), effective counts under the global budget,
    and the chunk-aligned gathered pair records.

    comb=None computes the ACCOUNTING ONLY (counts_eff/chunk grid, no
    record gather) — the telemetry path reports the pair-budget drop
    with the exact same arithmetic the kernels run under."""
    t = setup['valid'].shape[0] if comb is None else comb.shape[0]
    c = chunk
    n_tiles = cfg.num_tiles
    p_cap = cfg.resolve_pair_capacity(t)
    ch_cap = -(-p_cap // c) + n_tiles

    counts = bins['counts']                        # (tiles,) <= K
    offs = bins['offs'][:-1].astype(jnp.int32)     # (tiles,)
    vals_s = bins['vals_s']
    big_list = bins['big_list']

    bvalid = big_list >= 0
    bl = jnp.maximum(big_list, 0)
    btx = jnp.arange(cfg.tiles_x, dtype=jnp.int32)
    bty = jnp.arange(cfg.tiles_y, dtype=jnp.int32)
    hit_x = ((btx[None, :] >= setup['tx0'][bl][:, None])
             & (btx[None, :] <= setup['tx1'][bl][:, None]))  # (B, TX)
    hit_y = ((bty[None, :] >= setup['ty0'][bl][:, None])
             & (bty[None, :] <= setup['ty1'][bl][:, None]))  # (B, TY)
    bighit = jnp.any(hit_y[:, :, None] & hit_x[:, None, :]
                     & bvalid[:, None, None], axis=0)
    bighit = bighit.reshape(-1).astype(jnp.int32)  # (tiles,)
    want = jnp.maximum(-(-counts // c), bighit)    # (tiles,)
    before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(want)])[:-1]
    n_chunks = jnp.clip(ch_cap - before, 0, want)  # (tiles,) >= 0
    counts_eff = jnp.minimum(counts, n_chunks * c)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(n_chunks)]).astype(jnp.int32)  # (tiles+1,)
    total_chunks = chunk_base[-1]

    # padding chunks REPLAY the tile of the last real chunk so `last`
    # fires exactly once with all state resident
    jj = jnp.arange(ch_cap, dtype=jnp.int32)
    chunk_tile = jnp.searchsorted(chunk_base, jj, side='right') - 1
    last_tile = jnp.where(
        total_chunks > 0,
        jnp.clip(jnp.searchsorted(chunk_base,
                                  jnp.maximum(total_chunks - 1, 0),
                                  side='right') - 1, 0, n_tiles - 1),
        0)
    chunk_tile = jnp.where(jj < total_chunks, chunk_tile,
                           last_tile).astype(jnp.int32)

    if comb is None:
        return dict(ch_cap=ch_cap, counts_eff=counts_eff,
                    total_chunks=total_chunks,
                    counts_clamped=counts)

    # chunk-aligned pair records: chunk-invariant indices at CHUNK rate,
    # only the two per-pair indirections (vals_s, comb) at pair rate
    lane = jnp.arange(c, dtype=jnp.int32)[None, :]
    cb_t = chunk_base[chunk_tile]                  # (ch_cap,)
    ce_t = counts_eff[chunk_tile]
    of_t = offs[chunk_tile]
    base_local = (jnp.arange(ch_cap, dtype=jnp.int32) - cb_t) * c
    local = base_local[:, None] + lane             # (ch_cap, c)
    valid = local < ce_t[:, None]
    src = jnp.clip(of_t[:, None] + local, 0, vals_s.shape[0] - 1)
    rows = jnp.clip(vals_s[jnp.where(valid, src, 0).reshape(-1)],
                    0, t - 1)
    comb_padded = comb[rows].reshape(ch_cap, c, comb.shape[1])

    big_safe = jnp.maximum(big_list, 0)
    big_comb = comb[big_safe]
    big_count = jnp.sum((big_list >= 0).astype(jnp.int32)).reshape(1)
    return dict(ch_cap=ch_cap, chunk_tile=chunk_tile,
                chunk_base=chunk_base[:-1], counts_eff=counts_eff,
                bighit=bighit, comb_padded=comb_padded,
                big_comb=big_comb, big_count=big_count)


def _fill_peel_stream_kernel(
        chunk_tile_ref,      # prefetch (CH,) i32: tile of each chunk
        chunk_base_ref,      # prefetch (tiles,) i32: first chunk of tile
        count_ref,           # prefetch (tiles,) i32: effective pair count
        bigcount_ref,        # prefetch (1,) i32
        bighit_ref,          # prefetch (tiles,) i32
        comb_ref,            # (1, C, 16) streamed pair records
        bigcomb_ref,         # (B, 16) big-triangle records (resident)
        init_z_ref,          # (L, TH, TW) f32
        init_id_ref,         # (L, TH, TW) i32
        z_out, id_out,       # (L, TH, TW)
        *, cfg: RasterConfig, chunk: int, emit_base: int, layers: int):
    """Lean L-layer depth-peel fill: per pixel the L NEAREST fragments
    (descending depth; reverse-Z so larger = nearer), maintained by an
    in-register insertion cascade — ONE pass over the binned pairs
    instead of L sequential fills.  No record streaming, no resolve
    epilogue: the masked set's textured resolve happens compacted
    downstream (gbuffer.masked_resolve_compact), where only covered
    quads pay (basepass.hlsl ALPHA_MASK_MODE discard, the TPU way)."""
    j = pl.program_id(0)
    n_ch = pl.num_programs(0)
    tile = chunk_tile_ref[j]
    first = jnp.logical_or(
        j == 0, chunk_tile_ref[jnp.maximum(j - 1, 0)] != tile)
    last = jnp.logical_or(
        j == n_ch - 1, chunk_tile_ref[jnp.minimum(j + 1, n_ch - 1)] != tile)
    c = chunk
    slot_base = (j - chunk_base_ref[tile]) * c
    count = count_ref[tile]
    big_count = bigcount_ref[0]

    th, tw = cfg.tile_h, cfg.tile_w
    ty = tile // cfg.tiles_x
    tx = tile % cfg.tiles_x

    @pl.when(first)
    def _():
        z_out[...] = init_z_ref[...]
        id_out[...] = init_id_ref[...]

    g = 8
    nh = th // 8

    def _sl(h):
        return slice(h * 8, (h + 1) * 8)

    def read_halves():
        out = []
        for h in range(nh):
            st = []
            for l in range(layers):
                st.append(z_out[l, _sl(h), :])
                st.append(id_out[l, _sl(h), :])
            out.append(tuple(st))
        return out

    def write_halves(halves):
        for h in range(nh):
            for l in range(layers):
                z_out[l, _sl(h), :] = halves[h][2 * l]
                id_out[l, _sl(h), :] = halves[h][2 * l + 1]

    colf8 = jax.lax.broadcasted_iota(
        jnp.int32, (8, tw), 1).astype(jnp.float32) + 0.5
    rowf8 = jax.lax.broadcasted_iota(
        jnp.int32, (8, tw), 0).astype(jnp.float32) + 0.5
    px8 = (tx.astype(jnp.float32) * tw + colf8) * (1.0 / cfg.width)

    def raster_rows(read_group, base, limit, halves):
        ng = jnp.clip((limit - base + (g - 1)) // g, 0, c // g)
        pxh = px8[None]
        pyhs = [((ty.astype(jnp.float32) * th + h * 8 + rowf8)
                 * (1.0 / cfg.height))[None] for h in range(nh)]

        import os as _os
        _probe = _os.environ.get('TR_FILL_PROBE', '')

        def body(gi, hs):
            r0 = pl.multiple_of(gi * g, g)
            rg = read_group(r0)

            if _probe == 'noconst':
                # timing probe: identical math shape with SCALAR record
                # fields (wrong output) — isolates the cost of the 15
                # (g,1,1)-slice broadcasts against one (8,16) source
                base_f = (gi + 1).astype(jnp.float32)

                def colm(f):
                    return (base_f * (0.125 * f + 0.5)
                            * jnp.ones((g, 1, 1)))
            else:
                def colm(f):
                    return rg[:, f:f + 1][:, :, None]  # (g, 1, 1)
            idp = colm(15) * jnp.ones((1, 8, tw))
            if _probe == 'noeval':
                # timing probe: loop + DMA structure only (wrong output)
                return tuple(x + idp[0] * 0.0 if x.dtype == jnp.float32
                             else x for x in hs)
            out = []
            for h in range(nh):
                pyh = pyhs[h]
                st = list(hs[h * 2 * layers:(h + 1) * 2 * layers])
                l0 = colm(0) * pxh + colm(1) * pyh + colm(2)
                l1 = colm(3) * pxh + colm(4) * pyh + colm(5)
                l2 = colm(6) * pxh + colm(7) * pyh + colm(8)
                # affine num/den coefficients (pack_tri_records)
                num = colm(9) * pxh + colm(10) * pyh + colm(11)
                den = colm(12) * pxh + colm(13) * pyh + colm(14)
                inside = ((jnp.minimum(jnp.minimum(l0, l1), l2) >= 0.0)
                          & (den > 0.0))
                if _probe == 'nodiv':
                    # timing probe: is the VPU divide the wall?
                    depth = jnp.where(inside, num * den, -1.0)
                else:
                    depth = jnp.where(
                        inside, num / jnp.where(den == 0.0, 1.0, den),
                        -1.0)
                for r in range(g):
                    ok = base + r0 + r < limit
                    cz = jnp.where(ok, depth[r], -1.0)
                    ci = idp[r].astype(jnp.int32) + emit_base
                    # insertion cascade: the displaced fragment carries
                    # down one layer.  NEAR-EQUAL depths (the relative
                    # PEEL_BOUND band) drop the incoming fragment
                    # (sequential peeling's `strictly farther than layer
                    # k` bound): coincident fragments — e.g. the shared
                    # diagonal of a quad's two triangles — must not
                    # occupy two layers, and sub-ulp recomputation noise
                    # must not let a surface self-leak into layer 2
                    for l in range(layers):
                        cz = jnp.where(
                            (cz <= st[2 * l])
                            & (cz >= st[2 * l] * PEEL_BOUND), -1.0, cz)
                        win = cz > st[2 * l]
                        nz = jnp.where(win, cz, st[2 * l])
                        ni = jnp.where(win, ci, st[2 * l + 1])
                        cz = jnp.where(win, st[2 * l], cz)
                        ci = jnp.where(win, st[2 * l + 1], ci)
                        st[2 * l], st[2 * l + 1] = nz, ni
                out += st
            return tuple(out)

        flat = tuple(x for hh in halves for x in hh)
        flat = jax.lax.fori_loop(0, ng, body, flat)
        return [tuple(flat[h * 2 * layers:(h + 1) * 2 * layers])
                for h in range(nh)]

    @pl.when(slot_base < count)
    def _():
        write_halves(raster_rows(
            lambda r0: comb_ref[0, pl.ds(r0, g), :16],
            slot_base, count, read_halves()))

    @pl.when(jnp.logical_and(last, bighit_ref[tile] > 0))
    def _():
        def big_body(ci, halves):
            base = pl.multiple_of(ci * c, c)
            return raster_rows(
                lambda r0: bigcomb_ref[pl.ds(base + r0, g), :16],
                base, big_count, halves)
        write_halves(jax.lax.fori_loop(
            0, (big_count + c - 1) // c, big_body, read_halves()))


def fill_peel_stream(setup: dict, bins: dict, cfg: RasterConfig,
                     layers: int = 2, emit_base: int = 0,
                     occluder_depth=None, interpret: bool = False):
    """Streamed L-layer depth-peel visibility fill (no resolve).

    Returns (depth (L, H, W) f32, tri_id (L, H, W) i32), layer 0 nearest.
    One pass over the binned pair stream replaces L sequential fills for
    the alpha-masked set; pair with masked_resolve_compact so the
    textured resolve also runs only on covered quads.

    occluder_depth: optional (H, W) reverse-Z depth seeding EVERY layer —
    fragments at or behind it never win a slot (they could never pass the
    downstream depth test either), so foliage hidden behind opaque walls
    costs nothing in the compacted resolve."""
    comb = pack_tri_records(setup)
    c = min(cfg.chunk, cfg.max_tris_per_tile, cfg.max_big_tris)
    lay = _stream_layout(setup, bins, cfg, comb, c)

    th, tw = cfg.tile_h, cfg.tile_w
    hp, wp = cfg.tiles_y * th, cfg.tiles_x * tw
    if occluder_depth is None:
        init_z = jnp.zeros((layers, hp, wp), jnp.float32)
    else:
        init_z = jnp.broadcast_to(
            pad_image(occluder_depth, cfg)[None], (layers, hp, wp))
        init_z = jnp.asarray(init_z)        # materialize for aliasing
    init_id = jnp.full((layers, hp, wp), -1, jnp.int32)

    tx_ = cfg.tiles_x
    by_tile3 = lambda j, ct, cb, c_, b_, bh: (0, ct[j] // tx_, ct[j] % tx_)  # noqa: E731,E501
    lay_block = pl.BlockSpec((layers, th, tw), by_tile3,
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(lay['ch_cap'],),
        in_specs=[
            pl.BlockSpec((1, c, REC),
                         lambda j, ct, cb, c_, b_, bh: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.max_big_tris, REC),
                         lambda j, ct, cb, c_, b_, bh: (0, 0),
                         memory_space=pltpu.VMEM),
            lay_block,
            lay_block,
        ],
        out_specs=[lay_block, lay_block],
    )
    z, tid = pl.pallas_call(
        functools.partial(_fill_peel_stream_kernel, cfg=cfg, chunk=c,
                          emit_base=emit_base, layers=layers),
        out_shape=(
            jax.ShapeDtypeStruct((layers, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((layers, hp, wp), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={7: 0, 8: 1},
    )(lay['chunk_tile'], lay['chunk_base'], lay['counts_eff'],
      lay['big_count'], lay['bighit'], lay['comb_padded'],
      lay['big_comb'], init_z, init_id)
    return z[:, :cfg.height, :cfg.width], tid[:, :cfg.height, :cfg.width]


def fill_resolve_stream(setup: dict, resolve_records, bins: dict,
                        cfg: RasterConfig, init_depth=None,
                        init_tri_id=None, init_rec=None,
                        emit_base: int = 0, padded_io: bool = False,
                        peel_depth=None, interpret: bool = False):
    """Streamed fused fill + in-VMEM interpolant resolve.

    resolve_records: (T, R) f32 from gbuffer.pack_resolve_records.
    init_rec: optional (INTERP_C, H, W) interp planes from a previous
    phase.  Returns (depth (H, W), tri_id (H, W),
    interp (INTERP_C, H, W)) — the per-pixel interpolant stack
    (gbuffer.INTERP_C layout, channel-FIRST image planes), NOT raw
    records; feed gbuffer.finish_gbuffer / resolve_gbuffer directly.
    Output blocks are placed straight into the images by the BlockSpec
    index maps, so there are NO tile<->image transposes anywhere.

    padded_io=True keeps all images padded to the tile grid on BOTH ends
    (multi-phase pipelines skip the pad/crop between phases).
    peel_depth: optional (H, W) EXCLUSIVE near bound — only fragments
    strictly farther than it can win (depth-peeling OIT layers).
    Cost scales with real binned pairs instead of tiles x K capacity.
    """
    r = resolve_records.shape[1]
    comb = jnp.concatenate([pack_tri_records(setup), resolve_records], 1)
    t = comb.shape[0]
    # clamp the stream chunk to the capacities (small test configs run
    # with tiny K/B; the big default chunk amortizes per-grid-step cost)
    c = min(cfg.chunk, cfg.max_tris_per_tile, cfg.max_big_tris)
    n_tiles = cfg.num_tiles
    k_cap = cfg.max_tris_per_tile
    assert k_cap % c == 0, "max_tris_per_tile must be a CHUNK_S multiple"
    assert cfg.max_big_tris % c == 0, \
        "max_big_tris must be a CHUNK_S multiple"
    lay = _stream_layout(setup, bins, cfg, comb, c)
    ch_cap = lay['ch_cap']
    chunk_tile = lay['chunk_tile']
    chunk_base = lay['chunk_base']
    counts_eff = lay['counts_eff']
    bighit = lay['bighit']
    comb_padded = lay['comb_padded']
    big_comb = lay['big_comb']
    big_count = lay['big_count']

    th, tw = cfg.tile_h, cfg.tile_w
    hp, wp = cfg.tiles_y * th, cfg.tiles_x * tw
    if init_depth is None:
        init_z = jnp.zeros((hp, wp), jnp.float32)
        init_id = jnp.full((hp, wp), -1, jnp.int32)
    elif padded_io:
        init_z, init_id = init_depth, init_tri_id
    else:
        init_z = pad_image(init_depth, cfg)
        init_id = pad_image(init_tri_id, cfg, fill=-1)
    if init_rec is None:
        init_rec = jnp.zeros((INTERP_C, hp, wp), jnp.float32)
    elif not padded_io:
        init_rec = pad_image(init_rec, cfg)
    if peel_depth is not None and not padded_io:
        peel_depth = pad_image(peel_depth, cfg)

    tx_ = cfg.tiles_x
    by_tile = lambda j, ct, cb, c_, b_, bh: (ct[j] // tx_, ct[j] % tx_)  # noqa: E731,E501
    by_tile3 = lambda j, ct, cb, c_, b_, bh: (0, ct[j] // tx_, ct[j] % tx_)  # noqa: E731,E501
    import os as _os
    smem_mode = _os.environ.get('TR_FILL_SMEM', '0') == '1'
    in_specs = [
        pl.BlockSpec((1, c, REC + r),
                     lambda j, ct, cb, c_, b_, bh: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cfg.max_big_tris, REC + r),
                     lambda j, ct, cb, c_, b_, bh: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((th, tw), by_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((th, tw), by_tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((INTERP_C, th, tw), by_tile3,
                     memory_space=pltpu.VMEM),
    ]
    if smem_mode:
        # the 16-wide raster fields ALSO stream as an SMEM block so the
        # inner loop reads native scalar operands (see raster_rows_smem)
        in_specs.insert(1, pl.BlockSpec(
            (1, c, REC), lambda j, ct, cb, c_, b_, bh: (j, 0, 0),
            memory_space=pltpu.SMEM))
    if peel_depth is not None:
        in_specs.append(
            pl.BlockSpec((th, tw), by_tile, memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ch_cap,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((INTERP_C, th, tw), by_tile3,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.int32),
                        pltpu.VMEM((k_cap, r), jnp.float32),
                        pltpu.VMEM((th, r, tw), jnp.float32)],
    )
    kernel = _fill_resolve_stream_kernel
    inputs = [chunk_tile, chunk_base, counts_eff, big_count,
              bighit, comb_padded, big_comb, init_z, init_id,
              init_rec]
    if smem_mode:
        kernel = _fill_resolve_stream_kernel_smem
        inputs.insert(6, comb_padded[:, :, :REC])
    if peel_depth is not None:
        kernel = (_fill_resolve_stream_kernel_smem_peel if smem_mode
                  else _fill_resolve_stream_kernel_peel)
        inputs.append(peel_depth)
    z, tid, rec = pl.pallas_call(
        functools.partial(kernel, cfg=cfg, chunk=c,
                          emit_base=emit_base, rec_width=r),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((INTERP_C, hp, wp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        # init planes alias the outputs: tiles no chunk visits keep their
        # init content without any work (indices count the flattened
        # inputs INCLUDING the scalar-prefetch operands; the SMEM record
        # block inserted before bigcomb shifts them by one)
        input_output_aliases=({8: 0, 9: 1, 10: 2} if smem_mode
                              else {7: 0, 8: 1, 9: 2}),
    )(*inputs)
    if padded_io:
        return z, tid, rec
    return crop_image(z, cfg), crop_image(tid, cfg), crop_image(rec, cfg)
