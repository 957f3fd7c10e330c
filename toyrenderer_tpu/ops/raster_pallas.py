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

from toyrenderer_tpu.ops.raster import RasterConfig

REC = 16


def pack_tri_records(setup: dict, ids=None) -> jnp.ndarray:
    """(T, 16) f32 packed records from the triangle setup.  Slot 15 holds
    the triangle id as f32 (exact below 2^24); pass explicit `ids` to bake
    emit offsets / -1 sentinels."""
    t = setup['valid'].shape[0]
    if ids is None:
        ids = jnp.arange(t, dtype=jnp.int32)
    rec = jnp.concatenate([
        setup['edges'].reshape(t, 9),
        setup['zs'],
        setup['ws'],
        ids.astype(jnp.float32)[:, None],
    ], axis=1)
    return rec


def _fill_kernel(counts_ref,            # scalar prefetch: (tiles, 2) i32
                 rec_ref,               # (1, K, 16) f32 tile triangle recs
                 bigrec_ref,            # (B, 16) f32 big-triangle records
                 init_z_ref,            # (1, TH, TW) f32
                 init_id_ref,           # (1, TH, TW) i32
                 z_out,                 # (1, TH, TW) f32
                 id_out,                # (1, TH, TW) i32
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
        def body(ci, _):
            base = pl.multiple_of(ci * c, c)
            rec = rec_src(base)                       # (C, 16)
            best_z = z_out[0]
            best_id = id_out[0]
            for j in range(c):
                e = rec[j]
                l0 = e[0] * pxn + e[1] * pyn + e[2]
                l1 = e[3] * pxn + e[4] * pyn + e[5]
                l2 = e[6] * pxn + e[7] * pyn + e[8]
                num = l0 * e[9] + l1 * e[10] + l2 * e[11]
                den = l0 * e[12] + l1 * e[13] + l2 * e[14]
                inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                          & (den > 0.0))
                depth = jnp.where(
                    inside, num / jnp.where(den == 0.0, 1.0, den), -1.0)
                tri_id = e[15]                        # f32 id, -1 = empty
                # chunk overshoot reads -1-id slots — mask them out
                upd = (depth > best_z) & (tri_id >= 0.0)
                best_z = jnp.where(upd, depth, best_z)
                best_id = jnp.where(
                    upd, tri_id.astype(jnp.int32) + emit_base, best_id)
            z_out[0] = best_z
            id_out[0] = best_id
            return 0
        return body

    count = counts_ref[i, 0]
    n_chunks = (count + c - 1) // c
    jax.lax.fori_loop(
        0, n_chunks, make_body(lambda b: rec_ref[0, pl.ds(b, c), :]), 0)

    big_count = counts_ref[i, 1]
    n_big = (big_count + c - 1) // c
    jax.lax.fori_loop(
        0, n_big, make_body(lambda b: bigrec_ref[pl.ds(b, c), :]), 0)


def fill_visibility_pallas(setup: dict, tile_table, tile_count, big_list,
                           cfg: RasterConfig, init_depth=None,
                           init_tri_id=None, chunk: int = 8,
                           emit_base: int = 0):
    """Pallas fill: returns (depth (H, W) f32, tri_id (H, W) i32)."""
    rec = pack_tri_records(setup)                     # (T, 16)
    safe = jnp.maximum(tile_table, 0)
    tile_recs = rec[safe]                             # (tiles, K, 16)
    # re-stamp slot 15 with the TABLE's id (-1 for empty slots)
    tile_recs = tile_recs.at[:, :, 15].set(tile_table.astype(jnp.float32))
    big_safe = jnp.maximum(big_list, 0)
    big_recs = rec[big_safe]                          # (B, 16)
    big_recs = big_recs.at[:, 15].set(big_list.astype(jnp.float32))
    big_count = jnp.sum((big_list >= 0).astype(jnp.int32))
    counts = jnp.stack(
        [tile_count,
         jnp.broadcast_to(big_count, tile_count.shape)], axis=1)

    n_tiles = cfg.num_tiles
    th, tw = cfg.tile_h, cfg.tile_w
    if init_depth is None:
        init_z = jnp.zeros((n_tiles, th, tw), jnp.float32)
        init_id = jnp.full((n_tiles, th, tw), -1, jnp.int32)
    else:
        init_z = _image_to_tiles(init_depth, cfg)
        init_id = _image_to_tiles(init_tri_id, cfg)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, cfg.max_tris_per_tile, REC),
                         lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.max_big_tris, REC),
                         lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    z, tid = pl.pallas_call(
        functools.partial(_fill_kernel, cfg=cfg, chunk=chunk,
                          emit_base=emit_base),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.int32),
        ),
        grid_spec=grid_spec,
    )(counts, tile_recs, big_recs, init_z, init_id)
    return _tiles_to_image(z, cfg), _tiles_to_image(tid, cfg)


def _image_to_tiles(img, cfg: RasterConfig):
    th, tw = cfg.tile_h, cfg.tile_w
    hpad = cfg.tiles_y * th - cfg.height
    wpad = cfg.tiles_x * tw - cfg.width
    p = jnp.pad(img, ((0, hpad), (0, wpad)))
    p = p.reshape(cfg.tiles_y, th, cfg.tiles_x, tw)
    return jnp.transpose(p, (0, 2, 1, 3)).reshape(cfg.num_tiles, th, tw)


def _tiles_to_image(tiles, cfg: RasterConfig):
    th, tw = cfg.tile_h, cfg.tile_w
    img = tiles.reshape(cfg.tiles_y, cfg.tiles_x, th, tw)
    img = jnp.transpose(img, (0, 2, 1, 3))
    img = img.reshape(cfg.tiles_y * th, cfg.tiles_x * tw)
    return img[:cfg.height, :cfg.width]


# ---------------------------------------------------------------------------
# Fused fill + resolve-record fetch
# ---------------------------------------------------------------------------
#
# The per-pixel gather of 52-float resolve records (records[tri_id]) is the
# single most expensive op of the frame on TPU (~34 ms at 1080p: 2M random
# 208-byte rows).  This kernel removes it entirely: the fill tracks each
# pixel's winning LOCAL slot in the tile's triangle list, then fetches the
# records with ONE-HOT MATMULS on the MXU — (pixels x slots) @ (slots x 52)
# — the classic TPU gather-as-matmul reshaping.  Everything stays in the
# transposed (R, lanes) orientation so no lane<->sublane reshapes are
# needed: per pixel ROW, one-hot^T (slots x 128 lanes) contracts with
# records^T (R x slots) into (R x 128).  Output records are written in
# (tiles, TH, R, TW) layout and reassembled to an (H, W, R) image by pure
# transposes in XLA.


def _fill_resolve_kernel(counts_ref,     # scalar prefetch (tiles, 2) i32
                         comb_ref,       # (1, K, 16+R) f32 fill+resolve recs
                         bigcomb_ref,    # (B, 16+R) f32
                         init_z_ref,     # (1, TH, TW) f32
                         init_id_ref,    # (1, TH, TW) i32
                         init_rec_ref,   # (1, TH, R, TW) f32
                         z_out,          # (1, TH, TW) f32
                         id_out,         # (1, TH, TW) i32
                         rec_out,        # (1, TH, R, TW) f32
                         slot_scr,       # scratch (TH, TW) i32
                         *, cfg: RasterConfig, chunk: int, emit_base: int,
                         rec_width: int):
    i = pl.program_id(0)
    ty = i // cfg.tiles_x
    tx = i % cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    k_cap = cfg.max_tris_per_tile
    b_cap = cfg.max_big_tris

    colf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    rowf = jax.lax.broadcasted_iota(
        jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5
    pxn = (tx.astype(jnp.float32) * tw + colf) * (1.0 / cfg.width)
    pyn = (ty.astype(jnp.float32) * th + rowf) * (1.0 / cfg.height)

    z_out[...] = init_z_ref[...]
    id_out[...] = init_id_ref[...]
    slot_scr[...] = jnp.full((th, tw), -1, jnp.int32)

    c = chunk

    def make_body(rec_src, slot_base, limit):
        def body(ci, _):
            base = pl.multiple_of(ci * c, c)
            rec = rec_src(base)                       # (C, 16)
            best_z = z_out[0]
            best_id = id_out[0]
            best_slot = slot_scr[...]
            for j in range(c):
                e = rec[j]
                l0 = e[0] * pxn + e[1] * pyn + e[2]
                l1 = e[3] * pxn + e[4] * pyn + e[5]
                l2 = e[6] * pxn + e[7] * pyn + e[8]
                num = l0 * e[9] + l1 * e[10] + l2 * e[11]
                den = l0 * e[12] + l1 * e[13] + l2 * e[14]
                inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                          & (den > 0.0))
                depth = jnp.where(
                    inside, num / jnp.where(den == 0.0, 1.0, den), -1.0)
                # chunk overshoot guarded by the REAL count (no id
                # re-stamping needed; slot 15 keeps the true global id)
                upd = (depth > best_z) & (base + j < limit)
                best_z = jnp.where(upd, depth, best_z)
                best_id = jnp.where(
                    upd, e[15].astype(jnp.int32) + emit_base, best_id)
                best_slot = jnp.where(upd, slot_base + base + j, best_slot)
            z_out[0] = best_z
            id_out[0] = best_id
            slot_scr[...] = best_slot
            return 0
        return body

    count = counts_ref[i, 0]
    jax.lax.fori_loop(
        0, (count + c - 1) // c,
        make_body(lambda b: comb_ref[0, pl.ds(b, c), :16], 0, count), 0)
    big_count = counts_ref[i, 1]
    jax.lax.fori_loop(
        0, (big_count + c - 1) // c,
        make_body(lambda b: bigcomb_ref[pl.ds(b, c), :16], k_cap,
                  big_count), 0)

    # --- one-hot MXU record fetch: contract slots on dim 0 (no
    # transposes).  hi/lo bf16 split keeps the fetch faithful: Mosaic
    # lowers f32 dots to ONE bf16 MXU pass, which silently rounds
    # records (see _fill_resolve_stream_kernel for the full rationale).
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    res_tile_hi, res_tile_lo = hilo(comb_ref[0, :, 16:])   # (K, R)
    res_big_hi, res_big_lo = hilo(bigcomb_ref[:, 16:])     # (B, R)
    dn = (((0,), (0,)), ((), ()))                      # contract slot dims
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_cap, tw), 0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (b_cap, tw), 0)

    def fetch(hi, lo, oh):
        return (jax.lax.dot_general(
                    hi, oh, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    lo, oh, dn, preferred_element_type=jnp.float32))

    for r in range(th):                                # static unroll
        srow = slot_scr[r:r + 1, :]                    # (1, TW)
        oh_k = (iota_k == srow).astype(jnp.bfloat16)   # (K, TW)
        oh_b = (iota_b == (srow - k_cap)).astype(jnp.bfloat16)
        # contracting dim0 of (K,R) with dim0 of (K,TW) yields (R, TW)
        fetched = (fetch(res_tile_hi, res_tile_lo, oh_k)
                   + fetch(res_big_hi, res_big_lo, oh_b))
        keep = srow < 0                                # init/background
        init = init_rec_ref[0, r]                      # (R, TW)
        rec_out[0, r] = jnp.where(keep, init, fetched)


def fill_resolve_pallas(setup: dict, resolve_records, tile_table,
                        tile_count, big_list, cfg: RasterConfig,
                        init_depth=None, init_tri_id=None, init_rec=None,
                        chunk: int = 8, emit_base: int = 0,
                        tiles_io: bool = False):
    """Fused fill + record fetch.

    resolve_records: (T, R) f32 from gbuffer.pack_resolve_records.
    init_rec: optional (tiles, TH, R, TW) from a previous phase.
    Returns (depth (H,W), tri_id (H,W), rec_tiles (tiles, TH, R, TW)).
    Use rec_tiles_to_image() after the LAST phase.

    tiles_io=True keeps depth/id in (tiles, TH, TW) layout on BOTH ends
    (multi-phase pipelines avoid the tile<->image transposes between
    phases — they are pure data formatting, ~1.5 ms each at 1080p).
    """
    r = resolve_records.shape[1]
    # ONE fused (16 + R)-wide row gather per (tile, slot): fill setup and
    # resolve record travel together; validity comes from the counts, so
    # no id re-stamping copies are needed
    comb = jnp.concatenate([pack_tri_records(setup), resolve_records], 1)
    safe = jnp.maximum(tile_table, 0)
    tile_comb = comb[safe]                             # (tiles, K, 16+R)
    big_safe = jnp.maximum(big_list, 0)
    big_comb = comb[big_safe]                          # (B, 16+R)
    big_count = jnp.sum((big_list >= 0).astype(jnp.int32))
    counts = jnp.stack(
        [tile_count, jnp.broadcast_to(big_count, tile_count.shape)], 1)

    n_tiles = cfg.num_tiles
    th, tw = cfg.tile_h, cfg.tile_w
    if init_depth is None:
        init_z = jnp.zeros((n_tiles, th, tw), jnp.float32)
        init_id = jnp.full((n_tiles, th, tw), -1, jnp.int32)
    elif tiles_io:
        init_z, init_id = init_depth, init_tri_id
    else:
        init_z = _image_to_tiles(init_depth, cfg)
        init_id = _image_to_tiles(init_tri_id, cfg)
    if init_rec is None:
        init_rec = jnp.zeros((n_tiles, th, r, tw), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, cfg.max_tris_per_tile, REC + r),
                         lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.max_big_tris, REC + r),
                         lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, r, tw), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, r, tw), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.int32)],
    )
    z, tid, rec_tiles = pl.pallas_call(
        functools.partial(_fill_resolve_kernel, cfg=cfg, chunk=chunk,
                          emit_base=emit_base, rec_width=r),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, th, r, tw), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(counts, tile_comb, big_comb, init_z, init_id, init_rec)
    if tiles_io:
        return z, tid, rec_tiles
    return _tiles_to_image(z, cfg), _tiles_to_image(tid, cfg), rec_tiles


# ---------------------------------------------------------------------------
# Streamed fill + resolve: chunk grid over REAL binned pairs
# ---------------------------------------------------------------------------
#
# The fused kernel above still streams a DENSE (tiles, K, 16+R) table — at
# 1080p that is ~520k slots for ~30k real (tile, tri) pairs (measured on the
# bench scene), and the XLA-side gathers that build it cost ~16 ms/frame.
# This variant bins to a SORTED pair stream instead (raster.bin_pairs_stream)
# and lets the Pallas grid walk chunk-aligned slices of it:
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

CHUNK_S = 32


def _fill_resolve_stream_kernel(
        chunk_tile_ref,      # prefetch (CH,) i32: tile of each chunk
        chunk_base_ref,      # prefetch (tiles,) i32: first chunk of tile
        tcount_ref,          # prefetch (tiles, 2) i32: [pair count, big count]
        comb_ref,            # (1, C, 16+R) streamed pair records
        bigcomb_ref,         # (B, 16+R) big-triangle records (resident)
        init_z_ref,          # (1, TH, TW) f32 (indexed by tile)
        init_id_ref,         # (1, TH, TW) i32
        init_rec_ref,        # (1, TH, R, TW) f32
        z_out, id_out,       # (1, TH, TW)
        rec_out,             # (1, TH, R, TW) f32
        slot_scr,            # VMEM (TH, TW) i32
        rec_scr,             # VMEM (K, R) f32
        *, cfg: RasterConfig, emit_base: int, rec_width: int):
    j = pl.program_id(0)
    n_ch = pl.num_programs(0)
    tile = chunk_tile_ref[j]
    first = jnp.logical_or(
        j == 0, chunk_tile_ref[jnp.maximum(j - 1, 0)] != tile)
    last = jnp.logical_or(
        j == n_ch - 1, chunk_tile_ref[jnp.minimum(j + 1, n_ch - 1)] != tile)
    c = CHUNK_S
    slot_base = (j - chunk_base_ref[tile]) * c
    count = tcount_ref[tile, 0]
    big_count = tcount_ref[tile, 1]

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

    def raster_rows(rec, base, limit, slot_origin, best):
        best_z, best_id, best_slot = best
        for r in range(c):
            e = rec[r]
            l0 = e[0] * pxn + e[1] * pyn + e[2]
            l1 = e[3] * pxn + e[4] * pyn + e[5]
            l2 = e[6] * pxn + e[7] * pyn + e[8]
            num = l0 * e[9] + l1 * e[10] + l2 * e[11]
            den = l0 * e[12] + l1 * e[13] + l2 * e[14]
            inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                      & (den > 0.0))
            depth = jnp.where(
                inside, num / jnp.where(den == 0.0, 1.0, den), -1.0)
            upd = (depth > best_z) & (base + r < limit)
            best_z = jnp.where(upd, depth, best_z)
            best_id = jnp.where(
                upd, e[15].astype(jnp.int32) + emit_base, best_id)
            best_slot = jnp.where(upd, slot_origin + base + r, best_slot)
        return best_z, best_id, best_slot

    # padding chunks (mandatory chunk of an empty tile / budget replay)
    # skip the raster entirely — at 1080p ~half the grid steps are
    # empty-tile mandatory chunks, pure VPU waste without this guard
    @pl.when(slot_base < count)
    def _():
        best = (z_out[0], id_out[0], slot_scr[...])
        best = raster_rows(comb_ref[0, :, :16], slot_base, count, 0, best)
        z_out[0], id_out[0], slot_scr[...] = best

    # stash this chunk's resolve records for the epilogue's one-hot fetch
    # (padding chunks past K are masked by `count` and must not clobber)
    @pl.when(jnp.logical_and(slot_base < k_cap, slot_base < count))
    def _():
        rec_scr[pl.ds(slot_base, c), :] = comb_ref[0, :, 16:]

    @pl.when(last)
    def _():
        # big triangles: every tile tests the resident list
        def big_body(ci, best):
            base = pl.multiple_of(ci * c, c)
            return raster_rows(bigcomb_ref[pl.ds(base, c), :16], base,
                               big_count, k_cap, best)
        best2 = (z_out[0], id_out[0], slot_scr[...])
        best2 = jax.lax.fori_loop(0, (big_count + c - 1) // c, big_body,
                                  best2)
        z_out[0], id_out[0], slot_scr[...] = best2

        # one-hot MXU record fetch, count-blocked and bit-faithful:
        #   - MXU matmuls run in bf16 regardless of f32 inputs, which
        #     silently rounds fetched records (texture statics/ids break;
        #     UVs swim).  Each 128-slot block is split hi = bf16(rec),
        #     lo = rec - hi; one-hots are exact in bf16, so hi fetches
        #     exactly and lo restores ~17 mantissa bits.
        #   - blocks iterate ceil(count/128) instead of the full K cap,
        #     so fetch FLOPs track real binned work.
        for r in range(th):
            keep = slot_scr[r:r + 1, :] < 0
            rec_out[0, r] = jnp.where(keep, init_rec_ref[0, r], 0.0)

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
                    rec_out[0, r] += (
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
        fetch_blocks(lambda b, s: bigcomb_ref[pl.ds(b * s, s), 16:],
                     (big_count + bb - 1) // bb, bb, k_cap)


def fill_resolve_stream(setup: dict, resolve_records, bins: dict,
                        cfg: RasterConfig, init_depth=None,
                        init_tri_id=None, init_rec=None,
                        emit_base: int = 0, tiles_io: bool = False,
                        interpret: bool = False):
    """Streamed fused fill: bins from raster.bin_pairs_stream.

    Same contract as fill_resolve_pallas; cost scales with real binned
    pairs instead of tiles x K capacity.
    """
    r = resolve_records.shape[1]
    comb = jnp.concatenate([pack_tri_records(setup), resolve_records], 1)
    t = comb.shape[0]
    c = CHUNK_S
    n_tiles = cfg.num_tiles
    k_cap = cfg.max_tris_per_tile
    assert k_cap % c == 0, "max_tris_per_tile must be a CHUNK_S multiple"
    p_cap = cfg.resolve_pair_capacity(t)
    ch_cap = -(-p_cap // c) + n_tiles

    counts = bins['counts']                        # (tiles,) <= K
    offs = bins['offs'][:-1].astype(jnp.int32)     # (tiles,)
    vals_s = bins['vals_s']
    big_list = bins['big_list']

    # chunk allotment: 1 mandatory chunk per tile + extras from the global
    # pair budget (overflow drops pairs, bounded-amplification semantics)
    n_extra = -(-counts // c) - jnp.where(counts > 0, 1, 0)
    n_extra = jnp.maximum(n_extra, 0)
    extra_budget = ch_cap - n_tiles
    extra_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_extra)])[:-1]
    extra_allowed = jnp.clip(extra_budget - extra_before, 0, n_extra)
    n_chunks = 1 + extra_allowed                   # (tiles,) >= 1
    counts_eff = jnp.minimum(counts, n_chunks * c)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(n_chunks)]).astype(jnp.int32)  # (tiles+1,)
    total_chunks = chunk_base[-1]

    # per-chunk tile table (padding chunks replay the last tile, which is
    # idempotent: their rows are masked by counts_eff)
    jj = jnp.arange(ch_cap, dtype=jnp.int32)
    chunk_tile = jnp.searchsorted(chunk_base, jj, side='right') - 1
    chunk_tile = jnp.where(jj < total_chunks, chunk_tile,
                           n_tiles - 1).astype(jnp.int32)

    # chunk-aligned pair records: two gathers over the static pair budget
    pp = jnp.arange(ch_cap * c, dtype=jnp.int32)
    p_tile = chunk_tile[pp // c]
    local = pp - chunk_base[p_tile] * c
    valid = local < counts_eff[p_tile]
    src = jnp.clip(offs[p_tile] + local, 0, vals_s.shape[0] - 1)
    rows = jnp.clip(vals_s[jnp.where(valid, src, 0)], 0, t - 1)
    comb_padded = comb[rows].reshape(ch_cap, c, REC + r)

    big_safe = jnp.maximum(big_list, 0)
    big_comb = comb[big_safe]
    big_count = jnp.sum((big_list >= 0).astype(jnp.int32))
    tcounts = jnp.stack(
        [counts_eff, jnp.broadcast_to(big_count, counts_eff.shape)], 1)

    th, tw = cfg.tile_h, cfg.tile_w
    if init_depth is None:
        init_z = jnp.zeros((n_tiles, th, tw), jnp.float32)
        init_id = jnp.full((n_tiles, th, tw), -1, jnp.int32)
    elif tiles_io:
        init_z, init_id = init_depth, init_tri_id
    else:
        init_z = _image_to_tiles(init_depth, cfg)
        init_id = _image_to_tiles(init_tri_id, cfg)
    if init_rec is None:
        init_rec = jnp.zeros((n_tiles, th, r, tw), jnp.float32)

    by_tile = lambda j, ct, cb, tc: (ct[j], 0, 0)       # noqa: E731
    by_tile4 = lambda j, ct, cb, tc: (ct[j], 0, 0, 0)   # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ch_cap,),
        in_specs=[
            pl.BlockSpec((1, c, REC + r), lambda j, ct, cb, tc: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.max_big_tris, REC + r),
                         lambda j, ct, cb, tc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, r, tw), by_tile4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, r, tw), by_tile4,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.int32),
                        pltpu.VMEM((k_cap, r), jnp.float32)],
    )
    z, tid, rec_tiles = pl.pallas_call(
        functools.partial(_fill_resolve_stream_kernel, cfg=cfg,
                          emit_base=emit_base, rec_width=r),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, th, r, tw), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_tile, chunk_base[:-1], tcounts,
      comb_padded, big_comb, init_z, init_id, init_rec)
    if tiles_io:
        return z, tid, rec_tiles
    return _tiles_to_image(z, cfg), _tiles_to_image(tid, cfg), rec_tiles


def rec_tiles_to_image(rec_tiles, cfg: RasterConfig):
    """(tiles, TH, R, TW) -> (H, W, R)."""
    th, tw = cfg.tile_h, cfg.tile_w
    r = rec_tiles.shape[2]
    x = rec_tiles.reshape(cfg.tiles_y, cfg.tiles_x, th, r, tw)
    x = jnp.transpose(x, (0, 2, 1, 4, 3))   # (ty, th, tx, tw, r)
    x = x.reshape(cfg.tiles_y * th, cfg.tiles_x * tw, r)
    return x[:cfg.height, :cfg.width]
