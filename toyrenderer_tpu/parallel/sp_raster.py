"""Single-frame multi-chip rasterization: tile-row sharding over 'sp'.

The reference renders one frame on one GPU; this is a new TPU-native
capability with no reference analogue (SURVEY.md §2.5): the streamed
Pallas fill grid is sharded across chips by TILE ROWS, so a single
frame's raster cost divides over the 'sp' mesh axis.  Tiles are
independent by construction (sort-middle binning), so there is no halo
and no merge pass — each chip bins and fills only the tiles it owns.

The trick that keeps the Pallas kernel unchanged is an AFFINE EDGE
TRANSLATION: the kernel evaluates edge functions at shard-local
normalized coords py_l = (ty_l*TH + row)/H_l, while correctness needs
global coords py_g = py_l*(H_l/H_g) + (ty_lo*TH)/H_g.  Substituting
into L = a*px + b*py_g + c gives a per-shard rewrite

    b' = b * (H_l / H_g),     c' = c + b * (ty_lo*TH / H_g)

applied to the 3 edge equations of both the fill records and the resolve
records.  zs/ws/inv_s contract with the SAME L values, so depth,
barycentrics and every interpolant are unchanged (up to 1-2 ulp from the
two extra f32 rounds).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from toyrenderer_tpu.ops import raster as raster_mod
from toyrenderer_tpu.ops.raster import RasterConfig


def shard_config(cfg: RasterConfig, n_shards: int) -> RasterConfig:
    """Per-shard RasterConfig: a horizontal band of tile rows."""
    assert cfg.tiles_y % n_shards == 0, (
        f"tiles_y={cfg.tiles_y} must divide by sp={n_shards} "
        f"(pad the render height)")
    rows = cfg.tiles_y // n_shards
    pair_cap = (None if cfg.pair_capacity is None
                else max(cfg.pair_capacity // n_shards, 256))
    return dataclasses.replace(cfg, height=rows * cfg.tile_h,
                               pair_capacity=pair_cap)


def shift_to_shard(setup: dict, records, ty_lo, cfg: RasterConfig,
                   cfg_s: RasterConfig):
    """Rewrite setup + resolve records into a shard's local tile frame.

    ty_lo: first global tile row owned by this shard (traced i32).
    Returns (setup_s, records_s) valid for rasterization with cfg_s.
    """
    sy = jnp.float32(cfg_s.height) / jnp.float32(cfg.height)
    dy = (ty_lo * cfg.tile_h).astype(jnp.float32) / jnp.float32(cfg.height)

    e = setup['edges']                                   # (T, 3, 3)
    e = e.at[..., 2].add(e[..., 1] * dy)
    e = e.at[..., 1].multiply(sy)

    rows = cfg_s.tiles_y
    ty0 = jnp.clip(setup['ty0'] - ty_lo, 0, rows - 1)
    ty1 = jnp.clip(setup['ty1'] - ty_lo, 0, rows - 1)
    valid = (setup['valid'] & (setup['ty1'] >= ty_lo)
             & (setup['ty0'] < ty_lo + rows))
    setup_s = dict(setup, edges=e, ty0=ty0, ty1=ty1, valid=valid)

    # resolve records duplicate the edge equations in slots 0:9
    # ([a0 b0 c0 a1 b1 c1 a2 b2 c2], gbuffer.py record layout)
    rec = records
    for v in range(3):
        rec = rec.at[:, 3 * v + 2].add(rec[:, 3 * v + 1] * dy)
        rec = rec.at[:, 3 * v + 1].multiply(sy)
    return setup_s, rec


def raster_frame_sp(setup: dict, records, cfg: RasterConfig, mesh: Mesh,
                    axis: str = 'sp', init_depth=None, init_tri_id=None,
                    init_rec=None, emit_base: int = 0,
                    padded_io: bool = False, interpret: bool = False):
    """Shard-mapped single-frame fused raster (fill_resolve_stream
    contract, sharded).

    setup: raster.setup_triangles output (replicated).
    records: (T, 64) gbuffer.pack_resolve_records output (replicated).
    init planes (optional, phase-2 continuation) and outputs are padded
    images with the row dim sharded over `axis`; padded_io=False
    pads/crops at the boundaries like fill_resolve_stream.
    Returns (depth (H, W), tri_id (H, W), interp (INTERP_C, H, W),
    stats).
    """
    from toyrenderer_tpu.ops.gbuffer import INTERP_C
    from toyrenderer_tpu.ops.raster_pallas import (
        fill_resolve_stream, crop_image, pad_image)
    n = mesh.shape[axis]
    cfg_s = shard_config(cfg, n)
    rows = cfg_s.tiles_y
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

    def shard_fn(setup_r, records_r, iz, iid, irec):
        ty_lo = jax.lax.axis_index(axis) * rows
        setup_s, rec_s = shift_to_shard(setup_r, records_r, ty_lo,
                                        cfg, cfg_s)
        bins = raster_mod.bin_pairs_stream(setup_s, cfg_s)
        z, tid, rec = fill_resolve_stream(
            setup_s, rec_s, bins, cfg_s, init_depth=iz, init_tri_id=iid,
            init_rec=irec, emit_base=emit_base, padded_io=True,
            interpret=interpret)
        stats = dict(
            binned_pairs=jax.lax.psum(jnp.sum(bins['counts']), axis),
            big_tris=jax.lax.psum(
                jnp.sum((bins['big_list'] >= 0).astype(jnp.int32)),
                axis))
        return z, tid, rec, stats

    repl = P()
    z, tid, interp, stats = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: repl, setup), repl,
                  P(axis, None), P(axis, None), P(None, axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(None, axis, None),
                   jax.tree.map(lambda _: repl,
                                dict(binned_pairs=0, big_tris=0))),
        check_vma=False)(setup, records, init_z, init_id, init_rec)
    stats['tris'] = jnp.sum(setup['valid'].astype(jnp.int32))
    if padded_io:
        return z, tid, interp, stats
    return (crop_image(z, cfg), crop_image(tid, cfg),
            crop_image(interp, cfg), stats)
