"""Tile-binned software rasterizer producing a visibility buffer.

This is the TPU replacement for the reference's hardware meshlet pipeline
(AS_Main/MS_Main/PS_Main in source/shaders/basepass.hlsl + indirect dispatch
in source/BasePassRenderers.cpp:406-502).  There is no rasterizer primitive
on a TPU, so the design is a classic sort-middle software raster reshaped
for the VPU:

  1. `setup_triangles`    — dense edge-equation + 1/w + z/w setup, backface
                            and near-plane rejection (all masked, no branches)
  2. `bin_triangles`      — each small triangle expands to a STATIC grid of
                            (tile, tri) candidate slots; one global
                            `lax.sort` by tile id + `searchsorted` yields
                            per-tile triangle lists in a fixed-capacity
                            (num_tiles, K) table.  Triangles spanning more
                            tiles than the slot grid go to a separate "big"
                            list tested by every tile (walls, floors).
                            Capacity overflow drops triangles — the same
                            bounded-amplification semantics as the
                            reference's overflow drop (gpuculling.hlsl:69-74).
  3. `fill_visibility`    — per tile, scan chunks of its triangle list,
                            evaluate 3 edge functions over the TH x TW pixel
                            block (TW = 128 to match the VPU lane width),
                            reverse-Z depth-max reduce to (tri_id, depth)
                            per pixel: the visibility buffer.

Shading happens later from the visibility buffer (see gbuffer.py), which
keeps this inner loop tiny and bandwidth-friendly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RasterConfig:
    width: int
    height: int
    tile_h: int = 16
    tile_w: int = 128
    max_tris_per_tile: int = 512     # K: per-tile list capacity
    chunk: int = 32                  # C: triangles processed per inner step
    bin_slots_y: int = 10            # static per-triangle tile-slot grid
    bin_slots_x: int = 3
    max_big_tris: int = 256          # B: full-screen-tested triangle budget
    tile_batch: int = 32             # TB: tiles processed per map step

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
    """Clip-space triangles -> screen-space edge equations and planes.

    geo: output of geometry.meshlet_clip_triangles.
    Returns a dict of (T, ...) arrays ("setup").  Invalid triangles get an
    empty tile bbox so they never bin.
    """
    clip = geo['clip']                              # (T, 3, 4)
    w = clip[..., 3]
    # near-plane rejection: every vertex must be in front of the camera.
    # (True near clipping is done by the guard-band: partially-behind
    # triangles are dropped; acceptable until a clipping stage is added.)
    in_front = jnp.all(w > 1e-6, axis=-1)
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    inv_w = 1.0 / w_safe                            # (T, 3)
    ndc = clip[..., :3] * inv_w[..., None]          # (T, 3, 3)

    sx = (ndc[..., 0] * 0.5 + 0.5) * cfg.width      # (T, 3)
    sy = (0.5 - ndc[..., 1] * 0.5) * cfg.height     # y down
    zw = ndc[..., 2]                                # reverse-Z depth (0..1]

    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    # signed area (y-down screen space); glTF CCW front faces come out < 0
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    front = area < 0.0
    keep = geo['tri_valid'] & in_front & (area != 0.0) & (
        front | geo['double_sided'])
    flip = jnp.where(front, -1.0, 1.0)

    # edge i is opposite vertex i:  E_i(p) = cross2(vk - vj, p - vj)
    def edge(xj, yj, xk, yk):
        a = -(yk - yj)
        b = (xk - xj)
        c = (yk - yj) * xj - (xk - xj) * yj
        return a, b, c

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    ea = jnp.stack([a0, a1, a2], -1) * flip[:, None]
    eb = jnp.stack([b0, b1, b2], -1) * flip[:, None]
    ec = jnp.stack([c0, c1, c2], -1) * flip[:, None]
    inv_area = 1.0 / jnp.where(keep, jnp.abs(area), 1.0)

    # pixel bbox -> tile bbox (clamped); invalid -> empty bbox
    xmin = jnp.min(sx, -1)
    xmax = jnp.max(sx, -1)
    ymin = jnp.min(sy, -1)
    ymax = jnp.max(sy, -1)
    off = (xmax < 0) | (ymax < 0) | (xmin >= cfg.width) | (ymin >= cfg.height)
    keep = keep & ~off
    tx0 = jnp.clip(jnp.floor(xmin / cfg.tile_w), 0, cfg.tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / cfg.tile_w), 0, cfg.tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / cfg.tile_h), 0, cfg.tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / cfg.tile_h), 0, cfg.tiles_y - 1)
    tx0 = jnp.where(keep, tx0, 1.0).astype(jnp.int32)
    tx1 = jnp.where(keep, tx1, 0.0).astype(jnp.int32)
    ty0 = jnp.where(keep, ty0, 1.0).astype(jnp.int32)
    ty1 = jnp.where(keep, ty1, 0.0).astype(jnp.int32)

    return dict(
        edge_a=ea, edge_b=eb, edge_c=ec,
        zw=zw, inv_w=inv_w, inv_area=inv_area,
        screen_x=sx, screen_y=sy,
        tx0=tx0, tx1=tx1, ty0=ty0, ty1=ty1, valid=keep,
        vtx_ids=geo['vtx_ids'], inst_id=geo['inst_id'],
        mat_id=geo['mat_id'],
    )


def bin_triangles(setup: dict, cfg: RasterConfig):
    """Build the per-tile triangle table + the big-triangle list.

    Returns:
      tile_table: (num_tiles, K) i32 triangle ids, -1 padded
      tile_count: (num_tiles,) i32
      big_list:   (B,) i32 triangle ids, -1 padded
    """
    t = setup['valid'].shape[0]
    tx0, tx1 = setup['tx0'], setup['tx1']
    ty0, ty1 = setup['ty0'], setup['ty1']
    spans_x = tx1 - tx0 + 1
    spans_y = ty1 - ty0 + 1
    is_big = setup['valid'] & ((spans_x > cfg.bin_slots_x)
                               | (spans_y > cfg.bin_slots_y))
    small = setup['valid'] & ~is_big

    # --- small triangles: static slot expansion + sort by tile ------------
    sy_ = jnp.arange(cfg.bin_slots_y, dtype=jnp.int32)
    sx_ = jnp.arange(cfg.bin_slots_x, dtype=jnp.int32)
    ty = ty0[:, None, None] + sy_[None, :, None]       # (T, Sy, 1)
    tx = tx0[:, None, None] + sx_[None, None, :]       # (T, 1, Sx)
    in_range = ((ty <= ty1[:, None, None]) & (tx <= tx1[:, None, None])
                & small[:, None, None])
    tile_id = ty * cfg.tiles_x + tx                    # (T, Sy, Sx)
    sentinel = jnp.int32(cfg.num_tiles)
    keys = jnp.where(in_range, tile_id, sentinel).reshape(-1)
    vals = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None, None],
        tile_id.shape).reshape(-1)
    keys_s, vals_s = jax.lax.sort((keys, vals), num_keys=1)

    tile_range = jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32)
    offs = jnp.searchsorted(keys_s, tile_range, side='left')
    counts = (offs[1:] - offs[:-1]).astype(jnp.int32)

    k_ = jnp.arange(cfg.max_tris_per_tile, dtype=jnp.int32)
    gather_idx = offs[:-1, None] + k_[None, :]          # (tiles, K)
    in_list = k_[None, :] < counts[:, None]
    gather_idx = jnp.clip(gather_idx, 0, keys_s.shape[0] - 1)
    tile_table = jnp.where(in_list, vals_s[gather_idx], -1)

    # --- big triangles: compact into fixed B slots -------------------------
    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    b = cfg.max_big_tris
    big_list = jnp.full((b,), -1, jnp.int32)
    slot = jnp.where(is_big & (big_rank < b), big_rank, b)
    big_list = jnp.zeros((b + 1,), jnp.int32).at[slot].max(
        jnp.where(is_big, jnp.arange(t, dtype=jnp.int32), 0),
        mode='drop')[:b]
    # mark empty slots -1
    num_big = jnp.sum(is_big.astype(jnp.int32))
    big_list = jnp.where(jnp.arange(b) < jnp.minimum(num_big, b),
                         big_list, -1)
    return tile_table, jnp.minimum(counts, cfg.max_tris_per_tile), big_list


def fill_visibility(setup: dict, tile_table, big_list, cfg: RasterConfig):
    """Rasterize per-tile lists -> (depth (H,W) f32, tri_id (H,W) i32).

    depth is reverse-Z (greater == closer, 0 == far/background);
    tri_id is -1 where nothing was drawn.
    """
    ea, eb, ec = setup['edge_a'], setup['edge_b'], setup['edge_c']
    zw, inv_area = setup['zw'], setup['inv_area']
    valid = setup['valid']

    th, tw = cfg.tile_h, cfg.tile_w
    tb = cfg.tile_batch
    n_tiles = cfg.num_tiles
    n_batches = -(-n_tiles // tb)
    tiles_pad = n_batches * tb

    col = jax.lax.broadcasted_iota(jnp.float32, (1, 1, th, tw), 3) + 0.5
    row = jax.lax.broadcasted_iota(jnp.float32, (1, 1, th, tw), 2) + 0.5

    big_b = jnp.broadcast_to(big_list[None, :], (tb, big_list.shape[0]))

    def raster_chunk(ids, px, py, best):
        """ids (TB, C); px/py (TB,1,TH,TW); best = (z, id) per pixel."""
        ok = (ids >= 0)
        idx = jnp.maximum(ids, 0)
        ok = ok & valid[idx]
        a = ea[idx]                                  # (TB, C, 3)
        b_ = eb[idx]
        c = ec[idx]
        z = zw[idx]                                  # (TB, C, 3)
        ia = inv_area[idx]                           # (TB, C)

        def e(i):
            return (a[..., i, None, None] * px + b_[..., i, None, None] * py
                    + c[..., i, None, None])         # (TB, C, TH, TW)
        e0, e1, e2 = e(0), e(1), e(2)
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                  & ok[..., None, None])
        depth = (e0 * z[..., 0, None, None] + e1 * z[..., 1, None, None]
                 + e2 * z[..., 2, None, None]) * ia[..., None, None]
        depth = jnp.where(inside, depth, -1.0)
        best_z, best_id = best
        cz = jnp.max(depth, axis=1)                                  # (TB,TH,TW)
        carg = jnp.argmax(depth, axis=1)                             # (TB,TH,TW)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, :, None, None], depth.shape),
            carg[:, None], axis=1)[:, 0]
        upd = cz > best_z
        return (jnp.where(upd, cz, best_z),
                jnp.where(upd, cid, best_id))

    k = cfg.max_tris_per_tile
    c = cfg.chunk
    n_chunks = -(-k // c)
    n_big_chunks = -(-cfg.max_big_tris // c)

    def do_batch(batch_idx):
        tile_ids = batch_idx * tb + jnp.arange(tb, dtype=jnp.int32)
        tile_ids = jnp.minimum(tile_ids, n_tiles - 1)
        ty = tile_ids // cfg.tiles_x
        tx = tile_ids % cfg.tiles_x
        px = tx[:, None, None, None].astype(jnp.float32) * tw + col
        py = ty[:, None, None, None].astype(jnp.float32) * th + row
        table = tile_table[tile_ids]                  # (TB, K)

        best = (jnp.zeros((tb, th, tw), jnp.float32),
                jnp.full((tb, th, tw), -1, jnp.int32))

        def body(i, best):
            ids = jax.lax.dynamic_slice(table, (0, i * c), (tb, c))
            return raster_chunk(ids, px, py, best)
        best = jax.lax.fori_loop(0, n_chunks, body, best)

        def body_big(i, best):
            ids = jax.lax.dynamic_slice(big_b, (0, i * c), (tb, c))
            return raster_chunk(ids, px, py, best)
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


def rasterize(geo: dict, cfg: RasterConfig):
    """setup + bin + fill in one call; returns (setup, depth, tri_id)."""
    setup = setup_triangles(geo, cfg)
    tile_table, _, big_list = bin_triangles(setup, cfg)
    depth, tri_id = fill_visibility(setup, tile_table, big_list, cfg)
    return setup, depth, tri_id


def rasterize_bruteforce(geo: dict, cfg: RasterConfig):
    """Reference path: every triangle vs every pixel (tests / tiny scenes)."""
    setup = setup_triangles(geo, cfg)
    t = setup['valid'].shape[0]
    px = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (cfg.height, cfg.width), 0) + 0.5

    def body(i, best):
        best_z, best_id = best
        a, b, c = setup['edge_a'][i], setup['edge_b'][i], setup['edge_c'][i]
        z3 = setup['zw'][i]
        e0 = a[0] * px + b[0] * py + c[0]
        e1 = a[1] * px + b[1] * py + c[1]
        e2 = a[2] * px + b[2] * py + c[2]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & setup['valid'][i]
        depth = (e0 * z3[0] + e1 * z3[1] + e2 * z3[2]) * setup['inv_area'][i]
        depth = jnp.where(inside, depth, -1.0)
        upd = depth > best_z
        return (jnp.where(upd, depth, best_z),
                jnp.where(upd, i, best_id))

    best = (jnp.zeros((cfg.height, cfg.width), jnp.float32),
            jnp.full((cfg.height, cfg.width), -1, jnp.int32))
    z, tid = jax.lax.fori_loop(0, t, body, best)
    return setup, z, tid
