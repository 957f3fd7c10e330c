"""Virtual-texture streaming: feedback-driven mip residency.

Counterpart of the reference's sampler-feedback tile streaming
(source/TextureFeedbackManager.{h,cpp} + RTXTS-TTM: readback sampler
feedback -> residency decisions -> 64KB-tile heap alloc/evict -> tile
uploads -> MinMip texture writes, budgeted per frame).

TPU-first design at MIP granularity: the device "pool" is a fixed-budget
flat texel buffer; each frame the per-texture min-desired-mip feedback
(computed in the resolve pass, ops/texture.py:texture_feedback) drives
loads of finer mips / evictions of unused ones, one mip step per texture
per frame with a per-frame texture budget (reference: 10 resolves/frame).
Coarse mips (<= 32x32) are always resident, so sampling NEVER faults —
the residency clamp (tex_min_mip) simply limits sharpness, exactly like
the reference's MinMip clamp (lightingcommon.hlsli:361-387).
"""

from __future__ import annotations

import numpy as np

ALWAYS_RESIDENT_DIM = 32


class TextureStreamingManager:
    """Host-side residency manager over a fixed device texel pool."""

    def __init__(self, atlas, pool_texels: int = 8 << 20,
                 textures_per_frame: int = 10):
        """atlas: host TextureAtlas with the FULL mip data (its texel
        buffer is kept host-side as the backing store; the device pool is
        budget-sized)."""
        import jax.numpy as jnp
        self.full = atlas
        self.textures_per_frame = textures_per_frame
        n = atlas.desc_offset.shape[0]
        self.n_tex = n
        self.n_mips = atlas.num_mips.copy()

        # start with only the always-resident tail mips
        self.resident_min = np.zeros(n, np.int32)
        for t in range(n):
            for m in range(int(atlas.num_mips[t])):
                if max(atlas.desc_width[t, m],
                       atlas.desc_height[t, m]) <= ALWAYS_RESIDENT_DIM:
                    self.resident_min[t] = m
                    break
            else:
                self.resident_min[t] = max(int(atlas.num_mips[t]) - 1, 0)

        self.pool_size = pool_texels
        self.free: list[tuple[int, int]] = [(0, pool_texels)]  # (off, size)
        self.block_of: dict[tuple[int, int], tuple[int, int]] = {}
        self.desc_offset = np.full_like(atlas.desc_offset, -1)

        row_w = atlas.texels.shape[1]
        self.pool = jnp.zeros((pool_texels, row_w), jnp.uint32)  # quad rows
        self.round_robin = 0
        self.stats = dict(loads=0, evictions=0, resident_texels=0)

        for t in range(n):
            for m in range(self.resident_min[t], int(atlas.num_mips[t])):
                ok = self._load_mip(t, m)
                assert ok, "pool too small for always-resident mips"

    # -- block allocator (best-fit + merge, RenderGraph.cpp:431-580 spirit)
    def _alloc(self, size: int) -> int | None:
        best = None
        for i, (off, sz) in enumerate(self.free):
            if sz >= size and (best is None or sz < self.free[best][1]):
                best = i
        if best is None:
            return None
        off, sz = self.free.pop(best)
        if sz > size:
            self.free.append((off + size, sz - size))
        return off

    def _free(self, off: int, size: int):
        self.free.append((off, size))
        self.free.sort()
        merged = []
        for b in self.free:
            if merged and merged[-1][0] + merged[-1][1] == b[0]:
                merged[-1] = (merged[-1][0], merged[-1][1] + b[1])
            else:
                merged.append(list(b))
        self.free = [tuple(b) for b in merged]

    def _mip_texels(self, t: int, m: int):
        src_off = int(self.full.desc_offset[t, m])
        n = int(self.full.desc_width[t, m]) * int(self.full.desc_height[t, m])
        return src_off, n

    def _load_mip(self, t: int, m: int) -> bool:
        if self.desc_offset[t, m] >= 0:
            return True
        src_off, n = self._mip_texels(t, m)
        dst = self._alloc(n)
        if dst is None:
            return False
        data = self.full.texels[src_off:src_off + n]
        self.pool = self.pool.at[dst:dst + n].set(data)
        self.desc_offset[t, m] = dst
        self.block_of[(t, m)] = (dst, n)
        self.stats['loads'] += 1
        self.stats['resident_texels'] += n
        return True

    def _evict_mip(self, t: int, m: int):
        blk = self.block_of.pop((t, m), None)
        if blk is None:
            return
        self._free(*blk)
        self.desc_offset[t, m] = -1
        self.stats['evictions'] += 1
        self.stats['resident_texels'] -= blk[1]

    def update(self, feedback: np.ndarray):
        """One streaming step from per-texture min desired mips (f32,
        +inf == texture unused this frame).  Returns device-override dict
        for frame_inputs: tex_texels (the pool), tex_offset, tex_min_mip."""
        feedback = np.asarray(feedback)
        order = [(self.round_robin + k) % self.n_tex
                 for k in range(self.n_tex)]
        processed = 0
        for t in order:
            if processed >= self.textures_per_frame:
                break
            want = feedback[t]
            if not np.isfinite(want):
                # unused: decay toward the always-resident floor
                want = float(self.n_mips[t])
            want_mip = int(np.clip(np.floor(want), 0,
                                   self.n_mips[t] - 1))
            cur = int(self.resident_min[t])
            if want_mip < cur:
                # needs finer data: load ONE step (budgeted, like the
                # reference's gradual tile uploads)
                if self._load_mip(t, cur - 1):
                    self.resident_min[t] = cur - 1
                processed += 1
            elif want_mip > cur + 1:
                # hysteresis: evict only when 2+ mips coarser is enough
                self._evict_mip(t, cur)
                self.resident_min[t] = cur + 1
                processed += 1
        self.round_robin = (self.round_robin + max(processed, 1)) % max(
            self.n_tex, 1)

        import jax.numpy as jnp
        return dict(
            tex_texels=self.pool,
            tex_desc=jnp.asarray(self._packed_desc()),
            tex_min_mip=jnp.asarray(self.resident_min),
        )

    def _packed_desc(self) -> np.ndarray:
        """Redirected (T*MAX_MIPS, 4) desc rows over the POOL offsets:
        each requested mip resolves to the finest resident one."""
        from toyrenderer_tpu.scene.textures import MAX_MIPS
        t = self.n_tex
        desc = np.zeros((t, MAX_MIPS, 4), np.int32)
        for ti in range(t):
            last = max(int(self.n_mips[ti]) - 1, 0)
            for m in range(MAX_MIPS):
                r = min(max(m, int(self.resident_min[ti])), last)
                while r < last and self.desc_offset[ti, r] < 0:
                    r += 1
                desc[ti, m] = (self.desc_offset[ti, r],
                               self.full.desc_width[ti, r],
                               self.full.desc_height[ti, r], 0)
        return desc.reshape(t * MAX_MIPS, 4)


# ---------------------------------------------------------------------------
# Tile-granularity streaming (64x64-texel tiles)
# ---------------------------------------------------------------------------

TILE = 64                       # texels per tile side
TILE_ROWS = TILE * TILE         # 4096 rows x 64B = 256KB: the 4-map
#                                 equivalent of the reference's 64KB tile


class TileStreamingManager:
    """Per-TILE residency over a fixed pool of 64x64-texel tiles — the
    full counterpart of the reference's RTXTS tile streaming
    (TextureFeedbackManager.cpp:202-462): spatial sampler feedback at
    tile granularity, budgeted tile uploads per frame, LRU eviction with
    hysteresis, and budgeted DEFRAG moves that compact the pool.

    Layout: mips with max dim <= TILE stay contiguous in a static region
    (always resident); finer mips split into tiles addressed through a
    device tile table (ops/texture._texel_index).  A non-resident tile's
    table entry redirects to the co-located tile of the coarsest tiled
    mip (always pinned), packing (mip delta << 24 | pool slot) — so
    sampling NEVER faults and refinement is per-REGION, not per-texture.

    Refinement uses the device 'vt_tile_feedback' (per-tile min desired
    mip): a sampled tile whose feedback asks for a finer mip loads its 4
    child tiles; tiles unseen for `evict_after` updates are evicted.
    """

    def __init__(self, atlas, pool_tiles: int = 64,
                 tiles_per_frame: int = 16, defrag_per_frame: int = 16,
                 evict_after: int = 60):
        import jax.numpy as jnp
        self.full = atlas
        self.tiles_per_frame = tiles_per_frame
        self.defrag_per_frame = defrag_per_frame
        self.evict_after = evict_after
        n = atlas.desc_offset.shape[0]
        self.n_tex = n
        self.n_mips = atlas.num_mips.copy()

        # -- static region: contiguous copies of mips <= TILE ------------
        static_chunks = []
        cursor = 0
        self.static_offset = np.full_like(atlas.desc_offset, -1)
        # tile grid per (tex, mip): base index into the tile table
        self.tile_base = np.full((n, atlas.desc_offset.shape[1]), -1,
                                 np.int32)
        self.grid = {}            # (t, m) -> (ht, wt)
        self.first_tiled = np.zeros(n, np.int32)   # coarsest tiled mip
        table_cursor = 0
        for t in range(n):
            ft = -1
            for m in range(int(self.n_mips[t]) - 1, -1, -1):
                w = int(atlas.desc_width[t, m])
                h = int(atlas.desc_height[t, m])
                if max(w, h) <= TILE:
                    src = int(atlas.desc_offset[t, m])
                    static_chunks.append(atlas.texels[src:src + w * h])
                    self.static_offset[t, m] = cursor
                    cursor += w * h
                else:
                    wt = -(-w // TILE)
                    ht = -(-h // TILE)
                    self.tile_base[t, m] = table_cursor
                    self.grid[(t, m)] = (ht, wt)
                    table_cursor += ht * wt
                    if ft < 0:          # coarsest tiled mip (largest m)
                        ft = m
            self.first_tiled[t] = ft               # -1: nothing tiled
        self.table_size = max(table_cursor, 1)
        self.static_rows = cursor
        # pool slots start after the static region (tile-aligned)
        self.slot0 = -(-cursor // TILE_ROWS)
        self.pool_tiles = pool_tiles
        total_rows = (self.slot0 + pool_tiles) * TILE_ROWS
        row_w = atlas.texels.shape[1]

        pool = np.zeros((total_rows, row_w), np.uint32)
        if static_chunks:
            sc = np.concatenate(static_chunks)
            pool[:sc.shape[0]] = sc

        self.free = list(range(self.slot0 + pool_tiles - 1,
                               self.slot0 - 1, -1))  # LIFO low-first pop
        self.free.sort(reverse=True)
        self.slot_of = {}         # (t, m, ty, tx) -> slot
        self.tile_of_slot = {}    # slot -> (t, m, ty, tx)
        self.last_seen = {}       # (t, m, ty, tx) -> update index
        self.table = np.zeros(self.table_size, np.int32)
        self.update_index = 0
        self.stats = dict(tile_loads=0, tile_evictions=0,
                          defrag_moves=0, resident_tiles=0)

        self._pending = []        # (slot, rows) uploads this update
        # pin the coarsest tiled mip of every texture (fallback target)
        for t in range(n):
            ft = int(self.first_tiled[t])
            if ft < 0:
                continue
            ht, wt = self.grid[(t, ft)]
            for ty in range(ht):
                for tx in range(wt):
                    ok = self._load_tile(t, ft, ty, tx, pin=True)
                    assert ok, "pool too small for pinned fallback tiles"
        self._refresh_table()
        self.pool = jnp.asarray(pool)
        self._flush_uploads()

    # -- tile helpers -----------------------------------------------------
    def _tile_rows(self, t, m, ty, tx) -> np.ndarray:
        """(TILE_ROWS, 16) u32 for one tile, padded at mip edges."""
        w = int(self.full.desc_width[t, m])
        h = int(self.full.desc_height[t, m])
        src = int(self.full.desc_offset[t, m])
        y0, x0 = ty * TILE, tx * TILE
        hh = min(TILE, h - y0)
        ww = min(TILE, w - x0)
        out = np.zeros((TILE, TILE, self.full.texels.shape[1]), np.uint32)
        block = self.full.texels[src:src + w * h].reshape(
            h, w, -1)[y0:y0 + hh, x0:x0 + ww]
        out[:hh, :ww] = block
        return out.reshape(TILE_ROWS, -1)

    def _load_tile(self, t, m, ty, tx, pin=False) -> bool:
        key = (t, m, ty, tx)
        if key in self.slot_of:
            self.last_seen[key] = (np.inf if pin else self.update_index)
            return True
        if not self.free:
            return False
        slot = self.free.pop()
        self.slot_of[key] = slot
        self.tile_of_slot[slot] = key
        self.last_seen[key] = np.inf if pin else self.update_index
        self._pending.append((slot, self._tile_rows(t, m, ty, tx)))
        self.stats['tile_loads'] += 1
        self.stats['resident_tiles'] += 1
        return True

    def _evict_tile(self, key):
        slot = self.slot_of.pop(key, None)
        if slot is None:
            return
        del self.tile_of_slot[slot]
        self.last_seen.pop(key, None)
        self.free.append(slot)
        self.free.sort(reverse=True)
        self.stats['tile_evictions'] += 1
        self.stats['resident_tiles'] -= 1

    def _refresh_table(self):
        """Rebuild the packed (delta << 24 | slot) device table."""
        for t in range(self.n_tex):
            ft = int(self.first_tiled[t])
            for m in range(int(self.n_mips[t])):
                tb = int(self.tile_base[t, m])
                if tb < 0:
                    continue
                ht, wt = self.grid[(t, m)]
                for ty in range(ht):
                    for tx in range(wt):
                        key = (t, m, ty, tx)
                        if key in self.slot_of:
                            ent = self.slot_of[key]
                        else:
                            # fallback: co-located tile of the pinned
                            # coarsest tiled mip
                            d = ft - m
                            fy = min(ty >> d, self.grid[(t, ft)][0] - 1)
                            fx = min(tx >> d, self.grid[(t, ft)][1] - 1)
                            ent = ((d << 24)
                                   | self.slot_of[(t, ft, fy, fx)])
                        self.table[tb + ty * wt + tx] = ent

    def _flush_uploads(self):
        """Apply pending tile writes in ONE donated device scatter."""
        if not self._pending:
            return
        import jax
        import jax.numpy as jnp
        slots = np.asarray([s for s, _ in self._pending], np.int32)
        rows = np.stack([r for _, r in self._pending])

        @jax.jit
        def apply(pool, slots, rows):
            n_t, rw = rows.shape[1], rows.shape[2]
            idx = (slots[:, None] * TILE_ROWS
                   + jnp.arange(n_t, dtype=jnp.int32)[None, :]).reshape(-1)
            return pool.at[idx].set(rows.reshape(-1, rw))

        self.pool = apply(self.pool, jnp.asarray(slots),
                          jnp.asarray(rows))
        self._pending = []

    def _tile_key_of_id(self, tid: int):
        """Inverse of the device tile id -> (t, m, ty, tx)."""
        for t in range(self.n_tex):
            for m in range(int(self.n_mips[t])):
                tb = int(self.tile_base[t, m])
                if tb < 0:
                    continue
                ht, wt = self.grid[(t, m)]
                if tb <= tid < tb + ht * wt:
                    local = tid - tb
                    return t, m, local // wt, local % wt
        return None

    def update(self, tile_feedback: np.ndarray):
        """One streaming step from the device per-tile feedback
        ('vt_tile_feedback' aux: min desired mip per tile, +inf unused).

        Returns the frame_inputs override dict (tex_texels, tex_desc,
        tex_tile_table)."""
        import jax.numpy as jnp
        fb = np.asarray(tile_feedback)
        self.update_index += 1
        hot = np.flatnonzero(np.isfinite(fb))
        loads = 0
        for tid in hot:
            key = self._tile_key_of_id(int(tid))
            if key is None:
                continue
            t, m, ty, tx = key
            if key in self.last_seen:
                if self.last_seen[key] != np.inf:
                    self.last_seen[key] = self.update_index
            else:
                # sampled through a fallback: load the tile itself first
                if loads < self.tiles_per_frame and self._load_tile(
                        t, m, ty, tx):
                    loads += 1
                    continue
            # refinement: feedback wants a finer mip -> load children
            want = int(np.floor(fb[tid]))
            if want < m and m - 1 >= 0 and self.tile_base[t, m - 1] >= 0:
                ht, wt = self.grid[(t, m - 1)]
                for cy in (2 * ty, 2 * ty + 1):
                    for cx in (2 * tx, 2 * tx + 1):
                        if cy < ht and cx < wt:
                            if loads >= self.tiles_per_frame:
                                break
                            if (t, m - 1, cy, cx) not in self.slot_of:
                                if self._load_tile(t, m - 1, cy, cx):
                                    loads += 1

        # eviction with hysteresis
        for key in list(self.slot_of):
            seen = self.last_seen.get(key, 0)
            if seen != np.inf and (self.update_index - seen
                                   > self.evict_after):
                self._evict_tile(key)

        # defrag: budgeted moves of high slots into low free slots —
        # compacts the pool like the reference's 16-moves/frame heap
        # defrag (TextureFeedbackManager.cpp:351-356)
        moves = 0
        while moves < self.defrag_per_frame and self.free:
            low = min(self.free)
            hi_used = max(self.tile_of_slot) if self.tile_of_slot else -1
            if hi_used <= low:
                break
            key = self.tile_of_slot.pop(hi_used)
            self.free.remove(low)
            self.free.append(hi_used)
            self.free.sort(reverse=True)
            self.slot_of[key] = low
            self.tile_of_slot[low] = key
            self._pending.append((low, self._tile_rows(*key)))
            self.stats['defrag_moves'] += 1
            moves += 1

        self._refresh_table()
        self._flush_uploads()
        return dict(
            tex_texels=self.pool,
            tex_desc=jnp.asarray(self._packed_desc()),
            tex_tile_table=jnp.asarray(self.table),
        )

    def _packed_desc(self) -> np.ndarray:
        """Desc rows: tiled mips carry [0, w, h, tile_base] (addressing
        goes through the tile table; per-REGION fallback replaces mip
        redirection); static mips carry [offset, w, h, -1]."""
        from toyrenderer_tpu.scene.textures import MAX_MIPS
        t = self.n_tex
        desc = np.zeros((t, MAX_MIPS, 4), np.int32)
        for ti in range(t):
            last = max(int(self.n_mips[ti]) - 1, 0)
            for m in range(MAX_MIPS):
                r = min(m, last)
                if self.tile_base[ti, r] >= 0:
                    desc[ti, m] = (0, self.full.desc_width[ti, r],
                                   self.full.desc_height[ti, r],
                                   self.tile_base[ti, r])
                else:
                    desc[ti, m] = (self.static_offset[ti, r],
                                   self.full.desc_width[ti, r],
                                   self.full.desc_height[ti, r], -1)
        return desc.reshape(t * MAX_MIPS, 4)
