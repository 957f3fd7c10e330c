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
