"""Texture loading + mip-atlas build (host side).

Counterpart of the reference's texture stack: image decode
(TextureLoading.cpp DDS paths + stb for others), the bindless descriptor
table (DescriptorTableManager.{h,cpp}: one global table indexed by shaders),
and per-texture mip chains.

TPU-first design ("bindless" without descriptors): every mip of every
texture is flattened into ONE u32 (packed RGBA8) device buffer — the
"atlas" — plus a dense descriptor array (offset, width, height, flags) per
(texture, mip).  Shading code samples any texture with dynamic indices
into the flat buffer; residency (virtual texturing) later works by
clamping each texture's minimum resident mip and re-pointing descriptors.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field

import numpy as np

MAX_TEXTURE_DIM = 1024
MAX_MIPS = 11

WRAP_REPEAT = 0
WRAP_CLAMP = 1


@dataclass
class TextureAtlas:
    """Host-side atlas; `to_device()` -> dict of jnp arrays.

    Texel storage is QUAD-EXPANDED: row i holds the 2x2 bilinear footprint
    of texel i — [T(x,y), T(x+1,y), T(x,y+1), T(x+1,y+1)] with the
    texture's wrap mode baked at the edges — so a bilinear sample is ONE
    16-byte row gather per pixel instead of four scalar gathers (row
    gathers are an order of magnitude faster on TPU).  4x memory, bounded
    by MAX_TEXTURE_DIM.
    """
    texels: np.ndarray          # (N, 4) u32 packed RGBA8 quad rows
    # descriptor per (texture, mip): -1 offset == mip not resident
    desc_offset: np.ndarray     # (T, MAX_MIPS) i32
    desc_width: np.ndarray      # (T, MAX_MIPS) i32
    desc_height: np.ndarray     # (T, MAX_MIPS) i32
    num_mips: np.ndarray        # (T,) i32
    wrap_mode: np.ndarray       # (T,) i32
    min_resident_mip: np.ndarray  # (T,) i32 (virtual-texture clamp)
    num_textures: int = 0

    def packed_desc(self) -> np.ndarray:
        """(T * MAX_MIPS, 4) i32 rows [offset, width, height, 0] with mip
        clamping and residency REDIRECTION baked in: the row for (t, m)
        points at the finest RESIDENT mip >= m.  Sampling needs exactly one
        desc-row gather — no separate num_mips / min_mip / offset fetches.
        """
        t = self.desc_offset.shape[0]
        desc = np.zeros((t, MAX_MIPS, 4), np.int32)
        for ti in range(t):
            last = max(int(self.num_mips[ti]) - 1, 0)
            for m in range(MAX_MIPS):
                r = min(max(m, int(self.min_resident_mip[ti])), last)
                # walk coarser until resident
                while r < last and self.desc_offset[ti, r] < 0:
                    r += 1
                desc[ti, m] = (self.desc_offset[ti, r],
                               self.desc_width[ti, r],
                               self.desc_height[ti, r], 0)
        return desc.reshape(t * MAX_MIPS, 4)

    def to_device(self):
        import jax.numpy as jnp
        return dict(
            tex_texels=jnp.asarray(self.texels),
            tex_desc=jnp.asarray(self.packed_desc()),
            tex_wrap=jnp.asarray(self.wrap_mode),
            tex_min_mip=jnp.asarray(self.min_resident_mip),
        )


def _decode_image(tex) -> np.ndarray | list | None:
    """GltfTexture -> (H, W, 4) u8 RGBA, a DDS mip list, or None."""
    from PIL import Image
    try:
        base_dir = getattr(tex, 'base_dir', None)
        raw = None
        if tex.image_bytes is not None:
            raw = tex.image_bytes
        elif tex.uri is not None and base_dir is not None:
            raw = (base_dir / tex.uri).read_bytes()
        else:
            return None
        if raw[:4] == b"DDS ":
            from toyrenderer_tpu.scene.dds import load_dds
            mips = load_dds(raw)
            if mips is not None:
                # drop mips above the size cap (keep the chain aligned)
                return [m for m in mips
                        if max(m.shape[:2]) <= MAX_TEXTURE_DIM] or mips[-1:]
            return None
        img = Image.open(io.BytesIO(raw))
        img = img.convert("RGBA")
        w, h = img.size
        scale = max(w, h) / MAX_TEXTURE_DIM
        if scale > 1.0:
            img = img.resize((max(int(w / scale), 1),
                              max(int(h / scale), 1)))
        return np.asarray(img, np.uint8)
    except Exception:
        return None


def _pack_rgba8(img: np.ndarray) -> np.ndarray:
    i = img.astype(np.uint32)
    return i[..., 0] | (i[..., 1] << 8) | (i[..., 2] << 16) | (i[..., 3] << 24)


def _quad_expand(packed: np.ndarray, wrap: int) -> np.ndarray:
    """(H, W) u32 -> (H*W, 4) u32 rows of each texel's 2x2 footprint."""
    if wrap == WRAP_REPEAT:
        xp = np.roll(packed, -1, axis=1)
        yp = np.roll(packed, -1, axis=0)
        xyp = np.roll(yp, -1, axis=1)
    else:
        xp = np.concatenate([packed[:, 1:], packed[:, -1:]], axis=1)
        yp = np.concatenate([packed[1:], packed[-1:]], axis=0)
        xyp = np.concatenate([yp[:, 1:], yp[:, -1:]], axis=1)
    return np.stack([packed, xp, yp, xyp], -1).reshape(-1, 4)


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """Box-filter 2x downsample of (H, W, 4) u8 (sRGB-naive, like most
    runtime mippers)."""
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    img = img[:h2 * 2, :w2 * 2].astype(np.uint16)
    out = (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2]
           + img[1::2, 1::2] + 2) // 4
    return out.astype(np.uint8)


def build_mips(img: np.ndarray) -> list[np.ndarray]:
    mips = [img]
    while max(mips[-1].shape[:2]) > 1 and len(mips) < MAX_MIPS:
        mips.append(_downsample2x(mips[-1]))
    return mips


def build_atlas(doc=None, images: list[np.ndarray] | None = None,
                wrap_modes=None) -> TextureAtlas:
    """Build the atlas from a GltfDocument (decoding its textures) or an
    explicit list of (H, W, 4) u8 images."""
    imgs: list[np.ndarray | None] = []
    wraps: list[int] = []
    if doc is not None:
        for t in doc.textures:
            t.base_dir = doc.base_dir   # for relative-URI decode
            imgs.append(_decode_image(t))
            wraps.append(WRAP_CLAMP if t.wrap_s == 33071 else WRAP_REPEAT)
    if images is not None:
        imgs.extend(images)
        wraps.extend(list(wrap_modes or [WRAP_REPEAT] * len(images)))

    n = max(len(imgs), 1)
    offsets = np.full((n, MAX_MIPS), -1, np.int32)
    widths = np.zeros((n, MAX_MIPS), np.int32)
    heights = np.zeros((n, MAX_MIPS), np.int32)
    num_mips = np.zeros((n,), np.int32)
    chunks = []
    cursor = 0
    for ti, img in enumerate(imgs):
        if img is None:
            # 1x1 white fallback (CommonResources default-texture parity)
            img = np.full((1, 1, 4), 255, np.uint8)
        wrap = wraps[ti] if ti < len(wraps) else WRAP_REPEAT
        mips = img if isinstance(img, list) else build_mips(img)
        for mi, mip in enumerate(mips[:MAX_MIPS]):
            packed = _quad_expand(_pack_rgba8(mip), wrap)
            offsets[ti, mi] = cursor
            heights[ti, mi], widths[ti, mi] = mip.shape[:2]
            chunks.append(packed)
            cursor += packed.shape[0]
            num_mips[ti] = mi + 1
    texels = (np.concatenate(chunks) if chunks
              else np.full((1, 4), 0xFFFFFFFF, np.uint32))
    # pad to a lane multiple
    pad = (-len(texels)) % 128
    if pad:
        texels = np.concatenate([texels, np.zeros((pad, 4), np.uint32)])
    return TextureAtlas(
        texels=texels.astype(np.uint32),
        desc_offset=offsets, desc_width=widths, desc_height=heights,
        num_mips=num_mips,
        wrap_mode=np.asarray(wraps + [0] * (n - len(wraps)), np.int32),
        min_resident_mip=np.zeros((n,), np.int32),
        num_textures=len(imgs))


def checkerboard(size: int = 256, tiles: int = 8,
                 c0=(255, 255, 255), c1=(40, 40, 40)) -> np.ndarray:
    """Procedural test texture."""
    y, x = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    m = ((x * tiles // size) + (y * tiles // size)) % 2
    img = np.where(m[..., None] == 0,
                   np.asarray(c0, np.uint8), np.asarray(c1, np.uint8))
    return np.concatenate(
        [img, np.full((size, size, 1), 255, np.uint8)], -1)
