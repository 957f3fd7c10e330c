"""Texture loading + material mip-atlas build (host side).

Counterpart of the reference's texture stack: image decode
(TextureLoading.cpp DDS paths + stb for others), the bindless descriptor
table (DescriptorTableManager.{h,cpp}: one global table indexed by shaders),
and per-texture mip chains.

TPU-first design ("bindless" without descriptors): the atlas is flattened
into ONE u32 device buffer plus a dense descriptor array (offset, width,
height) per (entry, mip).  Shading samples with dynamic indices into the
flat buffer; virtual texturing clamps each entry's minimum resident mip
and re-points descriptors.

Atlas entries are MATERIAL MAP SETS, not single textures: each textured
material contributes one entry whose texel rows interleave all four glTF
maps — base color, normal, metallic-roughness, emissive — resampled to a
common resolution, each as its 2x2 bilinear quad: 16 u32 per texel row.
One row gather per pixel therefore yields the bilinear footprints of
EVERY map the BRDF needs (the reference instead pays four independent
bindless samples, lightingcommon.hlsli:452-493) — on TPU, where gathers
are latency-bound per row rather than per byte, the wide row is nearly
free.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field

import numpy as np

MAX_TEXTURE_DIM = 1024
MAX_MIPS = 11
ROW_U32 = 16          # 4 maps x 2x2 quad per texel row
ATLAS_ALIGN = 2048    # rows: each texture's mip chain starts on this
#   boundary so its base offset encodes as base//ATLAS_ALIGN < 2^10 —
#   small enough to ride per-triangle resolve records through the fill
#   kernel's hi/lo bf16 fetch (gbuffer.py records carry tex + 64*base11;
#   the sampler then derives every mip's offset/size ANALYTICALLY from
#   w0/h0 — floor-halving mips make w_m = max(w0 >> m, 1) exact — and
#   skips the per-quad descriptor-row gather entirely)
MAP_BASE = 0
MAP_NORMAL = 1
MAP_MR = 2
MAP_EMISSIVE = 3
_NEUTRAL = (
    np.asarray([255, 255, 255, 255], np.uint8),   # base: white
    np.asarray([128, 128, 255, 255], np.uint8),   # normal: +Z
    np.asarray([255, 255, 255, 255], np.uint8),   # MR: factors pass
    np.asarray([255, 255, 255, 255], np.uint8),   # emissive: factor passes
)

WRAP_REPEAT = 0
WRAP_CLAMP = 1


@dataclass
class TextureAtlas:
    """Host-side material atlas; `to_device()` -> dict of jnp arrays.

    Texel storage is QUAD-EXPANDED per map: row i holds, for each of the 4
    material maps, the 2x2 bilinear footprint of texel i — [T(x,y),
    T(x+1,y), T(x,y+1), T(x+1,y+1)] with the wrap mode baked at the edges
    — so ONE 64-byte row gather per pixel serves bilinear sampling of all
    maps (row gathers cost the same as scalar gathers on TPU).  Memory is
    4x (quads) x 4 (maps) of the base image, bounded by MAX_TEXTURE_DIM
    and reclaimed at runtime by mip streaming (engine/streaming.py).
    """
    texels: np.ndarray          # (N, 16) u32 packed RGBA8 quad-map rows
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
    runtime mippers).  Dims follow EXACT floor-halving max(d//2, 1) —
    the analytic-descriptor path (ops/texture.analytic_desc) depends on
    it; a dim already at 1 duplicates so non-square chains never
    degenerate to zero-size mips (128x32 used to produce (2, 0))."""
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    if h == 1:
        img = np.repeat(img, 2, axis=0)
    if w == 1:
        img = np.repeat(img, 2, axis=1)
    img = img[:h2 * 2, :w2 * 2].astype(np.uint16)
    out = (img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2]
           + img[1::2, 1::2] + 2) // 4
    return out.astype(np.uint8)


def build_mips(img: np.ndarray) -> list[np.ndarray]:
    mips = [img]
    while max(mips[-1].shape[:2]) > 1 and len(mips) < MAX_MIPS:
        mips.append(_downsample2x(mips[-1]))
    return mips


def _resample(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest resample of (H, W, 4) u8 to (h, w, 4) (maps of one material
    are unified to a common resolution at build)."""
    if img.shape[0] == h and img.shape[1] == w:
        return img
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys[:, None], xs[None, :]]


def build_atlas(doc=None,
                material_maps: list[dict] | None = None,
                images: list[np.ndarray] | None = None,
                wrap_modes=None) -> TextureAtlas:
    """Build the material atlas.

    doc: GltfDocument — one entry per material that references any texture
    (base/normal/MR/emissive indices on GltfMaterial).
    material_maps: explicit list of {'base'|'normal'|'mr'|'emissive':
    (H, W, 4) u8, 'wrap': int} dicts (procedural scenes / tests).
    images: base-color-only shorthand for material_maps.
    Entry order == the order of textured materials; callers map material
    index -> entry id (scenebuild wires mat_base_color_tex).
    """
    if images is not None:
        wraps_in = list(wrap_modes or [WRAP_REPEAT] * len(images))
        material_maps = list(material_maps or []) + [
            dict(base=img, wrap=wraps_in[i])
            for i, img in enumerate(images)]
    entries: list[dict] = []
    if doc is not None:
        decoded: dict[int, np.ndarray | list | None] = {}

        def get(ti):
            if ti < 0 or ti >= len(doc.textures):
                return None
            if ti not in decoded:
                t = doc.textures[ti]
                t.base_dir = doc.base_dir
                decoded[ti] = _decode_image(t)
            return decoded[ti]

        for m in doc.materials:
            # entry per material that REFERENCES any texture (decode
            # failures still get an entry of neutral maps, keeping entry
            # ids aligned with scenebuild._material_atlas_entries)
            if (m.base_color_texture < 0 and m.normal_texture < 0
                    and m.metallic_roughness_texture < 0
                    and m.emissive_texture < 0):
                continue
            maps = dict(base=get(m.base_color_texture),
                        normal=get(m.normal_texture),
                        mr=get(m.metallic_roughness_texture),
                        emissive=get(m.emissive_texture))
            bt = m.base_color_texture
            wrap = WRAP_REPEAT
            if 0 <= bt < len(doc.textures):
                wrap = (WRAP_CLAMP if doc.textures[bt].wrap_s == 33071
                        else WRAP_REPEAT)
            maps['wrap'] = wrap
            entries.append(maps)
    if material_maps is not None:
        entries.extend(material_maps)

    n = max(len(entries), 1)
    offsets = np.full((n, MAX_MIPS), -1, np.int32)
    widths = np.zeros((n, MAX_MIPS), np.int32)
    heights = np.zeros((n, MAX_MIPS), np.int32)
    num_mips = np.zeros((n,), np.int32)
    wraps = np.zeros((n,), np.int32)
    chunks = []
    cursor = 0
    keys = ('base', 'normal', 'mr', 'emissive')
    for ei, ent in enumerate(entries):
        a = (-cursor) % ATLAS_ALIGN      # align the chain base (above)
        if a:
            chunks.append(np.zeros((a, ROW_U32), np.uint32))
            cursor += a
        wrap = int(ent.get('wrap', WRAP_REPEAT))
        wraps[ei] = wrap
        # resolution = the base map's (or the largest present map's)
        ref = ent.get('base')
        if ref is None:
            sizes = [v.shape[:2] if isinstance(v, np.ndarray)
                     else v[0].shape[:2]
                     for v in (ent.get(k) for k in keys)
                     if v is not None]
            ref_hw = max(sizes, key=lambda s: s[0] * s[1])
        else:
            ref_hw = (ref.shape[:2] if isinstance(ref, np.ndarray)
                      else ref[0].shape[:2])
        per_map_mips = []
        for mi_k, k in enumerate(keys):
            img = ent.get(k)
            if img is None:
                img = np.broadcast_to(
                    _NEUTRAL[mi_k], (1, 1, 4)).copy()
            if isinstance(img, list):       # pre-built DDS mip chain
                img = img[0]
            img = _resample(img, *ref_hw)
            per_map_mips.append(build_mips(img))
        n_m = min(len(mm) for mm in per_map_mips)
        for mi in range(min(n_m, MAX_MIPS)):
            packed = np.concatenate(
                [_quad_expand(_pack_rgba8(per_map_mips[k][mi]), wrap)
                 for k in range(4)], axis=1)            # (HW, 16)
            offsets[ei, mi] = cursor
            heights[ei, mi], widths[ei, mi] = (
                per_map_mips[0][mi].shape[:2])
            chunks.append(packed)
            cursor += packed.shape[0]
            num_mips[ei] = mi + 1
    if not chunks:
        texels = np.zeros((1, ROW_U32), np.uint32)
        texels[:, 0:4] = 0xFFFFFFFF
        num_mips[0] = 1
        widths[0, 0] = heights[0, 0] = 1
        offsets[0, 0] = 0
    else:
        texels = np.concatenate(chunks)
    pad = (-len(texels)) % 128
    if pad:
        texels = np.concatenate(
            [texels, np.zeros((pad, ROW_U32), np.uint32)])
    return TextureAtlas(
        texels=texels.astype(np.uint32),
        desc_offset=offsets, desc_width=widths, desc_height=heights,
        num_mips=num_mips, wrap_mode=wraps,
        min_resident_mip=np.zeros((n,), np.int32),
        num_textures=len(entries))


def checkerboard(size: int = 256, tiles: int = 8,
                 c0=(255, 255, 255), c1=(40, 40, 40)) -> np.ndarray:
    """Procedural test texture."""
    y, x = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    m = ((x * tiles // size) + (y * tiles // size)) % 2
    img = np.where(m[..., None] == 0,
                   np.asarray(c0, np.uint8), np.asarray(c1, np.uint8))
    return np.concatenate(
        [img, np.full((size, size, 1), 255, np.uint8)], -1)


def bump_normal_map(size: int = 256, bumps: int = 16,
                    amplitude: float = 1.0) -> np.ndarray:
    """Procedural tangent-space normal map: a sine-bump height field's
    analytic gradient, encoded glTF-style (+Y up, 0.5-biased)."""
    t = np.linspace(0, 2 * np.pi * bumps, size, endpoint=False)
    y, x = np.meshgrid(t, t, indexing='ij')
    dhdx = amplitude * np.cos(x) * np.sin(y)
    dhdy = amplitude * np.sin(x) * np.cos(y)
    n = np.stack([-dhdx, -dhdy, np.ones_like(dhdx)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rgb = ((n * 0.5 + 0.5) * 255.0 + 0.5).astype(np.uint8)
    return np.concatenate(
        [rgb, np.full((size, size, 1), 255, np.uint8)], -1)
