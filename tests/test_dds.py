"""DDS loader tests with hand-crafted files."""

import struct

import numpy as np

from toyrenderer_tpu.scene import dds as D


def _dds_header(fourcc: bytes, w: int, h: int, mips: int = 1) -> bytes:
    hdr = bytearray(128)
    struct.pack_into("<I", hdr, 0, D.DDS_MAGIC)
    struct.pack_into("<7I", hdr, 4, 124, 0x1007 | 0x20000, h, w, 0, 0, mips)
    struct.pack_into("<II", hdr, 80, 32, D.DDPF_FOURCC)
    hdr[88:92] = fourcc
    return bytes(hdr)


def _bc1_solid_block(r, g, b):
    c565 = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
    # color0 == color1 would trigger the 3-color mode; nudge color1 lower
    return struct.pack("<HHI", c565 | 1, c565, 0)   # all indices -> color0


def test_bc1_solid_color():
    data = _dds_header(b"DXT1", 8, 4) + _bc1_solid_block(248, 120, 64) * 2
    mips = D.load_dds(data)
    assert mips is not None and len(mips) == 1
    img = mips[0]
    assert img.shape == (4, 8, 4)
    assert abs(int(img[0, 0, 0]) - 248) <= 8
    assert abs(int(img[2, 6, 1]) - 120) <= 8
    assert (img[..., 3] == 255).all()


def test_bc1_gradient_palette():
    # color0 = white, color1 = black, indices cycle 0..3
    blk = struct.pack("<HH", 0xFFFF, 0x0000)
    idx = 0
    for t in range(16):
        idx |= (t % 4) << (2 * t)
    data = _dds_header(b"DXT1", 4, 4) + blk + struct.pack("<I", idx)
    img = D.load_dds(data)[0]
    # palette: 255, 0, 170, 85
    row = img[0, :, 0].tolist()
    assert row[0] == 255 and row[1] == 0
    assert 160 <= row[2] <= 180 and 75 <= row[3] <= 95


def test_bc3_alpha():
    # BC3: alpha block (a0=255, a1=0, indices all 0 -> alpha 255),
    # color = solid
    ab = struct.pack("<BB", 255, 0) + b"\x00" * 6
    data = (_dds_header(b"DXT5", 4, 4)
            + ab + _bc1_solid_block(16, 200, 16))
    img = D.load_dds(data)[0]
    assert (img[..., 3] == 255).all()
    assert abs(int(img[1, 1, 1]) - 200) <= 8


def test_mip_chain():
    blocks = _bc1_solid_block(128, 128, 128)
    # 8x8 (4 blocks) + 4x4 (1) + 2x2 (1) + 1x1 (1)
    data = (_dds_header(b"DXT1", 8, 8, mips=4)
            + blocks * 4 + blocks + blocks + blocks)
    mips = D.load_dds(data)
    assert len(mips) == 4
    assert mips[0].shape == (8, 8, 4)
    assert mips[3].shape == (1, 1, 4)


def test_uncompressed_dx10():
    hdr = bytearray(_dds_header(b"DX10", 2, 2))
    ext = struct.pack("<5I", 28, 3, 0, 1, 0)   # DXGI RGBA8
    px = np.arange(2 * 2 * 4, dtype=np.uint8).tobytes()
    img = D.load_dds(bytes(hdr) + ext + px)[0]
    assert img.shape == (2, 2, 4)
    assert img[0, 0, 0] == 0 and img[1, 1, 3] == 15


def test_bad_data_returns_none():
    assert D.load_dds(b"notadds") is None
    assert D.load_dds(_dds_header(b"XXXX", 4, 4) + b"\x00" * 8) is None


def test_bc3_color_always_four_mode():
    """BC2/BC3 color blocks are ALWAYS 4-color mode per the DX spec even
    when c0 <= c1 (only standalone BC1 switches to 3-color mode)."""
    # c0 = black (0x0000), c1 = white (0xFFFF): c0 <= c1.
    blk = struct.pack("<HH", 0x0000, 0xFFFF)
    idx = 0
    for t in range(16):
        idx |= (t % 4) << (2 * t)
    ab = struct.pack("<BB", 255, 0) + b"\x00" * 6   # opaque alpha
    data = (_dds_header(b"DXT5", 4, 4)
            + ab + blk + struct.pack("<I", idx))
    img = D.load_dds(data)[0]
    row = img[0, :, 0].tolist()
    # 4-color palette: 0, 255, (2*0+255)/3=85, (0+2*255)/3=170
    assert row[0] == 0 and row[1] == 255
    assert 75 <= row[2] <= 95 and 160 <= row[3] <= 180
    assert (img[..., 3] == 255).all()
