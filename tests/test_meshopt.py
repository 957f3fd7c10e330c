"""EXT_meshopt_compression codec tests: roundtrips over diverse data and
a full compressed-GLB load through scene/gltf.py (the reference decodes
these views via meshoptimizer, source/SceneLoading.cpp:239-301)."""

import json
import struct

import numpy as np
import pytest

from toyrenderer_tpu.scene import meshopt as M

pytestmark = pytest.mark.skipif(
    __import__('toyrenderer_tpu.native', fromlist=['meshopt_lib']
               ).meshopt_lib() is None,
    reason="no native toolchain")


def test_vertex_roundtrip_float_positions():
    rng = np.random.default_rng(0)
    for count in (1, 5, 16, 255, 256, 257, 1000, 5000):
        verts = rng.normal(size=(count, 3)).astype(np.float32)
        raw = verts.view(np.uint8).reshape(count, 12)
        enc = M.encode_vertex_buffer(raw)
        dec = M.decode_vertex_buffer(enc, count, 12)
        assert np.array_equal(dec, raw)
        # quantized data compresses well; float noise at least stays small
        # (+64 covers the fixed header/tail on tiny buffers)
        assert len(enc) < raw.nbytes * 1.6 + 64


def test_vertex_roundtrip_quantized_compresses():
    rng = np.random.default_rng(1)
    # 16-bit quantized positions on a smooth surface: deltas are tiny
    t = np.linspace(0, 2 * np.pi, 4096)
    pos = np.stack([np.cos(t), np.sin(t), t], -1)
    q = ((pos - pos.min(0)) / (np.ptp(pos, 0) + 1e-9) * 65535).astype(
        np.uint16)
    pad = np.zeros((len(q), 1), np.uint16)
    raw = np.concatenate([q, pad], 1).view(np.uint8)   # stride 8
    enc = M.encode_vertex_buffer(raw)
    dec = M.decode_vertex_buffer(enc, len(q), 8)
    assert np.array_equal(dec, raw)
    assert len(enc) < raw.nbytes * 0.55  # real compression, not passthrough


def _tri_set(idx):
    tris = idx.reshape(-1, 3)
    return {tuple(np.roll(t, -int(np.argmin(t)))) for t in map(tuple, tris)}


def test_index_roundtrip_strip_order():
    # meshlet-style locality: triangle strips over a grid
    w = 40
    tris = []
    for y in range(30):
        for x in range(w - 1):
            a = y * w + x
            tris += [[a, a + 1, a + w], [a + 1, a + w + 1, a + w]]
    idx = np.asarray(tris, np.uint32).reshape(-1)
    enc = M.encode_index_buffer(idx)
    dec = M.decode_index_buffer(enc, len(idx))
    # codec preserves triangles up to rotation (winding kept)
    assert _tri_set(dec) == _tri_set(idx)
    assert len(enc) < idx.nbytes * 0.35


def test_index_roundtrip_random():
    rng = np.random.default_rng(2)
    for n_tri in (1, 2, 33, 500):
        idx = rng.integers(0, 300, size=n_tri * 3).astype(np.uint32)
        enc = M.encode_index_buffer(idx)
        dec = M.decode_index_buffer(enc, len(idx))
        assert _tri_set(dec) == _tri_set(idx)


def test_index_sequence_roundtrip():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 100000, size=777).astype(np.uint32)
    enc = M.encode_index_sequence(idx)
    dec = M.decode_index_sequence(enc, len(idx))
    assert np.array_equal(dec, idx)


def test_filter_exponential():
    # value = mantissa * 2^exponent; build known encodings
    vals = [(3, 5), (-7, -2), (100, 0), (0, 10)]
    enc = np.zeros((len(vals), 4), np.uint8)
    for i, (m, e) in enumerate(vals):
        u = ((e & 0xFF) << 24) | (m & 0xFFFFFF)
        enc[i] = np.frombuffer(struct.pack('<I', u), np.uint8)
    out = M.apply_filter(enc.copy(), 'EXPONENTIAL')
    got = out.view(np.float32)[:, 0]
    want = [m * 2.0 ** e for m, e in vals]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_filter_octahedral_unit_normals():
    rng = np.random.default_rng(4)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    # octahedral-encode to snorm8 (x/(|x|+|y|+|z|), y/...) with z fold
    s = np.abs(n).sum(1, keepdims=True)
    oc = n[:, :2] / s
    neg = n[:, 2] < 0
    ox, oy = oc[:, 0].copy(), oc[:, 1].copy()
    ox[neg] = (1 - np.abs(oc[neg, 1])) * np.sign(oc[neg, 0])
    oy[neg] = (1 - np.abs(oc[neg, 0])) * np.sign(oc[neg, 1])
    enc = np.zeros((64, 4), np.int8)
    enc[:, 0] = np.round(ox * 127)
    enc[:, 1] = np.round(oy * 127)
    out = M.apply_filter(enc.view(np.uint8).copy(), 'OCTAHEDRAL')
    dec = out.view(np.int8).astype(np.float32)[:, :3] / 127.0
    dec /= np.linalg.norm(dec, axis=1, keepdims=True)
    dots = (dec * n).sum(1)
    assert dots.min() > 0.995    # direction recovered within ~6 degrees


def _build_compressed_glb(tmp_path):
    """A two-triangle quad GLB with meshopt-compressed attribute +
    index views (the layout gltfpack emits: compressed payload buffer +
    fallback buffer declaration)."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint32)

    vb = np.concatenate([pos, nrm, uv], 1).view(np.uint8)   # stride 32
    enc_v = M.encode_vertex_buffer(vb)
    enc_i = M.encode_index_buffer(idx)
    pad_v = (-len(enc_v)) % 4
    bin_chunk = enc_v + b"\0" * pad_v + enc_i
    bin_chunk += b"\0" * ((-len(bin_chunk)) % 4)

    gltf = {
        "asset": {"version": "2.0"},
        "extensionsUsed": ["EXT_meshopt_compression"],
        "extensionsRequired": ["EXT_meshopt_compression"],
        "buffers": [
            {"byteLength": len(bin_chunk)},
            {"byteLength": vb.nbytes + idx.nbytes,
             "extensions": {"EXT_meshopt_compression": {"fallback": True}}},
        ],
        "bufferViews": [
            {"buffer": 1, "byteOffset": 0, "byteLength": vb.nbytes,
             "byteStride": 32,
             "extensions": {"EXT_meshopt_compression": {
                 "buffer": 0, "byteOffset": 0, "byteLength": len(enc_v),
                 "byteStride": 32, "count": 4, "mode": "ATTRIBUTES"}}},
            {"buffer": 1, "byteOffset": vb.nbytes,
             "byteLength": idx.nbytes,
             "extensions": {"EXT_meshopt_compression": {
                 "buffer": 0, "byteOffset": len(enc_v) + pad_v,
                 "byteLength": len(enc_i), "byteStride": 4, "count": 6,
                 "mode": "TRIANGLES"}}},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
             "count": 4, "type": "VEC2"},
            {"bufferView": 1, "componentType": 5125, "count": 6,
             "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    glb = struct.pack("<III", 0x46546C67, 2, total)
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    p = tmp_path / "quad_meshopt.glb"
    p.write_bytes(glb)
    return p, pos, idx


def test_compressed_glb_loads(tmp_path):
    from toyrenderer_tpu.scene.gltf import load_gltf
    p, pos, idx = _build_compressed_glb(tmp_path)
    doc = load_gltf(p)
    prim = doc.meshes[0].primitives[0]
    np.testing.assert_allclose(prim.positions, pos)
    assert _tri_set(prim.indices) == _tri_set(idx)
    np.testing.assert_allclose(prim.normals[:, 2], 1.0)
