// EXT_meshopt_compression buffer codecs (vertex / index / index-sequence)
// plus the octahedral / quaternion / exponential filters.
//
// Capability counterpart of the reference's meshoptimizer-based decode
// (source/SceneLoading.cpp:239-301 calls meshopt_decodeVertexBuffer /
// decodeIndexBuffer / decodeIndexSequence + decodeFilterOct/Quat/Exp).
// This is an independent implementation written from the publicly
// documented wire format of the meshoptimizer codecs (byte-channel
// delta blocks with 2-bit-selected group bit widths for attributes;
// edge-FIFO/vertex-FIFO triangle codes with a code-aux table for
// indices; zigzag varint deltas for sequences).  Encoder and decoder
// are both provided so the asset pipeline (tools/gen_scene.py) can
// emit compressed GLBs and the loader can read them; round-trip and
// hand-built-stream tests live in tests/test_meshopt.py.
//
// Build: toyrenderer_tpu.native.meshopt_lib() compiles this with g++.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr size_t kVertexBlockSizeBytes = 8192;
constexpr size_t kVertexBlockMaxSize = 256;
constexpr size_t kByteGroupSize = 16;
constexpr size_t kTailMaxSize = 32;

inline uint8_t zigzag8(int v) { return uint8_t((v >> 7) ^ (v << 1)); }
inline int unzigzag8(uint8_t v) { return -(v & 1) ^ (v >> 1); }

inline size_t vertex_block_size(size_t stride) {
  size_t result = kVertexBlockSizeBytes / stride;
  result &= ~(kByteGroupSize - 1);
  return result < kVertexBlockMaxSize ? result : kVertexBlockMaxSize;
}

// ---------------------------------------------------------------------------
// byte-group bit codec: groups of 16 delta bytes, a 2-bit header per group
// selecting {0, 2, 4, 8} bits per byte; values saturating the field are
// sentinels followed by the raw byte after the packed group.
// ---------------------------------------------------------------------------
const int kBitsTable[4] = {0, 2, 4, 8};

// encode one channel's deltas (n bytes, n multiple of 16 after padding)
// returns bytes written or -1 on overflow
static ptrdiff_t encode_bytes(uint8_t* dst, size_t cap, const uint8_t* src,
                              size_t n) {
  size_t groups = (n + kByteGroupSize - 1) / kByteGroupSize;
  size_t header_bytes = (groups + 3) / 4;
  if (header_bytes > cap) return -1;
  uint8_t* header = dst;
  memset(header, 0, header_bytes);
  uint8_t* out = dst + header_bytes;
  uint8_t* end = dst + cap;

  for (size_t g = 0; g < groups; ++g) {
    uint8_t buf[kByteGroupSize] = {0};
    size_t base = g * kByteGroupSize;
    size_t cnt = n - base < kByteGroupSize ? n - base : kByteGroupSize;
    memcpy(buf, src + base, cnt);

    // pick the smallest width that fits best (cost in bytes per option)
    size_t best_bits = 8, best_cost = kByteGroupSize;
    for (int bi = 0; bi < 4; ++bi) {
      int bits = kBitsTable[bi];
      size_t cost;
      if (bits == 0) {
        bool all0 = true;
        for (size_t i = 0; i < kByteGroupSize; ++i) all0 &= buf[i] == 0;
        if (!all0) continue;
        cost = 0;
      } else if (bits == 8) {
        cost = kByteGroupSize;
      } else {
        unsigned sentinel = (1u << bits) - 1;
        size_t esc = 0;
        for (size_t i = 0; i < kByteGroupSize; ++i)
          if (buf[i] >= sentinel) ++esc;
        cost = kByteGroupSize * bits / 8 + esc;
      }
      if (cost < best_cost) { best_cost = cost; best_bits = (size_t)bits; }
      if (bits == 0 && cost == 0) { best_bits = 0; best_cost = 0; break; }
    }

    int code = best_bits == 0 ? 0 : best_bits == 2 ? 1
               : best_bits == 4 ? 2 : 3;
    header[g / 4] |= uint8_t(code << ((g % 4) * 2));

    if (best_bits == 0) continue;
    if (out + best_cost > end) return -1;
    if (best_bits == 8) {
      memcpy(out, buf, kByteGroupSize);
      out += kByteGroupSize;
      continue;
    }
    unsigned sentinel = (1u << best_bits) - 1;
    size_t per_byte = 8 / best_bits;
    uint8_t* esc = out + kByteGroupSize * best_bits / 8;
    for (size_t i = 0; i < kByteGroupSize; i += per_byte) {
      uint8_t b = 0;
      for (size_t j = 0; j < per_byte; ++j) {
        unsigned v = buf[i + j] >= sentinel ? sentinel : buf[i + j];
        b |= uint8_t(v << (8 - best_bits * (j + 1)));   // first in high bits
      }
      out[i / per_byte] = b;
    }
    for (size_t i = 0; i < kByteGroupSize; ++i)
      if (buf[i] >= sentinel) {
        if (esc >= end) return -1;
        *esc++ = buf[i];
      }
    out = esc;
  }
  return out - dst;
}

static ptrdiff_t decode_bytes(uint8_t* dst, size_t n, const uint8_t* src,
                              size_t srclen) {
  size_t groups = (n + kByteGroupSize - 1) / kByteGroupSize;
  size_t header_bytes = (groups + 3) / 4;
  if (header_bytes > srclen) return -1;
  const uint8_t* header = src;
  const uint8_t* in = src + header_bytes;
  const uint8_t* end = src + srclen;

  for (size_t g = 0; g < groups; ++g) {
    uint8_t buf[kByteGroupSize] = {0};
    int code = (header[g / 4] >> ((g % 4) * 2)) & 3;
    int bits = kBitsTable[code];
    if (bits == 8) {
      if (in + kByteGroupSize > end) return -1;
      memcpy(buf, in, kByteGroupSize);
      in += kByteGroupSize;
    } else if (bits != 0) {
      unsigned sentinel = (1u << bits) - 1;
      size_t per_byte = 8 / (size_t)bits;
      size_t packed = kByteGroupSize * bits / 8;
      if (in + packed > end) return -1;
      const uint8_t* esc = in + packed;
      for (size_t i = 0; i < kByteGroupSize; ++i) {
        size_t byte_i = i / per_byte, slot = i % per_byte;
        unsigned v = (in[byte_i] >> (8 - bits * (slot + 1)))
                     & ((1u << bits) - 1);
        if (v == sentinel) {
          if (esc >= end) return -1;
          buf[i] = *esc++;
        } else {
          buf[i] = uint8_t(v);
        }
      }
      in = esc;
    }
    size_t base = g * kByteGroupSize;
    size_t cnt = n - base < kByteGroupSize ? n - base : kByteGroupSize;
    memcpy(dst + base, buf, cnt);
  }
  return in - src;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Vertex buffer codec (EXT_meshopt_compression mode "ATTRIBUTES")
// stream := 0xA0 | blocks | tail(max(stride, 32); last stride bytes = first
// vertex raw).  Each block stores, per byte position of the stride, the
// zigzag deltas vs the previous vertex, bit-packed per 16-vertex group.
// ---------------------------------------------------------------------------

ptrdiff_t mcodec_encode_vertex_buffer(uint8_t* dst, size_t cap,
                                      const uint8_t* src, size_t count,
                                      size_t stride) {
  if (stride == 0 || stride > 256 || (stride % 4) != 0) return -1;
  if (cap < 1) return -1;
  uint8_t* out = dst;
  uint8_t* end = dst + cap;
  *out++ = 0xA0;

  uint8_t last[256];
  memcpy(last, src, count ? stride : 0);

  size_t vbs = vertex_block_size(stride);
  uint8_t deltas[kVertexBlockMaxSize];

  for (size_t start = 0; start < count; start += vbs) {
    size_t bn = count - start < vbs ? count - start : vbs;
    size_t bn_pad = (bn + kByteGroupSize - 1) & ~(kByteGroupSize - 1);
    for (size_t k = 0; k < stride; ++k) {
      uint8_t prev = last[k];
      for (size_t i = 0; i < bn; ++i) {
        uint8_t cur = src[(start + i) * stride + k];
        // wrap to int8 first: zigzag is only bijective on [-128, 127]
        deltas[i] = zigzag8(int8_t(uint8_t(cur - prev)));
        prev = cur;
      }
      for (size_t i = bn; i < bn_pad; ++i) deltas[i] = 0;
      ptrdiff_t w = encode_bytes(out, end - out, deltas, bn_pad);
      if (w < 0) return -1;
      out += w;
    }
    memcpy(last, src + (start + bn - 1) * stride, stride);
  }

  size_t tail = stride < kTailMaxSize ? kTailMaxSize : stride;
  if (out + tail > end) return -1;
  memset(out, 0, tail);
  if (count) memcpy(out + tail - stride, src, stride);
  out += tail;
  return out - dst;
}

ptrdiff_t mcodec_decode_vertex_buffer(uint8_t* dst, size_t count,
                                      size_t stride, const uint8_t* src,
                                      size_t srclen) {
  if (stride == 0 || stride > 256 || (stride % 4) != 0) return -1;
  size_t tail = stride < kTailMaxSize ? kTailMaxSize : stride;
  if (srclen < 1 + tail) return -1;
  if ((src[0] & 0xF0) != 0xA0) return -1;

  uint8_t last[256];
  memcpy(last, src + srclen - stride, stride);

  const uint8_t* in = src + 1;
  const uint8_t* end = src + srclen - tail;
  size_t vbs = vertex_block_size(stride);
  uint8_t deltas[kVertexBlockMaxSize];

  for (size_t start = 0; start < count; start += vbs) {
    size_t bn = count - start < vbs ? count - start : vbs;
    size_t bn_pad = (bn + kByteGroupSize - 1) & ~(kByteGroupSize - 1);
    for (size_t k = 0; k < stride; ++k) {
      ptrdiff_t r = decode_bytes(deltas, bn_pad, in, end - in);
      if (r < 0) return -1;
      in += r;
      uint8_t prev = last[k];
      for (size_t i = 0; i < bn; ++i) {
        prev = uint8_t(int(prev) + unzigzag8(deltas[i]));
        dst[(start + i) * stride + k] = prev;
      }
    }
    memcpy(last, dst + (start + bn - 1) * stride, stride);
  }
  return ptrdiff_t(count * stride);
}

// ---------------------------------------------------------------------------
// Index buffer codec (mode "TRIANGLES"): edge FIFO + vertex FIFO machine.
// stream := 0xE1 | one code byte per triangle | aux data | codeaux[16]
// ---------------------------------------------------------------------------

namespace {

struct Edge { uint32_t a, b; };

inline void push_edge(Edge* fifo, size_t& off, uint32_t a, uint32_t b) {
  fifo[off & 15] = {a, b};
  ++off;
}
inline void push_vertex(uint32_t* fifo, size_t& off, uint32_t v,
                        bool cond = true) {
  fifo[off & 15] = v;
  off += cond ? 1 : 0;
}

inline void write_varint(uint8_t*& out, uint32_t v) {
  while (v >= 0x80) { *out++ = uint8_t(v | 0x80); v >>= 7; }
  *out++ = uint8_t(v);
}
inline uint32_t read_varint(const uint8_t*& in) {
  uint32_t v = 0; int shift = 0;
  while (true) {
    uint8_t b = *in++;
    v |= uint32_t(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  return v;
}
inline uint32_t zigzag32(int32_t v) {
  return (uint32_t(v) << 1) ^ uint32_t(v >> 31);
}
inline int32_t unzigzag32(uint32_t v) {
  return int32_t(v >> 1) ^ -int32_t(v & 1);
}

// default code-aux table: (feb, fec) nibble pairs for fresh triangles
const uint8_t kCodeAux[16] = {
    0x00, 0x76, 0x87, 0x56, 0x67, 0x78, 0xa9, 0x86,
    0x65, 0x89, 0x68, 0x98, 0x01, 0x69, 0x00, 0x00,
};

}  // namespace

ptrdiff_t mcodec_encode_index_buffer(uint8_t* dst, size_t cap,
                                     const uint32_t* idx, size_t n_idx) {
  if (n_idx % 3 != 0) return -1;
  size_t n_tri = n_idx / 3;
  if (cap < 1 + n_tri + 16) return -1;
  uint8_t* codes = dst + 1;
  // aux data written into a scratch region after codes; bounded by
  // 5 bytes per explicit index (worst case 3 per triangle)
  uint8_t* data = codes + n_tri;
  uint8_t* end = dst + cap - 16;
  dst[0] = 0xE1;

  Edge efifo[16] = {};
  uint32_t vfifo[16] = {};
  size_t eoff = 0, voff = 0;
  uint32_t next = 0;
  uint32_t last = 0;

  auto vertex_code = [&](uint32_t v) -> int {
    // 0 = next, 1..14 = fifo slot, 15 = explicit
    if (v == next) return 0;
    for (int i = 1; i < 15; ++i)
      if (voff >= size_t(i) && vfifo[(voff - i) & 15] == v) return i;
    return 15;
  };

  for (size_t t = 0; t < n_tri; ++t) {
    uint32_t a = idx[t * 3], b = idx[t * 3 + 1], c = idx[t * 3 + 2];

    // find a FIFO edge matching one of our edges (any rotation)
    int fe = -1;
    uint32_t ra = a, rb = b, rc = c;
    for (int i = 1; i <= 15 && fe < 0; ++i) {
      if (eoff < size_t(i)) break;
      Edge e = efifo[(eoff - i) & 15];
      if (e.a == a && e.b == b) { fe = i - 1; ra = a; rb = b; rc = c; }
      else if (e.a == b && e.b == c) { fe = i - 1; ra = b; rb = c; rc = a; }
      else if (e.a == c && e.b == a) { fe = i - 1; ra = c; rb = a; rc = b; }
    }

    if (fe >= 0) {
      int fec = vertex_code(rc);
      if (data + 5 > end) return -1;
      if (fec == 0) {
        push_vertex(vfifo, voff, rc);
        ++next;
      } else if (fec == 15) {
        write_varint(data, zigzag32(int32_t(rc) - int32_t(last)));
        last = rc;
        push_vertex(vfifo, voff, rc);
      }
      codes[t] = uint8_t((fe << 4) | fec);
      push_edge(efifo, eoff, rc, rb);
      push_edge(efifo, eoff, ra, rc);
    } else {
      // fresh triangle: a from 'next' or explicit; b/c via aux nibbles
      int fea = (a == next) ? 0 : 15;
      if (fea == 0) ++next;
      int feb = vertex_code(b);
      if (feb == 0) ++next;
      else if (feb == 15) feb = 15;
      int fec = vertex_code(c);
      if (fec == 0) ++next;
      else if (fec == 15) fec = 15;
      // can we use the codeaux table? (fea must be 0 and feb/fec < 15)
      int aux = (feb << 4) | fec;
      int slot = -1;
      if (fea == 0 && feb < 15 && fec < 15)
        for (int i = 0; i < 14; ++i)
          if (kCodeAux[i] == aux) { slot = i; break; }
      if (data + 16 > end) return -1;
      if (slot >= 0) {
        codes[t] = uint8_t(0xF0 | slot);
      } else {
        codes[t] = uint8_t(0xF0 | (fea == 0 ? 14 : 15));
        *data++ = uint8_t(aux);
      }
      if (fea == 15) {
        write_varint(data, zigzag32(int32_t(a) - int32_t(last)));
        last = a;
      }
      if (feb == 15) {
        write_varint(data, zigzag32(int32_t(b) - int32_t(last)));
        last = b;
      }
      if (fec == 15) {
        write_varint(data, zigzag32(int32_t(c) - int32_t(last)));
        last = c;
      }
      push_vertex(vfifo, voff, a);
      push_vertex(vfifo, voff, b, feb == 0 || feb == 15);
      push_vertex(vfifo, voff, c, fec == 0 || fec == 15);
      push_edge(efifo, eoff, b, a);
      push_edge(efifo, eoff, c, b);
      push_edge(efifo, eoff, a, c);
    }
  }

  memcpy(data, kCodeAux, 16);
  return data + 16 - dst;
}

ptrdiff_t mcodec_decode_index_buffer(uint32_t* idx, size_t n_idx,
                                     const uint8_t* src, size_t srclen) {
  if (n_idx % 3 != 0) return -1;
  size_t n_tri = n_idx / 3;
  if (srclen < 1 + n_tri + 16) return -1;
  if ((src[0] & 0xF0) != 0xE0) return -1;
  const uint8_t* codes = src + 1;
  const uint8_t* data = codes + n_tri;
  const uint8_t* codeaux = src + srclen - 16;

  Edge efifo[16] = {};
  uint32_t vfifo[16] = {};
  size_t eoff = 0, voff = 0;
  uint32_t next = 0, last = 0;

  auto fetch_vertex = [&](int code, bool& pushed) -> uint32_t {
    if (code == 0) { pushed = true; return next++; }
    if (code < 15) { pushed = false; return vfifo[(voff - code) & 15]; }
    last = uint32_t(int32_t(last) + unzigzag32(read_varint(data)));
    pushed = true;
    return last;
  };

  for (size_t t = 0; t < n_tri; ++t) {
    uint8_t code = codes[t];
    int fe = code >> 4;
    if (fe < 15) {
      Edge e = efifo[(eoff - 1 - fe) & 15];
      uint32_t a = e.a, b = e.b;
      bool pushed;
      uint32_t c = fetch_vertex(code & 15, pushed);
      if (pushed) push_vertex(vfifo, voff, c);
      idx[t * 3] = a; idx[t * 3 + 1] = b; idx[t * 3 + 2] = c;
      push_edge(efifo, eoff, c, b);
      push_edge(efifo, eoff, a, c);
    } else {
      int fec2 = code & 15;
      int fea, feb, fec;
      if (fec2 < 14) {
        uint8_t z = codeaux[fec2];
        fea = 0; feb = z >> 4; fec = z & 15;
      } else {
        uint8_t e = *data++;
        fea = fec2 == 14 ? 0 : 15;
        feb = e >> 4; fec = e & 15;
      }
      uint32_t a;
      if (fea == 0) a = next++;
      else {
        last = uint32_t(int32_t(last) + unzigzag32(read_varint(data)));
        a = last;
      }
      bool pb, pc;
      uint32_t b = fetch_vertex(feb, pb);
      uint32_t c = fetch_vertex(fec, pc);
      idx[t * 3] = a; idx[t * 3 + 1] = b; idx[t * 3 + 2] = c;
      push_vertex(vfifo, voff, a);
      if (pb) push_vertex(vfifo, voff, b);
      if (pc) push_vertex(vfifo, voff, c);
      push_edge(efifo, eoff, b, a);
      push_edge(efifo, eoff, c, b);
      push_edge(efifo, eoff, a, c);
    }
  }
  return ptrdiff_t(n_idx * 4);
}

// ---------------------------------------------------------------------------
// Index sequence codec (mode "INDICES"): zigzag varint delta stream.
// stream := 0xD1 | varints
// ---------------------------------------------------------------------------

ptrdiff_t mcodec_encode_index_sequence(uint8_t* dst, size_t cap,
                                       const uint32_t* idx, size_t n_idx) {
  if (cap < 1 + n_idx * 5) return -1;
  uint8_t* out = dst;
  *out++ = 0xD1;
  uint32_t last = 0;
  for (size_t i = 0; i < n_idx; ++i) {
    write_varint(out, zigzag32(int32_t(idx[i]) - int32_t(last)));
    last = idx[i];
  }
  return out - dst;
}

ptrdiff_t mcodec_decode_index_sequence(uint32_t* idx, size_t n_idx,
                                       const uint8_t* src, size_t srclen) {
  if (srclen < 1 || (src[0] & 0xF0) != 0xD0) return -1;
  const uint8_t* in = src + 1;
  const uint8_t* end = src + srclen;
  uint32_t last = 0;
  for (size_t i = 0; i < n_idx; ++i) {
    if (in >= end) return -1;
    last = uint32_t(int32_t(last) + unzigzag32(read_varint(in)));
    idx[i] = last;
  }
  return ptrdiff_t(n_idx * 4);
}

// ---------------------------------------------------------------------------
// Filters (applied after decode; gltfpack emits these for normals /
// rotations / floats).  Layouts follow the EXT_meshopt_compression spec:
//   octahedral: snorm8x4 or snorm16x4 per element, (x, y, ?, w);
//     reconstruct unit normal from the octahedron, keep w.
//   quaternion: 4 x int16; low 2 bits of the LAST component select which
//     quat component was dropped; the rest are snorm in [-sqrt(0.5),
//     sqrt(0.5)] scaled by (max >> 2) with implicit positive max comp.
//   exponential: u32 per scalar = 8-bit exponent (two's complement,
//     top byte) | 24-bit two's-complement mantissa; value = m * 2^e.
// ---------------------------------------------------------------------------

void mcodec_decode_filter_oct(void* data, size_t count, size_t stride) {
  if (stride == 4) {
    int8_t* d = (int8_t*)data;
    for (size_t i = 0; i < count; ++i) {
      float x = d[i * 4 + 0] / 127.f;
      float y = d[i * 4 + 1] / 127.f;
      float z = 1.f - (x < 0 ? -x : x) - (y < 0 ? -y : y);
      float t = z < 0 ? -z : 0.f;
      x += x >= 0 ? -t : t;
      y += y >= 0 ? -t : t;
      float len = __builtin_sqrtf(x * x + y * y + z * z);
      if (len == 0) len = 1;
      float s = 127.f / len;
      int xi = int(x * s + (x >= 0 ? 0.5f : -0.5f));
      int yi = int(y * s + (y >= 0 ? 0.5f : -0.5f));
      int zi = int(z * s + (z >= 0 ? 0.5f : -0.5f));
      d[i * 4 + 0] = int8_t(xi);
      d[i * 4 + 1] = int8_t(yi);
      d[i * 4 + 2] = int8_t(zi);
    }
  } else if (stride == 8) {
    int16_t* d = (int16_t*)data;
    for (size_t i = 0; i < count; ++i) {
      float x = d[i * 4 + 0] / 32767.f;
      float y = d[i * 4 + 1] / 32767.f;
      float z = 1.f - (x < 0 ? -x : x) - (y < 0 ? -y : y);
      float t = z < 0 ? -z : 0.f;
      x += x >= 0 ? -t : t;
      y += y >= 0 ? -t : t;
      float len = __builtin_sqrtf(x * x + y * y + z * z);
      if (len == 0) len = 1;
      float s = 32767.f / len;
      d[i * 4 + 0] = int16_t(int(x * s + (x >= 0 ? 0.5f : -0.5f)));
      d[i * 4 + 1] = int16_t(int(y * s + (y >= 0 ? 0.5f : -0.5f)));
      d[i * 4 + 2] = int16_t(int(z * s + (z >= 0 ? 0.5f : -0.5f)));
    }
  }
}

void mcodec_decode_filter_quat(void* data, size_t count, size_t stride) {
  if (stride != 8) return;
  const float scale = 1.f / 1.41421356237f;   // sqrt(0.5) max magnitude
  int16_t* d = (int16_t*)data;
  for (size_t i = 0; i < count; ++i) {
    int16_t in[4];
    memcpy(in, d + i * 4, 8);
    int which = in[3] & 3;
    float q[4];
    float range = float((32767 >> 2) << 2);
    float a = in[0] / range * scale;
    float b = in[1] / range * scale;
    float c = in[2] / range * scale;
    float ww = 1.f - a * a - b * b - c * c;
    float w = ww > 0 ? __builtin_sqrtf(ww) : 0.f;
    // reinsert the dropped (max, positive) component at `which`
    float comp[4] = {a, b, c, w};
    for (int k = 0, j = 0; k < 4; ++k)
      q[k] = (k == which) ? w : comp[j++];
    // output snorm16 quaternion (x, y, z, w)
    for (int k = 0; k < 4; ++k) {
      float v = q[k] * 32767.f;
      d[i * 4 + k] = int16_t(int(v + (v >= 0 ? 0.5f : -0.5f)));
    }
  }
}

void mcodec_decode_filter_exp(void* data, size_t count, size_t stride) {
  size_t total = count * (stride / 4);
  uint32_t* d = (uint32_t*)data;
  for (size_t i = 0; i < total; ++i) {
    uint32_t v = d[i];
    int e = int(int32_t(v) >> 24);
    int32_t m = int32_t(v << 8) >> 8;
    float f = float(m) * __builtin_exp2f(float(e));
    memcpy(&d[i], &f, 4);
  }
}

}  // extern "C"
