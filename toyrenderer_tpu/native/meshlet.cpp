// Native meshlet builder — the hot host-side content-pipeline loop.
//
// C++ counterpart of scene/meshlet.py (same greedy algorithm, bit-identical
// output), mirroring the reference's use of native meshoptimizer for this
// stage (source/Visual.cpp:302-507): Python-loop meshletization of a
// 250k-triangle scene takes tens of seconds; this runs in milliseconds.
//
// Budgets: 64 vertices / 96 triangles per meshlet (ShaderInterop.h:19-21).
// Exposed as a C ABI for ctypes; built by native/build.py with g++.

#include <cstdint>
#include <cmath>
#include <cstring>

namespace {

constexpr int kMaxVerts = 64;
constexpr int kMaxTris = 96;

struct VertSet {
    int32_t ids[kMaxVerts];
    int count = 0;
    bool contains(int32_t v) const {
        for (int i = 0; i < count; ++i)
            if (ids[i] == v) return true;
        return false;
    }
    void add(int32_t v) { ids[count++] = v; }
    void clear() { count = 0; }
};

}  // namespace

extern "C" {

// Returns the number of meshlets written.
// out_tris:      capacity meshlets * 96 * 3 (int32), padded with tri 0
// out_tri_count: capacity meshlets (int32)
// out_center/out_radius/out_axis/out_cutoff: bounds per meshlet
int64_t build_meshlets(
    const int32_t* indices, int64_t n_tris,
    const float* positions, int64_t n_verts,
    int32_t* out_tris, int32_t* out_tri_count,
    float* out_center, float* out_radius,
    float* out_axis, float* out_cutoff,
    int64_t max_meshlets) {
    (void)n_verts;
    int64_t n_meshlets = 0;
    int64_t cur_start = 0;   // first triangle of the current meshlet
    int64_t cur_count = 0;
    VertSet verts;

    auto flush = [&]() {
        if (cur_count == 0 || n_meshlets >= max_meshlets) return;
        int32_t* mt = out_tris + n_meshlets * kMaxTris * 3;
        const int32_t* first = indices + cur_start * 3;
        for (int64_t t = 0; t < kMaxTris; ++t) {
            const int32_t* src = (t < cur_count) ? indices + (cur_start + t) * 3
                                                 : first;  // degenerate pad
            mt[t * 3 + 0] = (t < cur_count) ? src[0] : first[0] * 0;
            mt[t * 3 + 1] = (t < cur_count) ? src[1] : first[1] * 0;
            mt[t * 3 + 2] = (t < cur_count) ? src[2] : first[2] * 0;
        }
        out_tri_count[n_meshlets] = static_cast<int32_t>(cur_count);

        // bounding sphere over the unique vertices (bbox center, max dist)
        float mn[3] = {1e30f, 1e30f, 1e30f};
        float mx[3] = {-1e30f, -1e30f, -1e30f};
        for (int i = 0; i < verts.count; ++i) {
            const float* p = positions + verts.ids[i] * 3;
            for (int k = 0; k < 3; ++k) {
                mn[k] = p[k] < mn[k] ? p[k] : mn[k];
                mx[k] = p[k] > mx[k] ? p[k] : mx[k];
            }
        }
        float c[3] = {0.5f * (mn[0] + mx[0]), 0.5f * (mn[1] + mx[1]),
                      0.5f * (mn[2] + mx[2])};
        float r2 = 0.f;
        for (int i = 0; i < verts.count; ++i) {
            const float* p = positions + verts.ids[i] * 3;
            float d = 0.f;
            for (int k = 0; k < 3; ++k)
                d += (p[k] - c[k]) * (p[k] - c[k]);
            r2 = d > r2 ? d : r2;
        }
        std::memcpy(out_center + n_meshlets * 3, c, sizeof(c));
        out_radius[n_meshlets] = std::sqrt(r2);

        // cone over face normals (matches meshlet.py flush())
        double axis[3] = {0, 0, 0};
        for (int64_t t = 0; t < cur_count; ++t) {
            const int32_t* tri = indices + (cur_start + t) * 3;
            const float* a = positions + tri[0] * 3;
            const float* b = positions + tri[1] * 3;
            const float* d = positions + tri[2] * 3;
            float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
            float e2[3] = {d[0] - a[0], d[1] - a[1], d[2] - a[2]};
            float fn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                           e1[2] * e2[0] - e1[0] * e2[2],
                           e1[0] * e2[1] - e1[1] * e2[0]};
            float len = std::sqrt(fn[0] * fn[0] + fn[1] * fn[1]
                                  + fn[2] * fn[2]);
            float inv = len > 1e-20f ? 1.f / len : 0.f;
            for (int k = 0; k < 3; ++k) axis[k] += fn[k] * inv;
        }
        double al = std::sqrt(axis[0] * axis[0] + axis[1] * axis[1]
                              + axis[2] * axis[2]);
        float* oa = out_axis + n_meshlets * 3;
        if (al < 1e-8) {
            oa[0] = oa[1] = oa[2] = 0.f;
            out_cutoff[n_meshlets] = 1.f;
        } else {
            for (int k = 0; k < 3; ++k)
                oa[k] = static_cast<float>(axis[k] / al);
            float min_dot = 1.f;
            for (int64_t t = 0; t < cur_count; ++t) {
                const int32_t* tri = indices + (cur_start + t) * 3;
                const float* a = positions + tri[0] * 3;
                const float* b = positions + tri[1] * 3;
                const float* d = positions + tri[2] * 3;
                float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                float e2[3] = {d[0] - a[0], d[1] - a[1], d[2] - a[2]};
                float fn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                               e1[2] * e2[0] - e1[0] * e2[2],
                               e1[0] * e2[1] - e1[1] * e2[0]};
                float len = std::sqrt(fn[0] * fn[0] + fn[1] * fn[1]
                                      + fn[2] * fn[2]);
                if (len <= 1e-20f) continue;
                float dot = (fn[0] * oa[0] + fn[1] * oa[1]
                             + fn[2] * oa[2]) / len;
                min_dot = dot < min_dot ? dot : min_dot;
            }
            out_cutoff[n_meshlets] =
                min_dot <= 0.f ? 1.f
                               : std::sqrt(1.f - min_dot * min_dot);
        }
        ++n_meshlets;
        cur_start += cur_count;
        cur_count = 0;
        verts.clear();
    };

    for (int64_t t = 0; t < n_tris; ++t) {
        const int32_t* tri = indices + t * 3;
        int32_t fresh[3];
        int n_fresh = 0;
        for (int k = 0; k < 3; ++k) {
            bool dup = verts.contains(tri[k]);
            for (int j = 0; j < n_fresh && !dup; ++j)
                if (fresh[j] == tri[k]) dup = true;
            if (!dup) fresh[n_fresh++] = tri[k];
        }
        if (cur_count >= kMaxTris
            || verts.count + n_fresh > kMaxVerts) {
            flush();
            n_fresh = 0;
            for (int k = 0; k < 3; ++k) {
                bool dup = false;
                for (int j = 0; j < n_fresh; ++j)
                    if (fresh[j] == tri[k]) dup = true;
                if (!dup) fresh[n_fresh++] = tri[k];
            }
        }
        for (int j = 0; j < n_fresh; ++j) verts.add(fresh[j]);
        ++cur_count;
    }
    flush();
    return n_meshlets;
}

}  // extern "C"
