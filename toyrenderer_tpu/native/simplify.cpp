// Quadric-error-metric mesh simplification (host content pipeline).
//
// Counterpart of the reference's meshopt_simplifyWithAttributes usage
// (source/Visual.cpp:430-489: normal-weighted simplify to 65% of indices
// per LOD, stop below 15% reduction).  Written fresh for this project:
// classic Garland-Heckbert plane quadrics with
//   * subset placement (collapse onto an existing endpoint, so the output
//     index buffer still references the ORIGINAL vertex arrays — required
//     by the meshlet pipeline's global-vertex-id layout),
//   * area-weighted face quadrics + strong perpendicular boundary-edge
//     constraints (open edges keep their silhouette),
//   * a normal-deviation penalty standing in for meshopt's attribute
//     error (collapses across crease edges get expensive),
//   * triangle-flip rejection.
//
// Exposed via a C ABI for ctypes (see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <unordered_map>
#include <unordered_set>

namespace {

struct Quadric {
    // symmetric 4x4: a2 ab ac ad | b2 bc bd | c2 cd | d2
    double m[10] = {};
    double wsum = 0.0;          // total plane weight (error normalization)
    void add_plane(double a, double b, double c, double d, double w) {
        wsum += w;
        m[0] += w * a * a; m[1] += w * a * b; m[2] += w * a * c;
        m[3] += w * a * d; m[4] += w * b * b; m[5] += w * b * c;
        m[6] += w * b * d; m[7] += w * c * c; m[8] += w * c * d;
        m[9] += w * d * d;
    }
    void add(const Quadric& q) {
        for (int i = 0; i < 10; ++i) m[i] += q.m[i];
        wsum += q.wsum;
    }
    double eval(const float* p) const {
        double x = p[0], y = p[1], z = p[2];
        return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z
             + 2 * m[3] * x + m[4] * y * y + 2 * m[5] * y * z
             + 2 * m[6] * y + m[7] * z * z + 2 * m[8] * z + m[9];
    }
};

struct Candidate {
    double cost;
    uint32_t from, to;          // collapse from -> to (to survives)
    uint64_t stamp;             // sum of endpoint versions at push time
    bool operator<(const Candidate& o) const { return cost > o.cost; }
};

struct Vec3 {
    double x, y, z;
};

Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
double dot(const Vec3& a, const Vec3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
Vec3 sub(const float* a, const float* b) {
    return {double(a[0]) - b[0], double(a[1]) - b[1], double(a[2]) - b[2]};
}

}  // namespace

extern "C" int64_t simplify_qem(
    const uint32_t* indices, int64_t n_idx,
    const float* positions,     // (V, 3)
    const float* normals,       // (V, 3) or null
    int64_t n_verts,
    int64_t target_idx,
    float normal_weight,        // crease penalty scale (reference: 1.0)
    uint32_t* out_indices,      // capacity n_idx
    float* out_error) {         // object-space error (max displacement-ish)
    const int64_t n_tris = n_idx / 3;
    if (n_tris == 0 || target_idx >= n_idx) {
        std::memcpy(out_indices, indices, size_t(n_idx) * 4);
        if (out_error) *out_error = 0.f;
        return n_idx;
    }

    std::vector<uint32_t> tri(indices, indices + n_idx);
    std::vector<uint8_t> tri_dead(n_tris, 0);
    std::vector<Quadric> q(n_verts);
    std::vector<uint64_t> version(n_verts, 0);
    // union-find style remap (collapsed vertex -> survivor)
    std::vector<uint32_t> remap(n_verts);
    for (int64_t i = 0; i < n_verts; ++i) remap[i] = uint32_t(i);

    auto find = [&](uint32_t v) {
        while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
        return v;
    };

    // vertex -> incident triangle list (grows as collapses merge)
    std::vector<std::vector<int32_t>> vtris(n_verts);

    // --- face quadrics (area weighted) + adjacency --------------------------
    for (int64_t t = 0; t < n_tris; ++t) {
        uint32_t a = tri[t * 3], b = tri[t * 3 + 1], c = tri[t * 3 + 2];
        const float* pa = positions + size_t(a) * 3;
        const float* pb = positions + size_t(b) * 3;
        const float* pc = positions + size_t(c) * 3;
        Vec3 n = cross(sub(pb, pa), sub(pc, pa));
        double len = std::sqrt(dot(n, n));
        if (len < 1e-20) { tri_dead[t] = 1; continue; }
        double area = 0.5 * len;
        n = {n.x / len, n.y / len, n.z / len};
        double d = -(n.x * pa[0] + n.y * pa[1] + n.z * pa[2]);
        Quadric fq;
        fq.add_plane(n.x, n.y, n.z, d, area);
        q[a].add(fq); q[b].add(fq); q[c].add(fq);
        vtris[a].push_back(int32_t(t));
        vtris[b].push_back(int32_t(t));
        vtris[c].push_back(int32_t(t));
    }

    // --- boundary constraints: edges with exactly one incident face get a
    // perpendicular plane quadric with a large weight ------------------------
    {
        std::unordered_map<uint64_t, int32_t> edge_count;
        edge_count.reserve(size_t(n_idx));
        auto ekey = [](uint32_t a, uint32_t b) {
            if (a > b) std::swap(a, b);
            return (uint64_t(a) << 32) | b;
        };
        for (int64_t t = 0; t < n_tris; ++t) {
            if (tri_dead[t]) continue;
            for (int e = 0; e < 3; ++e) {
                edge_count[ekey(tri[t * 3 + e], tri[t * 3 + (e + 1) % 3])]++;
            }
        }
        for (int64_t t = 0; t < n_tris; ++t) {
            if (tri_dead[t]) continue;
            uint32_t v[3] = {tri[t * 3], tri[t * 3 + 1], tri[t * 3 + 2]};
            const float* p[3] = {positions + size_t(v[0]) * 3,
                                 positions + size_t(v[1]) * 3,
                                 positions + size_t(v[2]) * 3};
            Vec3 fn = cross(sub(p[1], p[0]), sub(p[2], p[0]));
            double fl = std::sqrt(dot(fn, fn));
            if (fl < 1e-20) continue;
            fn = {fn.x / fl, fn.y / fl, fn.z / fl};
            for (int e = 0; e < 3; ++e) {
                uint32_t a = v[e], b = v[(e + 1) % 3];
                if (edge_count[ekey(a, b)] != 1) continue;
                const float* pa = positions + size_t(a) * 3;
                const float* pb = positions + size_t(b) * 3;
                Vec3 ev = sub(pb, pa);
                Vec3 pn = cross(ev, fn);      // perpendicular to the edge
                double pl = std::sqrt(dot(pn, pn));
                if (pl < 1e-20) continue;
                pn = {pn.x / pl, pn.y / pl, pn.z / pl};
                double d = -(pn.x * pa[0] + pn.y * pa[1] + pn.z * pa[2]);
                Quadric bq;
                bq.add_plane(pn.x, pn.y, pn.z, d, dot(ev, ev) * 4.0);
                q[a].add(bq); q[b].add(bq);
            }
        }
    }

    // --- candidate queue ------------------------------------------------------
    std::priority_queue<Candidate> heap;
    auto normal_penalty = [&](uint32_t a, uint32_t b) -> double {
        if (!normals || normal_weight <= 0.f) return 0.0;
        const float* na = normals + size_t(a) * 3;
        const float* nb = normals + size_t(b) * 3;
        double d = double(na[0]) * nb[0] + double(na[1]) * nb[1]
                 + double(na[2]) * nb[2];
        Vec3 e = sub(positions + size_t(b) * 3, positions + size_t(a) * 3);
        return double(normal_weight) * (1.0 - d) * dot(e, e);
    };
    auto push_edge = [&](uint32_t a, uint32_t b) {
        a = find(a); b = find(b);
        if (a == b) return;
        double pen = normal_penalty(a, b);
        double ca = q[a].eval(positions + size_t(b) * 3) + pen;  // a -> b
        double cb = q[b].eval(positions + size_t(a) * 3) + pen;  // b -> a
        uint64_t stamp = version[a] + version[b];
        if (ca <= cb) heap.push({ca, a, b, stamp});
        else          heap.push({cb, b, a, stamp});
    };
    {
        std::unordered_set<uint64_t> seen;
        seen.reserve(size_t(n_idx));
        for (int64_t t = 0; t < n_tris; ++t) {
            if (tri_dead[t]) continue;
            for (int e = 0; e < 3; ++e) {
                uint32_t a = tri[t * 3 + e], b = tri[t * 3 + (e + 1) % 3];
                uint64_t k = a < b ? (uint64_t(a) << 32) | b
                                   : (uint64_t(b) << 32) | a;
                if (seen.insert(k).second) push_edge(a, b);
            }
        }
    }

    int64_t live_tris = 0;
    for (int64_t t = 0; t < n_tris; ++t) live_tris += !tri_dead[t];
    const int64_t target_tris = target_idx / 3;
    double max_cost = 0.0;
    double max_disp2 = 0.0;

    auto tri_verts = [&](int64_t t, uint32_t* v) {
        v[0] = find(tri[t * 3]); v[1] = find(tri[t * 3 + 1]);
        v[2] = find(tri[t * 3 + 2]);
    };

    while (live_tris > target_tris && !heap.empty()) {
        Candidate c = heap.top();
        heap.pop();
        uint32_t a = find(c.from), b = find(c.to);
        if (a == b || a != c.from || b != c.to) continue;      // stale
        if (c.stamp != version[a] + version[b]) continue;      // stale
        // flip rejection: triangles keeping `a` replaced by `b` must not
        // reverse orientation
        bool flip = false;
        for (int32_t t : vtris[a]) {
            if (tri_dead[t]) continue;
            uint32_t v[3];
            tri_verts(t, v);
            if (v[0] == b || v[1] == b || v[2] == b) continue; // will die
            const float* p0[3];
            const float* p1[3];
            for (int k = 0; k < 3; ++k) {
                p0[k] = positions + size_t(v[k]) * 3;
                p1[k] = positions + size_t(v[k] == a ? b : v[k]) * 3;
            }
            Vec3 n0 = cross(sub(p0[1], p0[0]), sub(p0[2], p0[0]));
            Vec3 n1 = cross(sub(p1[1], p1[0]), sub(p1[2], p1[0]));
            if (dot(n0, n1) <= 0.0) { flip = true; break; }
        }
        if (flip) continue;

        // commit: a -> b
        // (error normalization below uses the FROM quadric's weight —
        // the candidate cost was evaluated against q[a] alone)
        double err_w = q[a].wsum;
        remap[a] = b;
        version[b]++;
        q[b].add(q[a]);
        max_cost = std::max(max_cost, c.cost);
        // honest object-space error: the raw quadric cost is
        // AREA-weighted (sqrt(cost) ~ distance * sqrt(plane weight)) —
        // tiny disconnected components (bricks, slats) report
        // millimeter errors while whole pieces vanish, and the LOD
        // selector shreds mid-distance geometry.  Raw collapse
        // DISPLACEMENT |a-b| overshoots the other way (~50x): sliding a
        // vertex within a flat surface moves it far while changing the
        // image not at all, so LODs never engage.  The faithful metric
        // is the weight-NORMALIZED quadric cost: mean squared distance
        // of the moved vertex to the collapsed region's plane set — a
        // vanishing brick reports ~its thickness, an in-plane slide
        // reports ~the bump height.
        {
            // true geometric change is bounded by BOTH the mean-sq
            // distance to the collapsed region's plane set (cost/weight
            // — merged quadrics of curved regions overshoot at deep
            // LODs) and the raw displacement |a-b| (overshoots for
            // in-surface slides): take the min per collapse, the max
            // over the level.
            // c.cost folds the normal-similarity penalty in (it steers
            // the collapse ORDER, not geometry) — normalize the pure
            // quadric cost instead; q[a] is unchanged since push (stamp
            // check above) so re-evaluating is exact
            double pure = q[a].eval(positions + size_t(b) * 3);
            double d2 = err_w > 1e-20
                ? std::max(pure, 0.0) / err_w : 0.0;
            Vec3 ab = sub(positions + size_t(a) * 3,
                          positions + size_t(b) * 3);
            max_disp2 = std::max(max_disp2, std::min(d2, dot(ab, ab)));
        }

        // retire degenerate triangles, move the rest, re-push edges
        std::vector<int32_t>& ta = vtris[a];
        std::vector<int32_t>& tb = vtris[b];
        std::unordered_set<uint32_t> ring;
        for (int32_t t : ta) {
            if (tri_dead[t]) continue;
            uint32_t v[3];
            tri_verts(t, v);
            if (v[0] == v[1] || v[1] == v[2] || v[0] == v[2]) {
                tri_dead[t] = 1;
                --live_tris;
            } else {
                tb.push_back(t);
                for (int k = 0; k < 3; ++k)
                    if (v[k] != b) ring.insert(v[k]);
            }
        }
        ta.clear();
        ta.shrink_to_fit();
        for (uint32_t r : ring) push_edge(b, r);
    }

    // emit surviving triangles with remapped ORIGINAL vertex ids
    int64_t out = 0;
    for (int64_t t = 0; t < n_tris; ++t) {
        if (tri_dead[t]) continue;
        uint32_t v0 = find(tri[t * 3]), v1 = find(tri[t * 3 + 1]),
                 v2 = find(tri[t * 3 + 2]);
        if (v0 == v1 || v1 == v2 || v0 == v2) continue;
        out_indices[out++] = v0;
        out_indices[out++] = v1;
        out_indices[out++] = v2;
    }
    (void)max_cost;
    if (out_error) *out_error = float(std::sqrt(max_disp2));
    return out;
}
