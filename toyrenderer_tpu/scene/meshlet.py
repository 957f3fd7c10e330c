"""Meshlet decomposition (host-side, numpy).

Capability counterpart of the reference's meshoptimizer-based meshlet build
(source/Visual.cpp:302-507; budgets from source/shaders/ShaderInterop.h:19-21:
max 64 vertices / 96 triangles per meshlet, cone culling enabled).

TPU-first design difference: meshlets are emitted as FIXED-SHAPE dense arrays
— (M, MAX_TRIS, 3) global vertex indices plus per-meshlet bounds — so the
whole geometry stage is a dense gather, with padding triangles degenerate
(all-zero index, zero area) rather than variable-length lists.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MESHLET_MAX_VERTS = 64
MESHLET_MAX_TRIS = 96


@dataclass
class Meshlets:
    """Fixed-shape meshlet arrays for one primitive (local vertex space)."""
    tri_vertex_indices: np.ndarray   # (M, MAX_TRIS, 3) i32, into the
    #                                  primitive's vertex arrays; padded
    #                                  triangles repeat index 0 (degenerate)
    tri_count: np.ndarray            # (M,) i32
    center: np.ndarray               # (M, 3) f32 bounding-sphere center
    radius: np.ndarray               # (M,) f32
    cone_axis: np.ndarray            # (M, 3) f32
    cone_cutoff: np.ndarray          # (M,) f32; >= 1 means "cannot cull"

    @property
    def count(self) -> int:
        return self.tri_vertex_indices.shape[0]


def build_meshlets(indices: np.ndarray, positions: np.ndarray,
                   use_native: bool = True) -> Meshlets:
    """Greedy scan-order meshletization under the 64v/96t budget.

    meshoptimizer's spatial clustering is an optimization, not a semantic —
    greedy order preserves the index-locality most exporters already have.
    Dispatches to the C++ builder (native/meshlet.cpp, bit-identical
    output) when the toolchain is available; Python fallback below.
    """
    if use_native:
        out = _build_meshlets_native(indices, positions)
        if out is not None:
            return out
    tris = np.asarray(indices, np.int64).reshape(-1, 3)
    n_tris = len(tris)

    meshlet_tris: list[np.ndarray] = []
    bounds_center: list[np.ndarray] = []
    bounds_radius: list[float] = []
    cone_axes: list[np.ndarray] = []
    cone_cutoffs: list[float] = []
    tri_counts: list[int] = []

    cur_tris: list[np.ndarray] = []
    cur_verts: set[int] = set()

    def flush():
        if not cur_tris:
            return
        t = np.stack(cur_tris, axis=0)
        count = len(cur_tris)
        pad = MESHLET_MAX_TRIS - count
        if pad:
            t = np.concatenate(
                [t, np.broadcast_to(t[:1] * 0, (pad, 3))], axis=0)
        meshlet_tris.append(t.astype(np.int32))
        tri_counts.append(count)

        used = np.unique(np.stack(cur_tris))
        pts = positions[used]
        c = 0.5 * (pts.min(0) + pts.max(0))
        r = float(np.linalg.norm(pts - c, axis=-1).max())
        bounds_center.append(c.astype(np.float32))
        bounds_radius.append(r)

        # cone bounds over face normals (meshopt-style apex-free cone)
        real = np.stack(cur_tris)
        e1 = positions[real[:, 1]] - positions[real[:, 0]]
        e2 = positions[real[:, 2]] - positions[real[:, 0]]
        fn = np.cross(e1, e2)
        ln = np.linalg.norm(fn, axis=-1, keepdims=True)
        fn = fn / np.maximum(ln, 1e-20)
        axis = fn.sum(0)
        al = np.linalg.norm(axis)
        if al < 1e-8:
            cone_axes.append(np.zeros(3, np.float32))
            cone_cutoffs.append(1.0)       # degenerate: never cull
        else:
            axis = axis / al
            min_dot = float((fn @ axis).min())
            if min_dot <= 0.0:
                cone_axes.append(axis.astype(np.float32))
                cone_cutoffs.append(1.0)   # >90deg spread: never cull
            else:
                cone_axes.append(axis.astype(np.float32))
                cone_cutoffs.append(float(np.sqrt(1.0 - min_dot * min_dot)))
        cur_tris.clear()
        cur_verts.clear()

    for i in range(n_tris):
        tri = tris[i]
        new_verts = {int(v) for v in tri if int(v) not in cur_verts}
        if (len(cur_tris) >= MESHLET_MAX_TRIS
                or len(cur_verts) + len(new_verts) > MESHLET_MAX_VERTS):
            flush()
            new_verts = {int(v) for v in tri}
        cur_tris.append(tri)
        cur_verts.update(new_verts)
    flush()

    if not meshlet_tris:
        return Meshlets(
            tri_vertex_indices=np.zeros((0, MESHLET_MAX_TRIS, 3), np.int32),
            tri_count=np.zeros((0,), np.int32),
            center=np.zeros((0, 3), np.float32),
            radius=np.zeros((0,), np.float32),
            cone_axis=np.zeros((0, 3), np.float32),
            cone_cutoff=np.ones((0,), np.float32))

    return Meshlets(
        tri_vertex_indices=np.stack(meshlet_tris, axis=0),
        tri_count=np.asarray(tri_counts, np.int32),
        center=np.stack(bounds_center, axis=0),
        radius=np.asarray(bounds_radius, np.float32),
        cone_axis=np.stack(cone_axes, axis=0),
        cone_cutoff=np.asarray(cone_cutoffs, np.float32))


def _build_meshlets_native(indices, positions) -> Meshlets | None:
    from toyrenderer_tpu.native import meshlet_lib
    lib = meshlet_lib()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, np.int32).reshape(-1)
    pos = np.ascontiguousarray(positions, np.float32)
    n_tris = len(idx) // 3
    if n_tris == 0:
        return build_meshlets(indices, positions, use_native=False)
    # min 21 tris per flushed meshlet (64 verts / 3 new per tri) + final
    cap = n_tris // (MESHLET_MAX_VERTS // 3 - 1) + 2
    out_tris = np.zeros((cap, MESHLET_MAX_TRIS, 3), np.int32)
    out_tc = np.zeros((cap,), np.int32)
    out_c = np.zeros((cap, 3), np.float32)
    out_r = np.zeros((cap,), np.float32)
    out_a = np.zeros((cap, 3), np.float32)
    out_cut = np.zeros((cap,), np.float32)
    import ctypes
    n = lib.build_meshlets(
        idx.ctypes.data, n_tris, pos.ctypes.data, len(pos),
        out_tris.ctypes.data, out_tc.ctypes.data,
        out_c.ctypes.data, out_r.ctypes.data,
        out_a.ctypes.data, out_cut.ctypes.data, cap)
    n = int(n)
    return Meshlets(
        tri_vertex_indices=out_tris[:n], tri_count=out_tc[:n],
        center=out_c[:n], radius=out_r[:n],
        cone_axis=out_a[:n], cone_cutoff=out_cut[:n])
