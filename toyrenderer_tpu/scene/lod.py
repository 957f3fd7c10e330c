"""Automatic discrete LOD chain (host-side).

Counterpart of the reference's meshoptimizer LOD build
(source/Visual.cpp:329-492): up to 8 LODs, 65% index target per level,
stop when a level removes <15% of indices, per-level error accumulated as
max(prev * 1.5, level_error) for screen-space LOD selection
(gpuculling.hlsl:39-58).

Primary algorithm: normal-weighted quadric-error edge collapse in C++
(native/simplify.cpp, subset placement so indices keep referencing the
original vertex arrays).  Fallback when no toolchain is available:
uniform vertex-grid clustering (Rossignac-Borrel) with a cell size
doubling per level and the cell-derived displacement as the error bound.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_LODS = 8
# stop if a level removes fewer than this fraction of indices
# (same stopping rule as the reference, Visual.cpp:334-336)
MIN_REDUCTION = 0.15


@dataclass
class LodChain:
    indices: list[np.ndarray]   # per-LOD (Mi, ) u32 index buffers; [0] = full
    errors: list[float]         # per-LOD object-space error bound; [0] = 0


def simplify_grid(positions: np.ndarray, indices: np.ndarray,
                  cell_size: float) -> np.ndarray:
    """Collapse vertices into grid cells; returns a new index buffer that
    still references the ORIGINAL vertex arrays (one representative vertex
    per cell), with degenerate triangles removed."""
    if cell_size <= 0.0:
        return indices
    cells = np.floor(positions / cell_size).astype(np.int64)
    # hash cells to a 1D key
    key = (cells[:, 0] * 73856093) ^ (cells[:, 1] * 19349663) ^ (
        cells[:, 2] * 83492791)
    # representative: first vertex seen per key (stable)
    _, rep_first, inverse = np.unique(
        key, return_index=True, return_inverse=True)
    remap = rep_first[inverse]                    # vertex -> representative
    tri = remap[indices.reshape(-1, 3)]
    keep = ((tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2])
            & (tri[:, 0] != tri[:, 2]))
    return tri[keep].reshape(-1).astype(np.uint32)


TARGET_INDEX_FRACTION = 0.65       # Visual.cpp:335 kTargetIndexCount...
NORMAL_WEIGHT = 1.0                # kAttributeWeights parity


def simplify_qem(positions: np.ndarray, normals: np.ndarray | None,
                 indices: np.ndarray, target_idx: int):
    """Quadric edge-collapse to ~target_idx indices via the native lib.
    Returns (new_indices (referencing the original vertices), error) or
    None when the toolchain is unavailable."""
    from toyrenderer_tpu import native
    lib = native.simplify_lib()
    if lib is None:
        return None
    import ctypes
    idx = np.ascontiguousarray(indices, np.uint32)
    pos = np.ascontiguousarray(positions, np.float32)
    nrm = (np.ascontiguousarray(normals, np.float32)
           if normals is not None else None)
    out = np.empty_like(idx)
    err = np.zeros(1, np.float32)
    n = lib.simplify_qem(
        idx.ctypes.data, len(idx), pos.ctypes.data,
        nrm.ctypes.data if nrm is not None else None, len(pos),
        int(target_idx), ctypes.c_float(NORMAL_WEIGHT),
        out.ctypes.data, err.ctypes.data)
    return out[:n].copy(), float(err[0])


def build_lod_chain(positions: np.ndarray, indices: np.ndarray,
                    max_lods: int = MAX_LODS,
                    normals: np.ndarray | None = None) -> LodChain:
    indices = np.asarray(indices, np.uint32)
    chain = LodChain(indices=[indices], errors=[0.0])
    if len(indices) == 0:
        return chain

    # --- primary path: quadric simplification (reference policy) ---------
    from toyrenderer_tpu import native
    if native.simplify_lib() is not None:
        prev = indices
        lod_error = 0.0
        while len(chain.indices) < max_lods:
            target = (int(len(prev) * TARGET_INDEX_FRACTION) // 3) * 3
            res = simplify_qem(positions, normals, prev, target)
            if res is None:
                break
            cur, err = res
            if len(cur) == 0 or len(cur) >= len(prev) * (1 - MIN_REDUCTION):
                break
            # accumulate like the reference (Visual.cpp:487): each level
            # starts from the previous one, so errors compound
            lod_error = max(lod_error * 1.5, err)
            chain.indices.append(cur)
            chain.errors.append(lod_error)
            prev = cur
        return chain

    # --- fallback: grid clustering ----------------------------------------
    bmin, bmax = positions.min(0), positions.max(0)
    diag = float(np.linalg.norm(bmax - bmin))
    if diag <= 0.0:
        return chain
    cell = diag / 128.0
    prev = indices
    while len(chain.indices) < max_lods and cell < diag:
        cur = simplify_grid(positions, prev, cell)
        reduction = 1.0 - len(cur) / max(len(prev), 1)
        if reduction < MIN_REDUCTION or len(cur) == 0:
            # cell too small to merge anything yet — grow and retry
            cell *= 2.0
            continue
        chain.indices.append(cur)
        # reported error: expected vertex displacement (~cell/4), not the
        # worst-case cell diagonal — matches how meshoptimizer reports an
        # expectation, keeping screen-error LOD selection useful
        chain.errors.append(cell * 0.25)
        prev = cur
        cell *= 2.0
    return chain
