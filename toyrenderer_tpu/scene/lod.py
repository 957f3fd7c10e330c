"""Automatic discrete LOD chain (host-side, numpy).

Capability counterpart of the reference's meshoptimizer LOD build
(source/Visual.cpp:329-492: up to 8 LODs, stop when a level removes <15% of
indices, per-level error accumulated for screen-space LOD selection).

Round-1 algorithm: uniform vertex-grid clustering (Rossignac-Borrel) with a
cell size doubling per level.  The LOD *error* reported per level is the
clustering cell diagonal — an upper bound on vertex displacement — consumed
by the culling kernel's screen-error LOD selection
(reference: gpuculling.hlsl:39-58).  Quadric-error simplification can later
replace the clustering without changing this interface.
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


def build_lod_chain(positions: np.ndarray, indices: np.ndarray,
                    max_lods: int = MAX_LODS) -> LodChain:
    indices = np.asarray(indices, np.uint32)
    chain = LodChain(indices=[indices], errors=[0.0])
    if len(indices) == 0:
        return chain
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
