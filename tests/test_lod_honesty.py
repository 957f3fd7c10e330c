"""LOD error honesty: vanishing disconnected components must report
world-scale errors.

Regression for the round-4 shredding bug: the quadric-cost-derived error
read as millimeters when whole bricks/slats collapsed to nothing, so the
screen-error LOD selector shredded mid-distance geometry (courtyard
coverage 0.565 vs 0.754 — a third of visible geometry missing).  The
error is now the max committed collapse displacement.
"""

import numpy as np
import pytest

from toyrenderer_tpu.scene import lod as LOD


def _cube(center, size):
    c = np.asarray(center, np.float32)
    h = size / 2.0
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32) + c
    f = np.array([
        0, 1, 3, 0, 3, 2, 4, 6, 7, 4, 7, 5,
        0, 4, 5, 0, 5, 1, 2, 3, 7, 2, 7, 6,
        0, 2, 6, 0, 6, 4, 1, 5, 7, 1, 7, 3], np.uint32)
    return v, f


def test_vanishing_components_report_their_size():
    if __import__('toyrenderer_tpu.native', fromlist=['x']).simplify_lib() \
            is None:
        pytest.skip("native toolchain unavailable")
    # 64 disconnected unit-ish cubes (the brick-arch pattern)
    size = 0.5
    verts, idx = [], []
    base = 0
    for i in range(64):
        v, f = _cube([i % 8 * 2.0, i // 8 * 2.0, 0.0], size)
        verts.append(v)
        idx.append(f + base)
        base += len(v)
    pos = np.concatenate(verts)
    indices = np.concatenate(idx)
    chain = LOD.build_lod_chain(pos, indices, 8)
    assert len(chain.indices) > 1, "no simplification happened"
    for li in range(1, len(chain.indices)):
        n_prev = len(chain.indices[li - 1]) // 3
        n_cur = len(chain.indices[li]) // 3
        assert n_cur < n_prev
        # any level that destroyed cube triangles must admit an error on
        # the scale of the cube (collapses span >= half the cube size)
        assert chain.errors[li] >= 0.45 * size, (
            f"LOD{li} reports error {chain.errors[li]:.4f} while "
            f"destroying {n_prev - n_cur} tris of {size}-sized cubes")


def test_flat_grid_simplifies_with_small_error():
    if __import__('toyrenderer_tpu.native', fromlist=['x']).simplify_lib() \
            is None:
        pytest.skip("native toolchain unavailable")
    # a flat 16x16 grid: collapses slide in-plane; error may be up to a
    # cell or two of displacement but must stay well under the grid size
    n = 17
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    quad = np.arange(n * n).reshape(n, n)
    tris = []
    for r in range(n - 1):
        for c in range(n - 1):
            a, b, d, e = quad[r, c], quad[r, c + 1], quad[r + 1, c], \
                quad[r + 1, c + 1]
            tris += [a, b, e, a, e, d]
    chain = LOD.build_lod_chain(pos, np.asarray(tris, np.uint32), 4)
    assert len(chain.indices) > 1
    assert chain.errors[1] <= float(n), "in-plane error should be bounded"
