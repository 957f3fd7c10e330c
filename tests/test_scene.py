"""Scene pipeline tests: glTF parse, meshlets, LODs, scene build, cache."""

import numpy as np
import pytest

from toyrenderer_tpu.scene import gltf as G
from toyrenderer_tpu.scene import meshlet as ML
from toyrenderer_tpu.scene import lod as LOD
from toyrenderer_tpu.scene import scenebuild as SB

CORNELL = "resources/cornell.gltf"


def test_load_cornell():
    doc = G.load_gltf(CORNELL)
    assert len(doc.meshes) == 1
    assert len(doc.meshes[0].primitives) == 3
    names = [m.name for m in doc.materials]
    assert names == ["white", "red", "green"]
    assert len(doc.cameras) == 1
    assert doc.lights[0].kind == "directional"
    assert doc.lights[0].intensity == 683.0
    for prim in doc.meshes[0].primitives:
        assert prim.indices.size % 3 == 0
        assert prim.positions.shape[1] == 3
        n = np.linalg.norm(prim.normals, axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_meshlet_budgets():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    idx = rng.integers(0, 500, size=(3000,)).astype(np.uint32)
    ml = ML.build_meshlets(idx, pos)
    assert ml.count >= 1000 // ML.MESHLET_MAX_TRIS
    assert (ml.tri_count <= ML.MESHLET_MAX_TRIS).all()
    total = int(ml.tri_count.sum())
    assert total == 1000
    # vertex budget: each meshlet references <= 64 unique vertices
    for m in range(ml.count):
        t = ml.tri_vertex_indices[m, :ml.tri_count[m]]
        assert len(np.unique(t)) <= ML.MESHLET_MAX_VERTS
    # all real triangles preserved, in order
    rebuilt = np.concatenate([
        ml.tri_vertex_indices[m, :ml.tri_count[m]].reshape(-1)
        for m in range(ml.count)])
    np.testing.assert_array_equal(rebuilt, idx.astype(np.int32))


def test_meshlet_bounds_contain_vertices():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(200, 3)).astype(np.float32)
    idx = rng.integers(0, 200, size=(600,)).astype(np.uint32)
    ml = ML.build_meshlets(idx, pos)
    for m in range(ml.count):
        t = ml.tri_vertex_indices[m, :ml.tri_count[m]]
        pts = pos[np.unique(t)]
        d = np.linalg.norm(pts - ml.center[m], axis=-1)
        assert d.max() <= ml.radius[m] + 1e-4


def test_lod_chain_reduces():
    # dense curved grid (paraboloid): simplification must reduce triangle
    # count with growing error bounds.  (A flat plane is a degenerate
    # case: quadric edge collapse correctly reports ZERO surface
    # deviation there, so the error-growth assertion needs curvature.)
    n = 32
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    zs = 0.5 * (np.square(xs - 0.5) + np.square(ys - 0.5))
    pos = np.stack([xs, ys, zs], -1).reshape(-1, 3)
    pos = pos.astype(np.float32)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    idx = np.asarray(quads, np.uint32).reshape(-1)
    chain = LOD.build_lod_chain(pos, idx)
    assert len(chain.indices) > 2
    sizes = [len(i) for i in chain.indices]
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))
    assert chain.errors[0] == 0.0
    assert all(chain.errors[i + 1] >= chain.errors[i]
               for i in range(len(chain.errors) - 1))
    assert chain.errors[-1] > 0.0


def test_scene_build_invariants():
    scene = SB.load_scene(CORNELL, use_cache=False)
    assert scene.num_primitives == 3
    assert scene.num_instances == 3
    # per-primitive LOD0 meshlet ranges partition [0, num_meshlets)
    spans = []
    for p in range(scene.num_primitives):
        lods = int(scene.prim_lod_count[p])
        for l in range(lods):
            o = int(scene.prim_meshlet_offset[p, l])
            c = int(scene.prim_meshlet_count[p, l])
            spans.append((o, o + c))
            # owning-primitive backrefs
            assert (scene.meshlet_prim[o:o + c] == p).all()
    spans.sort()
    assert spans[0][0] == 0
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    assert spans[-1][1] == scene.num_meshlets
    # meshlet triangle indices reference real vertices
    assert scene.meshlet_tris.max() < scene.num_vertices


def test_scene_cache_roundtrip(tmp_path):
    import shutil
    dst = tmp_path / "cornell.gltf"
    shutil.copy(CORNELL, dst)
    shutil.copy("resources/cornell.bin", tmp_path / "cornell.bin")
    s1 = SB.load_scene(dst)
    s2 = SB.load_scene(dst)    # from cache
    assert SB._cache_path(dst).exists()
    np.testing.assert_array_equal(s1.meshlet_tris, s2.meshlet_tris)
    np.testing.assert_array_equal(s1.positions, s2.positions)
    assert s1.num_meshlets == s2.num_meshlets
    assert s1.node_depth == s2.node_depth
    np.testing.assert_allclose(s1.sun_direction, s2.sun_direction)
    # cache invalidation on source change
    with open(dst, "a") as f:
        f.write(" ")
    assert SB.load_scene_cache(dst) is None


def test_native_meshlet_builder_matches_python():
    """The C++ builder must be bit-identical to the Python reference."""
    from toyrenderer_tpu.native import meshlet_lib
    if meshlet_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    pos = rng.normal(size=(700, 3)).astype(np.float32)
    idx = rng.integers(0, 700, size=(9000,)).astype(np.uint32)
    a = ML.build_meshlets(idx, pos, use_native=False)
    b = ML.build_meshlets(idx, pos, use_native=True)
    assert a.count == b.count
    np.testing.assert_array_equal(a.tri_vertex_indices,
                                  b.tri_vertex_indices)
    np.testing.assert_array_equal(a.tri_count, b.tri_count)
    np.testing.assert_allclose(a.center, b.center, atol=1e-5)
    np.testing.assert_allclose(a.radius, b.radius, atol=1e-4)
    np.testing.assert_allclose(a.cone_axis, b.cone_axis, atol=1e-4)
    np.testing.assert_allclose(a.cone_cutoff, b.cone_cutoff, atol=1e-4)
