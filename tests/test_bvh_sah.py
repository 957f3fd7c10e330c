"""Adaptive SAH BVH tests: builder validity, refit, Pallas traversal.

Reference parity: the one-time BLAS build of Visual.cpp:509-542 and the
per-frame TLAS update of Scene.cpp:411-466 — topology frozen at load,
AABBs refit from instance transforms each frame.
"""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import bvh as B
from toyrenderer_tpu.ops import bvh_sah as S


def _soup(t=3000, seed=5):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-15, 15, (t, 3)).astype(np.float32)
    v0 = c
    v1 = c + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    v2 = c + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    valid = np.ones(t, bool)
    valid[::13] = False
    return v0, v1, v2, valid


def _rts_from_tris(v0, v1, v2, valid, builder):
    """RtStaticSah over raw world tris with one identity instance."""
    tlo = np.minimum(np.minimum(v0, v1), v2)[valid]
    thi = np.maximum(np.maximum(v0, v1), v2)[valid]
    child, axis, leaf, _md = builder(tlo, thi, B.LEAF_TRIS, 16)
    ids = np.nonzero(valid)[0]
    flat = leaf.reshape(-1)
    ok = flat >= 0
    src = ids[np.where(ok, flat, 0)]
    obj = np.stack([v0, v1, v2], 1)
    obj_s = np.where(ok[:, None, None], obj[src], 0.0).astype(np.float32)
    pay = np.where(ok, src, -1).astype(np.int32)
    pr = child.shape[0]
    depth = np.zeros(pr, np.int32)
    for i in range(pr):
        for k in range(8):
            c = child[i, k]
            if c >= 0:
                depth[c] = depth[i] + 1
    ranges = []
    for d in range(int(depth.max()) + 1):
        idx = np.nonzero(depth == d)[0]
        ranges.append((int(idx[0]), int(len(idx))))
    return S.RtStaticSah(
        obj_v0=jnp.asarray(obj_s[:, 0]),
        obj_e1=jnp.asarray(obj_s[:, 1] - obj_s[:, 0]),
        obj_e2=jnp.asarray(obj_s[:, 2] - obj_s[:, 0]),
        tri_inst=jnp.zeros(len(pay), jnp.int32),
        payload=jnp.asarray(pay),
        child_ref=jnp.asarray(child), node_axis=jnp.asarray(axis),
        depth_ranges=tuple(ranges))


def test_builders_agree_and_partition():
    """Native and numpy builders produce valid trees: every valid tri in
    exactly one leaf slot; depth-grouped node order; children refs in
    range.  (Identical splits are not required, but both must be valid.)"""
    v0, v1, v2, valid = _soup()
    tlo = np.minimum(np.minimum(v0, v1), v2)[valid]
    thi = np.maximum(np.maximum(v0, v1), v2)[valid]
    builders = [('numpy', S._build_sah8_np)]
    if S._build_sah8_native(tlo[:32], thi[:32], 12, 16) is not None:
        builders.append(('native', S._build_sah8_native))
    assert len(builders) == 2, "native SAH builder failed to build"
    for name, b in builders:
        child, axis, leaf, md = b(tlo, thi, B.LEAF_TRIS, 16)
        flat = leaf.reshape(-1)
        flat = flat[flat >= 0]
        assert len(flat) == int(valid.sum()), name
        assert len(np.unique(flat)) == len(flat), name
        pr = child.shape[0]
        ok = (child == -2147483648) | (
            (child >= 0) & (child < pr)) | (
            (child < 0) & (-(child + 1) < leaf.shape[0]))
        assert ok.all(), name
        # each internal node id (except root) referenced exactly once
        refs = child[(child >= 0)]
        assert len(refs) == pr - 1 and len(np.unique(refs)) == pr - 1, name
        assert (axis >= 0).all() and (axis <= 2).all(), name


def test_sah_traversal_matches_lockstep():
    """Pallas explicit-refs traversal (interpret) over the SAH tree must
    match the XLA lockstep traversal of the complete tree: same hits,
    same winning triangle, t within tolerance; any-hit and the gdir
    variant agree; refit containment holds under instance motion."""
    from toyrenderer_tpu.ops.bvh_pallas import (
        GDIR_GROUP, traverse_pallas, traverse_pallas_gdir)

    v0, v1, v2, valid = _soup()
    rts = _rts_from_tris(v0, v1, v2, valid, S._build_sah8_np)
    sah = S.refit_sah(rts, jnp.eye(4)[None])
    assert sah.node_rows.shape[1] == 64
    assert sah.leaf_rows.shape[1] == 120

    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    rng = np.random.default_rng(8)
    n = 1400
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = B.traverse(bvh, jnp.asarray(o), jnp.asarray(d), t_max=150.0,
                     max_steps=8192)
    rh = np.asarray(ref['hit'])

    got = traverse_pallas(sah, jnp.asarray(o), jnp.asarray(d),
                          t_max=150.0, interpret=True)
    assert np.array_equal(np.asarray(got['hit']), rh)
    m = rh
    np.testing.assert_allclose(np.asarray(got['t'])[m],
                               np.asarray(ref['t'])[m], rtol=1e-4,
                               atol=1e-5)
    assert np.array_equal(np.asarray(got['tri'])[m],
                          np.asarray(ref['tri'])[m])
    ga = traverse_pallas(sah, jnp.asarray(o), jnp.asarray(d),
                         t_max=150.0, any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(ga['hit']), rh)

    # grouped-direction variant over the SAH tree
    ng = 2048 // GDIR_GROUP
    gd = rng.normal(size=(ng, 3)).astype(np.float32)
    gd /= np.linalg.norm(gd, axis=1, keepdims=True)
    og = rng.uniform(-20, 20, (2048, 3)).astype(np.float32)
    dg = np.repeat(gd, GDIR_GROUP, axis=0)
    refg = B.traverse(bvh, jnp.asarray(og), jnp.asarray(dg), t_max=150.0,
                      max_steps=8192)
    gotg = traverse_pallas_gdir(sah, jnp.asarray(og), jnp.asarray(gd),
                                t_max=150.0, packet=1024, interpret=True)
    assert np.array_equal(np.asarray(gotg['hit']),
                          np.asarray(refg['hit']))
    # big-scene mode: HBM leaf rows through the 1-slot DMA pipeline
    goth = traverse_pallas_gdir(sah, jnp.asarray(og), jnp.asarray(gd),
                                t_max=150.0, packet=1024, interpret=True,
                                leaf_hbm=True)
    assert np.array_equal(np.asarray(goth['hit']),
                          np.asarray(refg['hit']))
    assert np.array_equal(np.asarray(goth['tri']),
                          np.asarray(gotg['tri']))


def test_sah_refit_rigid_motion_matches_rebuild():
    """Refit under a rigid transform == fresh morton rebuild of the moved
    triangles (result-level: same hits / winners)."""
    from toyrenderer_tpu.ops.bvh_pallas import traverse_pallas

    v0, v1, v2, valid = _soup(t=1200, seed=9)
    rts = _rts_from_tris(v0, v1, v2, valid, S._build_sah8_np)

    # rigid motion: rotate about y + translate
    ang = 0.4
    c, s = np.cos(ang), np.sin(ang)
    m = np.asarray([[c, 0, s, 0.5], [0, 1, 0, -0.25],
                    [-s, 0, c, 1.0], [0, 0, 0, 1]], np.float32)
    sah = S.refit_sah(rts, jnp.asarray(m)[None])

    def tf(v):
        return v @ m[:3, :3].T + m[:3, 3]
    bvh = B.build_bvh(jnp.asarray(tf(v0)), jnp.asarray(tf(v1)),
                      jnp.asarray(tf(v2)), jnp.asarray(valid))

    rng = np.random.default_rng(10)
    n = 800
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = B.traverse(bvh, jnp.asarray(o), jnp.asarray(d), t_max=150.0,
                     max_steps=8192)
    got = traverse_pallas(sah, jnp.asarray(o), jnp.asarray(d),
                          t_max=150.0, interpret=True)
    rh = np.asarray(ref['hit'])
    assert np.array_equal(np.asarray(got['hit']), rh)
    np.testing.assert_allclose(np.asarray(got['t'])[rh],
                               np.asarray(ref['t'])[rh], rtol=1e-4,
                               atol=1e-4)


def test_build_rt_static_auto_selects_by_backend(monkeypatch):
    """On the CPU backend the auto selector must return the complete
    tree even when SAH is requested (its traversal is Pallas-only)."""
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = load_scene("resources/cornell.gltf", use_cache=False)
    pi, pm = static_meshlet_pairs(s)
    monkeypatch.setenv('TR_RT_SAH', '1')
    rts = S.build_rt_static_auto(s, pi, pm)
    assert not hasattr(rts, 'depth_ranges')     # CPU -> complete tree

    # the explicit SAH build works on any backend (build is host-side)
    rts2 = S.build_rt_static_sah(s, pi, pm)
    pay = np.asarray(rts2.payload)
    assert (pay >= 0).sum() == (np.asarray(rts.payload) >= 0).sum()
    sah = S.refit_sah(rts2, *_identity_like(s))
    assert np.isfinite(np.asarray(sah.node_rows)[:, :48]).all()


def _identity_like(s):
    """Rest-pose instance matrices for refit."""
    from toyrenderer_tpu.scene.scenebuild import _world_matrices_host
    nw = _world_matrices_host(s.node_parent, s.node_translation,
                              s.node_rotation, s.node_scale)
    return (jnp.asarray(nw[np.asarray(s.inst_node)]),)
