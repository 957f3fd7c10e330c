"""BVH build + traversal tests vs brute-force ray casting oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.ops import bvh as B


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, size=(n, 1, 3))
    offs = rng.uniform(-0.8, 0.8, size=(n, 3, 3))
    tris = (c + offs).astype(np.float32)
    return tris[:, 0], tris[:, 1], tris[:, 2]


def _brute_force(v0, v1, v2, valid, origins, dirs, t_max):
    """Numpy closest-hit oracle."""
    n_rays = origins.shape[0]
    best_t = np.full(n_rays, t_max, np.float32)
    best_tri = np.full(n_rays, -1, np.int64)
    e1 = v1 - v0
    e2 = v2 - v0
    for r in range(n_rays):
        o, d = origins[r], dirs[r]
        pvec = np.cross(d[None], e2)
        det = np.sum(e1 * pvec, -1)
        ok = np.abs(det) > 1e-7
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
        tvec = o[None] - v0
        u = np.sum(tvec * pvec, -1) * inv
        qvec = np.cross(tvec, e1)
        v = np.sum(d[None] * qvec, -1) * inv
        t = np.sum(e2 * qvec, -1) * inv
        hit = ok & valid & (u >= 0) & (v >= 0) & (u + v <= 1) & \
            (t > 1e-7) & (t < best_t[r])
        if hit.any():
            k = np.argmin(np.where(hit, t, np.inf))
            best_t[r] = t[k]
            best_tri[r] = k
    return best_t, best_tri


def test_traverse_matches_bruteforce():
    v0, v1, v2 = _random_tris(300, seed=1)
    valid = np.ones(300, bool)
    rng = np.random.default_rng(2)
    n_rays = 64
    origins = rng.uniform(-12, 12, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    res = B.traverse(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                     t_max=100.0, max_steps=4096)
    t_want, tri_want = _brute_force(v0, v1, v2, valid, origins, dirs, 100.0)
    hit_got = np.asarray(res['hit'])
    hit_want = tri_want >= 0
    np.testing.assert_array_equal(hit_got, hit_want)
    np.testing.assert_allclose(np.asarray(res['t'])[hit_want],
                               t_want[hit_want], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(res['tri'])[hit_want],
                                  tri_want[hit_want])


def test_any_hit_shadow_semantics():
    # a single large occluder between origin and light
    v0 = jnp.asarray([[-10.0, 5.0, -10.0]])
    v1 = jnp.asarray([[10.0, 5.0, -10.0]])
    v2 = jnp.asarray([[0.0, 5.0, 20.0]])
    bvh = B.build_bvh(v0, v1, v2, jnp.asarray([True]))
    origins = jnp.asarray([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    res = B.traverse(bvh, origins, dirs, t_max=50.0, max_steps=64,
                     any_hit=True)
    assert np.asarray(res['hit']).tolist() == [True, False]


def test_tmax_respected():
    v0 = jnp.asarray([[-1.0, 3.0, -1.0]])
    v1 = jnp.asarray([[1.0, 3.0, -1.0]])
    v2 = jnp.asarray([[0.0, 3.0, 2.0]])
    bvh = B.build_bvh(v0, v1, v2, jnp.asarray([True]))
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    hit_far = B.traverse(bvh, o, d, t_max=10.0, max_steps=64)
    hit_near = B.traverse(bvh, o, d, t_max=2.0, max_steps=64)
    assert bool(hit_far['hit'][0])
    assert not bool(hit_near['hit'][0])


def test_invalid_tris_ignored():
    v0, v1, v2 = _random_tris(64, seed=3)
    valid = np.zeros(64, bool)   # everything padding
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (4, 1))
    res = B.traverse(bvh, o, d, t_max=100.0, max_steps=256)
    assert not np.asarray(res['hit']).any()


def test_morton_locality():
    codes = np.asarray(B.morton3d(jnp.asarray([
        [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 0.0, 1.0],
    ])))
    assert codes[0] == 0
    assert codes[1] == (1 << 30) - 1
    assert codes[0] < codes[2] < codes[1]


def test_world_triangles_expansion():
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops import geometry as G
    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    world = G.node_world_matrices(d, d.node_translation, d.node_rotation,
                                  d.node_scale)
    iw, _ = G.instance_transforms(d, world)
    pi, pm = G.static_meshlet_pairs(s)
    v0, v1, v2, valid = B.world_triangles(d, iw, jnp.asarray(pi),
                                          jnp.asarray(pm))
    n_real = int(np.asarray(valid).sum())
    want = 0
    for p in range(s.num_primitives):   # LOD0 meshlets only
        o = int(s.prim_meshlet_offset[p, 0])
        c = int(s.prim_meshlet_count[p, 0])
        want += int(s.meshlet_tri_count[o:o + c].sum())
    assert n_real == want
    # triangles land inside the rotated cornell bounds
    pts = np.asarray(v0)[np.asarray(valid)]
    assert pts.min() > -2.5 and pts.max() < 2.5


def _cornell_device_pairs():
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops import geometry as G
    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = G.static_meshlet_pairs(s)
    return s, d, jnp.asarray(pi), jnp.asarray(pm)


def test_refit_matches_rebuild_rigid_motion():
    """BLAS-cache parity (Visual.cpp:509-542 / Scene.cpp:411-466): the
    static-topology refit under rigid instance motion must produce the
    same traversal results as a from-scratch rebuild."""
    from toyrenderer_tpu.ops import geometry as G
    from toyrenderer_tpu.mathlib.transforms import compose_trs

    s, d, pi, pm = _cornell_device_pairs()
    rts = B.build_rt_static(s, pi, pm)

    # animate: rotate + translate every node (rigid motion)
    rng = np.random.default_rng(7)
    n = s.node_translation.shape[0]
    tr = s.node_translation + rng.uniform(-0.4, 0.4, (n, 3)).astype(
        np.float32)
    ang = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    rot = np.stack([np.zeros(n), np.sin(ang / 2), np.zeros(n),
                    np.cos(ang / 2)], axis=1).astype(np.float32)
    world = G.node_world_matrices(d, jnp.asarray(tr), jnp.asarray(rot),
                                  jnp.asarray(s.node_scale))
    iw, _ = G.instance_transforms(d, world)

    bvh_refit = B.refit_bvh(rts, iw)
    v0, v1, v2, valid = B.world_triangles(d, iw, pi, pm)
    bvh_fresh = B.build_bvh(v0, v1, v2, valid)

    rng2 = np.random.default_rng(8)
    n_rays = 96
    o = rng2.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    dirs = rng2.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    ra = B.traverse(bvh_refit, jnp.asarray(o), jnp.asarray(dirs),
                    t_max=50.0, max_steps=8192)
    rb = B.traverse(bvh_fresh, jnp.asarray(o), jnp.asarray(dirs),
                    t_max=50.0, max_steps=8192)
    ha, hb = np.asarray(ra['hit']), np.asarray(rb['hit'])
    np.testing.assert_array_equal(ha, hb)
    np.testing.assert_allclose(np.asarray(ra['t'])[ha],
                               np.asarray(rb['t'])[ha], rtol=2e-4,
                               atol=2e-5)
    # payloads use the same pair-order triangle ids in both paths
    np.testing.assert_array_equal(np.asarray(ra['tri'])[ha],
                                  np.asarray(rb['tri'])[ha])

    # and against the brute-force oracle
    t_want, tri_want = _brute_force(
        np.asarray(v0), np.asarray(v1), np.asarray(v2), np.asarray(valid),
        o, dirs, 50.0)
    np.testing.assert_array_equal(ha, tri_want >= 0)
    np.testing.assert_allclose(np.asarray(ra['t'])[ha], t_want[ha],
                               rtol=2e-4, atol=2e-5)


def test_refit_aabbs_contain_triangles():
    """Every refit leaf triangle must be inside its group AABB chain up to
    the root (containment is the refit invariant)."""
    from toyrenderer_tpu.ops import geometry as G

    s, d, pi, pm = _cornell_device_pairs()
    rts = B.build_rt_static(s, pi, pm)
    world = G.node_world_matrices(d, d.node_translation, d.node_rotation,
                                  d.node_scale)
    iw, _ = G.instance_transforms(d, world)
    bvh = B.refit_bvh(rts, iw)

    # component-major rows: (rows, 10, LEAF_TRIS) -> per-tri (N, 10)
    leaf = np.asarray(bvh.leaf_rows).reshape(
        -1, 10, B.LEAF_TRIS).transpose(0, 2, 1).reshape(-1, 10)
    pay = leaf[:, 9]
    v0 = leaf[:, 0:3]
    v1 = v0 + leaf[:, 3:6]
    v2 = v0 + leaf[:, 6:9]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)
    ok = pay >= 0

    # walk the parent chain: group g at leaf level, parent g//8 etc.
    boxes = np.asarray(bvh.child_boxes)
    offs = list(bvh.level_offset)
    g = np.arange(leaf.shape[0] // B.LEAF_TRIS).repeat(B.LEAF_TRIS)
    for lvl in range(bvh.num_levels - 2, -1, -1):
        parent = g // 8
        child = g % 8
        row = boxes[offs[lvl] + parent]
        lo = row.reshape(-1, 6, 8)[np.arange(len(g)), 0:3, child]
        hi = row.reshape(-1, 6, 8)[np.arange(len(g)), 3:6, child]
        assert np.all(lo[ok] <= tri_lo[ok] + 1e-3)
        assert np.all(hi[ok] >= tri_hi[ok] - 1e-3)
        g = parent


def test_traverse_pallas_matches_lockstep():
    """Packet traversal (interpret mode) must agree with the XLA lockstep
    traversal: same hit set, same winning triangle, t within tolerance;
    any_hit mode agrees on the hit mask."""
    from toyrenderer_tpu.ops.bvh_pallas import traverse_pallas

    rng = np.random.RandomState(3)
    t = 3000
    v0 = rng.uniform(-15, 15, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    valid = np.ones(t, bool)
    valid[::11] = False
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))

    n = 1400   # not a packet multiple: exercises padding
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = B.traverse(bvh, jnp.asarray(o), jnp.asarray(d), t_max=150.0,
                     max_steps=8192)
    got = traverse_pallas(bvh, jnp.asarray(o), jnp.asarray(d),
                          t_max=150.0, interpret=True)
    rh = np.asarray(ref['hit'])
    gh = np.asarray(got['hit'])
    assert np.array_equal(rh, gh)
    m = rh
    np.testing.assert_allclose(np.asarray(got['t'])[m],
                               np.asarray(ref['t'])[m], rtol=1e-4,
                               atol=1e-5)
    assert np.array_equal(np.asarray(got['tri'])[m],
                          np.asarray(ref['tri'])[m])

    ga = traverse_pallas(bvh, jnp.asarray(o), jnp.asarray(d),
                         t_max=150.0, any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(ga['hit']), rh)

    # big-scene mode: leaf rows stream from HBM per visit (the Bistro-
    # scale path) — must agree bitwise on hits/winners too
    gh2 = traverse_pallas(bvh, jnp.asarray(o), jnp.asarray(d),
                          t_max=150.0, leaf_hbm=True, interpret=True)
    assert np.array_equal(np.asarray(gh2['hit']), rh)
    assert np.array_equal(np.asarray(gh2['tri'])[m],
                          np.asarray(ref['tri'])[m])


def test_traverse_pallas_gdir_matches_lockstep():
    """Grouped-direction packet traversal (every 128 consecutive rays
    share one direction — the DDGI gdir brick layout) must agree with
    the XLA lockstep traversal; exercises closest-hit, any-hit, live
    masking, want_uv, and both packet sizes (nch=1 and nch=4)."""
    from toyrenderer_tpu.ops.bvh_pallas import (
        GDIR_GROUP, traverse_pallas_gdir)

    rng = np.random.RandomState(7)
    t = 3000
    v0 = rng.uniform(-15, 15, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    valid = np.ones(t, bool)
    valid[::13] = False
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))

    n = 20 * GDIR_GROUP             # not a packet multiple: padding
    gd = rng.normal(size=(n // GDIR_GROUP, 3)).astype(np.float32)
    gd /= np.linalg.norm(gd, axis=1, keepdims=True)
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = np.repeat(gd, GDIR_GROUP, axis=0)
    ref = B.traverse(bvh, jnp.asarray(o), jnp.asarray(d), t_max=150.0,
                     max_steps=8192)
    rh = np.asarray(ref['hit'])

    for packet in (1024, 4096):
        got = traverse_pallas_gdir(bvh, jnp.asarray(o), jnp.asarray(gd),
                                   t_max=150.0, packet=packet,
                                   interpret=True, want_uv=True)
        assert np.array_equal(np.asarray(got['hit']), rh)
        m = rh
        np.testing.assert_allclose(np.asarray(got['t'])[m],
                                   np.asarray(ref['t'])[m], rtol=1e-4,
                                   atol=1e-5)
        assert np.array_equal(np.asarray(got['tri'])[m],
                              np.asarray(ref['tri'])[m])

    ga = traverse_pallas_gdir(bvh, jnp.asarray(o), jnp.asarray(gd),
                              t_max=150.0, any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(ga['hit']), rh)

    live = (np.arange(n) % 3 != 0).astype(np.float32)
    gl = traverse_pallas_gdir(bvh, jnp.asarray(o), jnp.asarray(gd),
                              t_max=150.0, live=jnp.asarray(live),
                              interpret=True)
    glh = np.asarray(gl['hit'])
    assert not glh[live == 0].any()
    assert np.array_equal(glh[live > 0], rh[live > 0])

    # big-scene mode: leaf rows stream from HBM per visit
    gh2 = traverse_pallas_gdir(bvh, jnp.asarray(o), jnp.asarray(gd),
                               t_max=150.0, leaf_hbm=True, interpret=True)
    assert np.array_equal(np.asarray(gh2['hit']), rh)


def test_rt_static_masked_alpha_coverage():
    """Alpha-masked pairs join the RT topology coverage-classified
    (shadowmask.hlsl any-hit alpha parity, pre-classified at build):
    mostly-opaque cutout triangles occlude rays, hole triangles drop."""
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    from toyrenderer_tpu.ops import geometry as G

    s = load_scene("resources/courtyard.glb")
    mk_i, mk_m = static_meshlet_pairs(s, 'mask')
    assert len(mk_i) > 0
    keep = B.alpha_coverage_keep(s, mk_i, mk_m)
    counts = np.asarray(s.meshlet_tri_count)[np.asarray(mk_m)]
    valid = (np.arange(96)[None, :] < counts[:, None]).reshape(-1)
    frac = keep.sum() / valid.sum()
    # foliage/banner textures: most triangles occlude, holes drop
    assert 0.3 < frac < 0.98
    assert keep.sum() < valid.sum()

    pi, pm = static_meshlet_pairs(s, 'not_mask')
    pi, pm = pi[:512], pm[:512]
    rts = B.build_rt_static(s, pi, pm, mask_pair_inst=mk_i,
                            mask_pair_meshlet=mk_m)
    rts0 = B.build_rt_static(s, pi, pm)
    n_with = int((np.asarray(rts.payload) >= 0).sum())
    n_without = int((np.asarray(rts0.payload) >= 0).sum())
    assert rts.n_mask_pairs == len(mk_i)
    assert n_with == n_without + int(keep.sum())

    # a kept masked triangle must occlude a ray aimed at it
    d = s.to_device()
    world = G.node_world_matrices(d, d.node_translation, d.node_rotation,
                                  d.node_scale)
    iw, _ = G.instance_transforms(d, world)
    bvh = B.refit_bvh(rts, iw)
    leaf = np.asarray(bvh.leaf_rows)
    rows = leaf.reshape(leaf.shape[0], 10, B.LEAF_TRIS).transpose(
        0, 2, 1).reshape(-1, 10)
    pay = rows[:, 9].astype(np.int64)
    base = len(np.asarray(pi)) * 96
    masked_slots = np.nonzero(pay >= base)[0]
    assert len(masked_slots) == int(keep.sum())
    sl = masked_slots[len(masked_slots) // 2]
    v0 = rows[sl, 0:3]
    cen = v0 + (rows[sl, 3:6] + rows[sl, 6:9]) / 3.0
    dirn = np.asarray([0.3, -0.8, 0.2], np.float32)
    dirn /= np.linalg.norm(dirn)
    o = cen - dirn * 2.0
    res = B.traverse(bvh, jnp.asarray(o[None]), jnp.asarray(dirn[None]),
                     t_max=10.0, max_steps=4096)
    assert bool(np.asarray(res['hit'])[0])


def test_rt_lod_pairs_budget():
    """RT-LOD topology (Bistro-scale budget knob): under a small budget
    the helper walks to a coarser LOD with fewer triangles; results
    remain a valid pair list for build_rt_static."""
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops.geometry import rt_lod_pairs

    s = load_scene("resources/courtyard.glb")
    counts = np.asarray(s.meshlet_tri_count)
    pi0, pm0, lod0 = rt_lod_pairs(s, 'not_mask', budget_tris=10**9)
    assert lod0 == 0
    t0 = int(counts[np.asarray(pm0)].sum())
    piN, pmN, lodN = rt_lod_pairs(s, 'not_mask', budget_tris=t0 // 4)
    assert lodN > 0
    tN = int(counts[np.asarray(pmN)].sum())
    assert tN < t0
    rts = B.build_rt_static(s, piN[:256], pmN[:256])
    assert int((np.asarray(rts.payload) >= 0).sum()) > 0


def test_traverse_binned_matches_lockstep():
    """Binned two-phase traversal (phase-A entry intersect -> per-round
    nearest-subtree packets -> root-seeded fallback) must agree with the
    XLA lockstep traversal for closest-hit (same hit set, same winner,
    t within tolerance) and on the hit mask for any-hit, across rounds
    counts (0 rounds = pure fallback) and live masking."""
    from toyrenderer_tpu.ops.bvh_pallas import traverse_binned

    rng = np.random.RandomState(7)
    t = 4000
    v0 = rng.uniform(-15, 15, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.7, 0.7, (t, 3)).astype(np.float32)
    valid = np.ones(t, bool)
    valid[::13] = False
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))

    n = 1500   # not a packet multiple
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = B.traverse(bvh, jnp.asarray(o), jnp.asarray(d), t_max=150.0,
                     max_steps=8192)
    rh = np.asarray(ref['hit'])
    for rounds in (0, 1, 3):
        got = traverse_binned(bvh, jnp.asarray(o), jnp.asarray(d),
                              t_max=150.0, rounds=rounds,
                              interpret=True)
        gh = np.asarray(got['hit'])
        assert np.array_equal(rh, gh), f"rounds={rounds}"
        m = rh
        np.testing.assert_allclose(np.asarray(got['t'])[m],
                                   np.asarray(ref['t'])[m], rtol=1e-4,
                                   atol=1e-5)
        assert np.array_equal(np.asarray(got['tri'])[m],
                              np.asarray(ref['tri'])[m])

    ga = traverse_binned(bvh, jnp.asarray(o), jnp.asarray(d),
                         t_max=150.0, any_hit=True, rounds=2,
                         interpret=True)
    assert np.array_equal(np.asarray(ga['hit']), rh)

    # live masking: dead rays report miss and never affect others
    lv = np.ones(n, np.float32)
    lv[::3] = 0.0
    gl = traverse_binned(bvh, jnp.asarray(o), jnp.asarray(d),
                         t_max=150.0, rounds=2,
                         live=jnp.asarray(lv), interpret=True)
    glh = np.asarray(gl['hit'])
    assert not glh[::3].any()
    keep = lv > 0
    assert np.array_equal(glh[keep], rh[keep])
    m2 = keep & rh
    np.testing.assert_allclose(
        np.asarray(gl['t'])[m2], np.asarray(ref['t'])[m2],
        rtol=1e-4, atol=1e-5)
