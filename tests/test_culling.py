"""Culling tests: HZB build/query oracle, LOD selection, pair compaction,
and 2-phase E2E image equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.ops import hzb as HZ
from toyrenderer_tpu.ops import culling as CU


def test_hzb_min_reduction():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 1.0, size=(64, 96)).astype(np.float32)
    mips = HZ.build_hzb(jnp.asarray(depth), 96, 64)
    # mip0 covers the padded pow2 (64, 128)/2 = (32, 64)
    assert mips[0].shape == (32, 64)
    m0 = np.asarray(mips[0])
    # oracle: 2x2 min over the padded depth
    p = np.zeros((64, 128), np.float32)
    p[:, :96] = depth
    want = p.reshape(32, 2, 64, 2).min(axis=(1, 3))
    np.testing.assert_allclose(m0, want)
    # chain is monotone: every coarser mip <= finer mip upsampled
    for a, b in zip(mips, mips[1:]):
        a = np.asarray(a)
        b = np.asarray(b)
        assert (b <= a.reshape(b.shape[0], 2, b.shape[1], 2)
                .min(axis=(1, 3)) + 1e-7).all()


def test_hzb_occlusion_query():
    # a near wall (depth 0.8, reverse-Z) covering the left half
    w, h = 128, 64
    depth = np.zeros((h, w), np.float32)
    depth[:, :64] = 0.8
    mips = HZ.build_hzb(jnp.asarray(depth), w, h)
    u0 = jnp.asarray([0.1, 0.1, 0.6])
    v0 = jnp.asarray([0.2, 0.2, 0.2])
    u1 = jnp.asarray([0.3, 0.3, 0.8])
    v1 = jnp.asarray([0.6, 0.6, 0.6])
    d_near = jnp.asarray([0.5, 0.9, 0.5])   # behind wall, in front, right side
    vis = np.asarray(HZ.hzb_test_bbox(mips, u0, v0, u1, v1, d_near, w, h))
    assert vis.tolist() == [False, True, True]


def test_hzb_empty_scene_everything_visible():
    w, h = 64, 64
    mips = HZ.init_hzb(w, h)
    vis = np.asarray(HZ.hzb_test_bbox(
        mips, jnp.asarray([0.4]), jnp.asarray([0.4]),
        jnp.asarray([0.6]), jnp.asarray([0.6]), jnp.asarray([0.001]),
        w, h))
    assert vis[0]


@pytest.fixture(scope="module")
def stress():
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    s = make_stress_scene(n_objects=24, sphere_res=12, seed=3)
    return s, s.to_device()


def test_select_lod_distance(stress):
    s, d = stress
    # pick a primitive with multiple LODs
    multi = int(np.argmax(s.prim_lod_count[:s.num_primitives]))
    if s.prim_lod_count[multi] < 2:
        pytest.skip("no multi-LOD primitive in scene")
    prim = jnp.asarray([multi, multi])
    dist = jnp.asarray([0.5, 1e5])
    lod = np.asarray(CU.select_lod(d, prim, dist,
                                   jnp.asarray(500.0)))
    assert lod[0] == 0
    assert lod[1] > 0
    forced = np.asarray(CU.select_lod(d, prim, dist, jnp.asarray(500.0),
                                      forced_lod=1))
    assert (forced == np.minimum(1, s.prim_lod_count[multi] - 1)).all()


def test_build_pairs_matches_naive(stress):
    s, d = stress
    rng = np.random.default_rng(1)
    n_inst = d.inst_node.shape[0]
    mask = rng.uniform(size=n_inst) > 0.4
    mask[s.num_instances:] = False
    lod = rng.integers(0, 2, size=n_inst)
    lod = np.minimum(lod, np.asarray(s.prim_lod_count[s.inst_prim]) - 1)
    pi, pm, pv, total = CU.build_pairs(
        d, jnp.asarray(mask), jnp.asarray(lod.astype(np.int32)),
        capacity=4096)
    pi, pm, pv = np.asarray(pi), np.asarray(pm), np.asarray(pv)
    want = []
    for i in range(s.num_instances):
        if not mask[i]:
            continue
        p = int(s.inst_prim[i])
        l = int(lod[i])
        o = int(s.prim_meshlet_offset[p, l])
        c = int(s.prim_meshlet_count[p, l])
        want += [(i, o + k) for k in range(c)]
    got = list(zip(pi[pv].tolist(), pm[pv].tolist()))
    assert got == want
    assert int(total) == len(want)


def test_build_pairs_overflow_drops(stress):
    s, d = stress
    n_inst = d.inst_node.shape[0]
    mask = np.zeros(n_inst, bool)
    mask[:s.num_instances] = True
    lod = np.zeros(n_inst, np.int32)
    pi, pm, pv, total = CU.build_pairs(
        d, jnp.asarray(mask), jnp.asarray(lod), capacity=8)
    assert int(np.asarray(pv).sum()) == 8
    assert int(total) >= 8


def test_frustum_instance_culling(stress):
    s, d = stress
    from toyrenderer_tpu.ops import geometry as G
    from toyrenderer_tpu.engine.view import View
    import jax.numpy as jnp
    world = G.node_world_matrices(
        d, d.node_translation, d.node_rotation, d.node_scale)
    iw, _ = G.instance_transforms(d, world)
    view = View.from_scene(s, 128, 128)
    m = view.matrices()
    res = CU.cull_instances(
        d, iw, jnp.asarray(m['cull_frustum_planes']),
        jnp.asarray(m['cull_cam_pos']), jnp.asarray(m['proj_scale_px']),
        128, 128)
    vis = np.asarray(res['visible'])[:s.num_instances]
    # some objects are behind the camera in the stress scene
    assert vis.any()
    assert not vis.all()


def test_two_phase_culling_image_matches_unculled():
    """Culled and unculled pipelines must produce the same image for the
    first two frames of a static camera (culling may only remove hidden
    work, never visible pixels)."""
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = make_stress_scene(n_objects=16, sphere_res=10, seed=5)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    common = dict(width=192, height=96, manual_exposure=0.1,
                  max_tris_per_tile=256, max_big_tris=64, tile_batch=4,
                  forced_lod=0)   # LOD selection legitimately changes
    #                               geometry; equivalence needs LOD0
    imgs = {}
    for name, en in (("off", False), ("on", True)):
        settings = RenderSettings(enable_culling=en, **common)
        view = View.from_scene(s, 192, 96)
        view.enable_jitter = False
        carry = init_carry(d, settings)
        render = make_render_fn(settings)
        frames = []
        for _ in range(2):
            mats = view.matrices()
            fi = default_frame_inputs(s, mats)
            img, carry, aux = render(d, pi, pm, fi, carry)
            view.advance(mats)
            frames.append(np.asarray(img))
        imgs[name] = frames
        if en:
            assert int(aux['early_meshlets']) > 0
    for f in range(2):
        a, b = imgs["off"][f].astype(int), imgs["on"][f].astype(int)
        assert np.abs(a - b).mean() < 0.5, f"frame {f} diverged"


def test_forced_lod_renders(stress):
    s, d = stress
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    pi, pm = static_meshlet_pairs(s)
    settings = RenderSettings(width=128, height=64, enable_culling=True,
                              forced_lod=1, manual_exposure=0.1,
                              max_tris_per_tile=128, max_big_tris=64,
                              tile_batch=4)
    view = View.from_scene(s, 128, 64)
    carry = init_carry(d, settings)
    render = make_render_fn(settings)
    fi = default_frame_inputs(s, view.matrices())
    img, carry, aux = render(d, jnp.asarray(pi), jnp.asarray(pm), fi, carry)
    assert np.asarray(img).any()
