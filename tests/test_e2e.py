"""End-to-end frame tests on the Cornell box (golden-property checks).

The reference has no test suite; its smoke path is Cornell-on-WARP
(SURVEY.md §4).  Ours: render Cornell through the full jitted pipeline on
CPU and assert scene-derived image properties (wall colors in the right
places, depth ordering, determinism, motion vectors zero for a static
camera).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.scene import load_scene
from toyrenderer_tpu.engine import View, RenderSettings, init_carry
from toyrenderer_tpu.engine.frame import make_render_fn, default_frame_inputs
from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

W, H = 224, 128


@pytest.fixture(scope="module")
def cornell():
    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    return scene_host, scene, jnp.asarray(pi), jnp.asarray(pm)


def _render(cornell, settings, n_frames=1, move=None):
    scene_host, scene, pi, pm = cornell
    view = View.from_scene(scene_host, settings.width, settings.height)
    view.enable_jitter = False
    carry = init_carry(scene, settings)
    render = make_render_fn(settings)
    img = aux = None
    for _ in range(n_frames):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        img, carry, aux = render(scene, pi, pm, fi, carry)
        view.advance(mats)
        if move:
            move(view)
    return np.asarray(img), {k: np.asarray(v) for k, v in aux.items()}


def test_cornell_lit_frame(cornell):
    settings = RenderSettings(width=W, height=H, manual_exposure=0.01)
    img, aux = _render(cornell, settings)
    assert img.shape == (H, W, 3)
    cover = (aux['tri_id'] >= 0).mean()
    assert 0.5 < cover < 0.95          # box interior + sky strips
    # left third: red wall dominates some rows
    left = img[H // 2, : W // 6].astype(np.float32)
    right = img[H // 2, -W // 6:].astype(np.float32)
    assert (left[:, 0] > left[:, 1] + 20).any(), "red wall missing"
    assert (right[:, 1] > right[:, 0] + 20).any(), "green wall missing"
    # center: lit white-ish back wall, not clipped to black
    c = img[H // 2, W // 2]
    assert c.min() > 60
    # depth is reverse-Z in (0, 1]
    d = aux['depth']
    hit = aux['tri_id'] >= 0
    assert d[hit].min() > 0.0 and d[hit].max() <= 1.0
    # back wall farther than the front box: depth smaller
    assert d[H // 2, W // 2] < d[int(H * 0.78), W // 2]


def test_cornell_deterministic(cornell):
    settings = RenderSettings(width=W, height=H, manual_exposure=0.01)
    img1, _ = _render(cornell, settings)
    img2, _ = _render(cornell, settings)
    np.testing.assert_array_equal(img1, img2)


def test_static_camera_zero_motion(cornell):
    settings = RenderSettings(width=W, height=H, manual_exposure=0.01)
    _, aux = _render(cornell, settings, n_frames=2)
    assert np.abs(aux['motion']).max() < 1e-3


def test_moving_camera_motion_vectors(cornell):
    settings = RenderSettings(width=W, height=H, manual_exposure=0.01)
    def move(v):
        v.move(right=0.1)
    _, aux = _render(cornell, settings, n_frames=2, move=move)
    hit = aux['tri_id'] >= 0
    mx = aux['motion'][..., 0][hit]
    # camera moves right => geometry moves left in screen space...
    # motion = cur - prev, so x-motion should be negative on average
    assert np.abs(mx).mean() > 0.1
    assert mx.mean() < 0.0


def test_debug_views_run(cornell):
    for mode in (1, 2, 6, 11):
        settings = RenderSettings(width=W, height=H, debug_mode=mode)
        img, _ = _render(cornell, settings)
        assert img.shape == (H, W, 3)
        assert img.any()


def test_bruteforce_matches_binned(cornell):
    s1 = RenderSettings(width=W, height=H, manual_exposure=0.01)
    s2 = RenderSettings(width=W, height=H, manual_exposure=0.01,
                        use_bruteforce_raster=True)
    img1, aux1 = _render(cornell, s1)
    img2, aux2 = _render(cornell, s2)
    np.testing.assert_allclose(aux1['depth'], aux2['depth'], atol=1e-5)
    assert (img1.astype(int) - img2.astype(int)).__abs__().mean() < 1.0


def test_full_hdr_pipeline(cornell):
    """Bloom + auto-exposure + TAA enabled end-to-end; exposure converges
    and the image stays plausible."""
    settings = RenderSettings(width=W, height=H, enable_bloom=True,
                              enable_auto_exposure=True, enable_taa=True,
                              manual_exposure=0.05)
    scene_host, scene, pi, pm = cornell
    view = View.from_scene(scene_host, W, H)
    carry = init_carry(scene, settings)
    render = make_render_fn(settings)
    exposures = []
    img = None
    for _ in range(8):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        img, carry, aux = render(scene, pi, pm, fi, carry)
        view.advance(mats)
        exposures.append(float(carry['exposure']))
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    # auto-exposure moved away from the initial value toward a target
    assert abs(exposures[-1] - 0.05) > 1e-4
    deltas = [abs(exposures[i + 1] - exposures[i]) for i in range(6)]
    assert deltas[-1] < deltas[0] + 1e-6   # settling
    # image not black and not fully saturated in the box interior
    inner = img[H // 4: -H // 4, W // 4: -W // 4]
    assert inner.mean() > 10
    assert (inner == 255).mean() < 0.5
    # TAA history carried
    assert 'taa_history' in carry and carry['taa_history'].shape == (H, W, 3)


def test_state_snapshot_roundtrip(cornell, tmp_path):
    """Carry (incl. nested HZB tuple) survives save/load; resumed render
    is bitwise-identical to the uninterrupted one."""
    from toyrenderer_tpu.engine.snapshot import save_state, load_state
    settings = RenderSettings(width=W, height=H, manual_exposure=0.01,
                              enable_culling=True, enable_taa=True)
    scene_host, scene, pi, pm = cornell
    render = make_render_fn(settings)

    def run(n, carry, view):
        img = None
        for _ in range(n):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry)
            view.advance(mats)
        return img, carry, view

    view = View.from_scene(scene_host, W, H)
    carry = init_carry(scene, settings)
    img_a, carry, view = run(2, carry, view)
    save_state(tmp_path / "state.npz", carry, view)

    view2 = View.from_scene(scene_host, W, H)
    carry2 = load_state(tmp_path / "state.npz", view2)
    assert view2.frame_index == view.frame_index
    img_resume, _, _ = run(1, carry2, view2)
    img_cont, _, _ = run(1, carry, view)
    np.testing.assert_array_equal(np.asarray(img_resume),
                                  np.asarray(img_cont))


def test_transparent_forward_pass():
    """A blend-mode quad in front of the camera tints what's behind it."""
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.scene.gltf import ALPHA_BLEND
    s = make_stress_scene(n_objects=8, sphere_res=8, seed=9)
    # make one material transparent red glass
    k = int(np.asarray(s.inst_prim)[1])
    mat = int(s.prim_material[k])
    s.mat_alpha_mode[mat] = ALPHA_BLEND
    s.mat_base_color[mat] = [0.9, 0.1, 0.1, 0.5]
    d = s.to_device()
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    pi, pm = static_meshlet_pairs(s, 'opaque')
    ti, tm = static_meshlet_pairs(s, 'blend')
    assert len(ti) > 0
    settings = RenderSettings(width=192, height=96, manual_exposure=0.05,
                              enable_transparency=True,
                              max_tris_per_tile=256, max_big_tris=64,
                              tile_batch=4)
    view = View.from_scene(s, 192, 96)
    view.enable_jitter = False
    carry = init_carry(d, settings)
    render = make_render_fn(settings)
    fi = default_frame_inputs(s, view.matrices())
    img_t, _, _ = render(d, jnp.asarray(pi), jnp.asarray(pm), fi, carry,
                         trans_pair_inst=jnp.asarray(ti),
                         trans_pair_meshlet=jnp.asarray(tm))
    # without the pass: transparent geometry invisible
    s2 = RenderSettings(width=192, height=96, manual_exposure=0.05,
                        max_tris_per_tile=256, max_big_tris=64,
                        tile_batch=4)
    render2 = make_render_fn(s2)
    carry2 = init_carry(d, s2)
    img_o, _, _ = render2(d, jnp.asarray(pi), jnp.asarray(pm), fi, carry2)
    diff = np.abs(np.asarray(img_t).astype(int)
                  - np.asarray(img_o).astype(int))
    assert diff.max() > 20          # the glass visibly tints pixels
    assert (diff.sum(-1) > 0).mean() < 0.5   # but only locally


def test_alpha_masked_cutout():
    """A masked material with a mostly-transparent texture must show
    cutouts (background visible through failed-alpha pixels)."""
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.scene.gltf import ALPHA_MASK
    from toyrenderer_tpu.scene import textures as TX
    s = make_stress_scene(n_objects=6, sphere_res=8, seed=13)
    # texture: left half opaque white, right half alpha 0
    img = np.full((64, 64, 4), 255, np.uint8)
    img[:, 32:, 3] = 0
    atlas = TX.build_atlas(images=[img])
    s.attach_atlas(atlas)
    # mask the GROUND material (instance 0 — covers half the screen)
    mat = int(s.prim_material[int(s.inst_prim[0])])
    s.mat_alpha_mode[mat] = ALPHA_MASK
    s.mat_base_color_tex[mat] = 0
    s.mat_base_color[mat] = [1, 1, 1, 1]
    d = s.to_device()
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    pi, pm = static_meshlet_pairs(s, 'not_mask')
    mi, mm = static_meshlet_pairs(s, 'mask')
    assert len(mi) > 0
    settings = RenderSettings(width=192, height=96, manual_exposure=0.05,
                              max_tris_per_tile=256, max_big_tris=64,
                              tile_batch=4)
    view = View.from_scene(s, 192, 96)
    view.enable_jitter = False
    carry = init_carry(d, settings)
    render = make_render_fn(settings)
    fi = default_frame_inputs(s, view.matrices())
    img_mask, _, aux_m = render(
        d, jnp.asarray(pi), jnp.asarray(pm), fi, carry,
        mask_pair_inst=jnp.asarray(mi), mask_pair_meshlet=jnp.asarray(mm))
    # compare with the same geometry treated fully opaque
    pi_all, pm_all = static_meshlet_pairs(s, 'all')
    carry2 = init_carry(d, settings)
    img_op, _, aux_o = render(d, jnp.asarray(pi_all), jnp.asarray(pm_all),
                              fi, carry2)
    cov_mask = (np.asarray(aux_m['depth']) > 0).mean()
    cov_op = (np.asarray(aux_o['depth']) > 0).mean()
    # cutout removes covered pixels
    assert cov_mask < cov_op - 0.001
    # but the opaque half still renders
    diff = (np.asarray(img_mask).astype(int)
            - np.asarray(img_op).astype(int))
    assert np.abs(diff).max() > 10


def test_depth_peeled_oit_layers():
    """With TWO stacked blend surfaces (glass sphere in front of a glass
    ground), oit_layers=2 must composite the second layer that the
    single-layer path drops — pixels where the stack overlaps change."""
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.scene.gltf import ALPHA_BLEND
    s = make_stress_scene(n_objects=8, sphere_res=8, seed=9)
    ground_mat = int(s.prim_material[int(s.inst_prim[0])])
    s.mat_alpha_mode[ground_mat] = ALPHA_BLEND
    s.mat_base_color[ground_mat] = [0.1, 0.9, 0.1, 0.4]
    obj_mat = int(s.prim_material[int(s.inst_prim[1])])
    s.mat_alpha_mode[obj_mat] = ALPHA_BLEND
    s.mat_base_color[obj_mat] = [0.9, 0.1, 0.1, 0.5]
    d = s.to_device()
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    pi, pm = static_meshlet_pairs(s, 'opaque')
    ti, tm = static_meshlet_pairs(s, 'blend')
    assert len(ti) >= 2
    view = View.from_scene(s, 192, 96)
    view.enable_jitter = False
    fi = default_frame_inputs(s, view.matrices())

    imgs = {}
    for k in (1, 2):
        st = RenderSettings(width=192, height=96, manual_exposure=0.05,
                            enable_transparency=True, oit_layers=k,
                            max_tris_per_tile=256, max_big_tris=64,
                            tile_batch=4)
        img, _, _ = make_render_fn(st)(
            d, jnp.asarray(pi), jnp.asarray(pm), fi, init_carry(d, st),
            trans_pair_inst=jnp.asarray(ti),
            trans_pair_meshlet=jnp.asarray(tm))
        imgs[k] = np.asarray(img).astype(int)
    diff = np.abs(imgs[1] - imgs[2]).sum(-1)
    # the second peel adds the occluded glass layer somewhere...
    assert (diff > 10).sum() > 20
    # ...but identical where at most one layer exists
    assert (diff == 0).mean() > 0.5


def test_stacked_cutout_layers():
    """TWO stacked alpha-MASKED quads: the back quad must show through
    the front quad's alpha holes (basepass.hlsl ALPHA_MASK_MODE discard
    keeps the next-closest fragment; here alpha_layers depth peeling).
    With alpha_layers=1 the holes show background; with 2 they show the
    back quad."""
    import tempfile
    from toyrenderer_tpu.tools.gen_scene import GlbBuilder, quad_card
    from toyrenderer_tpu.scene import load_scene

    g = GlbBuilder(compress=False)
    # front texture: opaque green left half, alpha-0 right half
    img_f = np.zeros((64, 64, 4), np.uint8)
    img_f[:, :, 1] = 255
    img_f[:, :, 3] = 255
    img_f[:, 32:, 3] = 0
    tf = g.add_texture(img_f)
    # back: fully opaque red
    img_b = np.zeros((64, 64, 4), np.uint8)
    img_b[:, :, 0] = 255
    img_b[:, :, 3] = 255
    tb = g.add_texture(img_b)
    mf = g.add_material("front", base_tex=tf, alpha_mode="MASK",
                        cutoff=0.5, double_sided=True)
    mb = g.add_material("back", base_tex=tb, alpha_mode="MASK",
                        cutoff=0.5, double_sided=True)
    # opaque dark backdrop: the base set must be non-empty (an
    # all-masked scene degenerates — see static_meshlet_pairs)
    mg = g.add_material("bg", base_color=(0.02, 0.02, 0.02, 1.0))
    qg = g.add_mesh("qg", *quad_card(20.0, 20.0), mg)
    qf = g.add_mesh("qf", *quad_card(2.0, 2.0), mf)
    qb = g.add_mesh("qb", *quad_card(2.0, 2.0), mb)
    g.add_node("bg", mesh=qg, t=(0, -10, -5.0))
    g.add_node("front", mesh=qf, t=(0, -1, 0))
    g.add_node("back", mesh=qb, t=(0, -1, -1.0))
    cameras = [{"type": "perspective",
                "perspective": {"yfov": 1.0, "znear": 0.05}}]
    g.add_node("cam", camera=0, t=(0, 0, 2.5))
    lights = [{"type": "directional", "color": [1, 1, 1],
               "intensity": 3.0}]
    g.add_node("sun", light=0, r=[-0.3, 0.1, 0.0,
                                  float(np.sqrt(1 - 0.09 - 0.01))])
    with tempfile.TemporaryDirectory() as td:
        path = td + "/stack.glb"
        g.finish(path, cameras, lights)
        s = load_scene(path, use_cache=False)
    d = s.to_device()
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    pi, pm = static_meshlet_pairs(s, 'not_mask')
    mi, mm = static_meshlet_pairs(s, 'mask')
    assert len(mi) == 2
    view = View.from_scene(s, 128, 128)
    view.enable_jitter = False
    fi = default_frame_inputs(s, view.matrices())
    imgs = {}
    for k in (1, 2):
        st = RenderSettings(width=128, height=128, manual_exposure=0.3,
                            alpha_layers=k, max_tris_per_tile=64,
                            max_big_tris=64, tile_batch=4)
        img, _, aux = make_render_fn(st)(
            d, jnp.asarray(pi), jnp.asarray(pm), fi, init_carry(d, st),
            mask_pair_inst=jnp.asarray(mi),
            mask_pair_meshlet=jnp.asarray(mm))
        imgs[k] = np.asarray(img).astype(int)
    # the right half (front holes): 1 layer -> sky background,
    # 2 layers -> red back quad
    right = imgs[2][40:80, 70:90]
    assert right[..., 0].mean() > 60, "back quad not visible in holes"
    assert right[..., 0].mean() > right[..., 1].mean() + 30
    # with a single layer the same pixels are NOT the back quad
    right1 = imgs[1][40:80, 70:90]
    assert right1[..., 0].mean() < right[..., 0].mean() - 30
    # left half (front passes) identical between the two
    left_diff = np.abs(imgs[1][40:80, 30:60] - imgs[2][40:80, 30:60])
    assert left_diff.max() <= 2


def test_gi_frame_sah_gdir_interpret_matches_complete(monkeypatch):
    """FULL-frame integration of the tuned traversal: a GI frame traced
    through the SAH tree + grouped-direction kernel (interpret mode)
    must closely match the same frame on the complete tree + XLA
    lockstep — exercises refit_sah inside the frame jit and the
    payload -> shade-record alignment of the SAH leaf order."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.bvh_sah import build_rt_static_sah
    from toyrenderer_tpu.ops.ddgi import DdgiVolume

    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        gi_half_res=False, manual_exposure=0.02)
    rts_c = build_rt_static(scene_host, pi_h, pm_h)
    rts_s = build_rt_static_sah(scene_host, pi_h, pm_h)

    imgs = {}
    for name, rts in (("complete", rts_c), ("sah", rts_s)):
        # pin the probe path to cone/gdir packets: pairs is the default
        # probe traversal and would otherwise shadow the gdir kernel
        monkeypatch.setenv("TR_GI_PAIRS", "0")
        if name == "sah":
            monkeypatch.setenv("TR_INTERPRET", "1")
            monkeypatch.setenv("TR_GI_GDIR", "1")
        view = View.from_scene(scene_host, st.width, st.height)
        view.enable_jitter = False
        carry = init_carry(scene, st, vol)
        render = make_render_fn(st, vol, donate_carry=False)
        for _ in range(2):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry,
                                   rt_static=rts)
        imgs[name] = np.asarray(img, np.float32)
        monkeypatch.delenv("TR_INTERPRET", raising=False)
        monkeypatch.delenv("TR_GI_GDIR", raising=False)
        monkeypatch.delenv("TR_GI_PAIRS", raising=False)

    diff = np.abs(imgs["complete"] - imgs["sah"]).mean()
    assert np.isfinite(imgs["sah"]).all()
    assert diff < 2.0, diff      # u8-scale images; tiny numeric drift only


def test_gi_frame_pairs_interpret_matches_packet(monkeypatch):
    """FULL-frame integration of the pair-MXU probe traversal
    (ops/rt_pairs.py, the default DDGI path on TPU): a GI frame traced
    through traverse_pairs in interpret mode must closely match the
    same frame on the packet/XLA path — exercises the mt-table carry
    cache (gi_mt_cache), the unpadded dir-major ray stream, and the
    payload resolution through `pays`."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.ddgi import DdgiVolume

    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        gi_half_res=False, manual_exposure=0.02)
    rts = build_rt_static(scene_host, pi_h, pm_h)

    imgs = {}
    for name in ("packet", "pairs"):
        monkeypatch.setenv("TR_GI_PAIRS",
                           "1" if name == "pairs" else "0")
        if name == "pairs":
            monkeypatch.setenv("TR_INTERPRET", "1")
        view = View.from_scene(scene_host, st.width, st.height)
        view.enable_jitter = False
        # dedicated GI tree -> the moved-gated gi_bvh/gi_mt carry
        # caches are live, so the cond's build/hold structures must
        # agree (the bug this guards against)
        carry = init_carry(scene, st, vol, rt_static=rts,
                           rt_static_gi=rts, pair_inst=pi_h,
                           pair_meshlet=pm_h, gi_pair_inst=pi_h,
                           gi_pair_meshlet=pm_h)
        render = make_render_fn(st, vol, donate_carry=False)
        for _ in range(2):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry,
                                   rt_static=rts, rt_static_gi=rts,
                                   gi_pair_inst=pi, gi_pair_meshlet=pm)
        imgs[name] = np.asarray(img, np.float32)
        monkeypatch.delenv("TR_INTERPRET", raising=False)
        monkeypatch.delenv("TR_GI_PAIRS", raising=False)

    diff = np.abs(imgs["packet"] - imgs["pairs"]).mean()
    assert np.isfinite(imgs["pairs"]).all()
    assert diff < 2.0, diff      # u8-scale; bf16x3 MT drift only


def test_gi_convergence_skip_freezes_and_sun_resets():
    """GIRenderer.cpp:466-470 parity: once variability settles the whole
    GI update is skipped (probe field bitwise-frozen, flag in aux); a
    sun-direction change resets the counter and resumes updates."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.ddgi import DdgiVolume

    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        manual_exposure=0.02,
                        gi_min_var_samples=3,
                        gi_variability_threshold=0.5)
    rts = build_rt_static(scene_host, pi_h, pm_h)
    view = View.from_scene(scene_host, st.width, st.height)
    view.enable_jitter = False
    carry = init_carry(scene, st, vol)
    render = make_render_fn(st, vol, donate_carry=False)
    mats = view.matrices()
    fi = default_frame_inputs(scene_host, mats)
    conv_at = None
    for i in range(14):
        prev_irr = np.asarray(carry['ddgi_irradiance'])
        img, carry, aux = render(scene, pi, pm, fi, carry,
                                 rt_static=rts)
        if bool(np.asarray(aux['ddgi_converged'])):
            conv_at = i
            # skip ran: the probe field is bitwise-frozen this frame
            assert np.array_equal(prev_irr,
                                  np.asarray(carry['ddgi_irradiance']))
            break
    assert conv_at is not None, "volume never converged"
    # sun change resets the counter: updates resume, field changes
    fi2 = dict(fi)
    sd = np.asarray(fi['sun_direction'], np.float32).copy()
    sd[:2] = sd[:2] + 0.3
    fi2['sun_direction'] = sd / np.linalg.norm(sd)
    img, carry, aux = render(scene, pi, pm, fi2, carry, rt_static=rts)
    assert not bool(np.asarray(aux['ddgi_converged']))
    assert float(np.asarray(carry['ddgi_var_samples'])) == 1.0


def test_gi_dedicated_tree_matches_shared():
    """A GI frame tracing probe rays through a DEDICATED GI topology
    (rt_static_gi) built over the SAME pair list must match the
    shared-tree frame exactly up to traversal tie-breaks — validates
    the gi_pair/shade-record plumbing (frame.py gi_own_tree path).
    With a LOD-REDUCED GI stream the image must stay finite and close
    (diffuse GI barely sees the LOD switch)."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.ddgi import DdgiVolume
    from toyrenderer_tpu.ops.geometry import rt_lod_pairs
    from toyrenderer_tpu.scene.procedural import make_stress_scene

    scene_host = make_stress_scene(n_objects=12, sphere_res=10)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        gi_half_res=False, manual_exposure=0.02)
    rts = build_rt_static(scene_host, pi_h, pm_h)
    # LOD-reduced GI pair stream (budget below the LOD0 count)
    lod0 = int(np.asarray(
        scene_host.meshlet_tri_count)[np.asarray(pm_h)].sum())
    g_pi, g_pm, g_lod = rt_lod_pairs(scene_host,
                                     budget_tris=lod0 // 2)
    assert g_lod > 0
    rts_gi = build_rt_static(scene_host, g_pi, g_pm)

    def run(**kw):
        view = View.from_scene(scene_host, st.width, st.height)
        view.enable_jitter = False
        carry = init_carry(scene, st, vol)
        render = make_render_fn(st, vol, donate_carry=False)
        for _ in range(2):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry,
                                   rt_static=rts, **kw)
        return np.asarray(img, np.float32)

    shared = run()
    same_tree = run(rt_static_gi=rts, gi_pair_inst=pi,
                    gi_pair_meshlet=pm)
    # same topology via the dedicated path: bitwise-equal traversal
    assert np.abs(shared - same_tree).max() <= 1.0
    lod_tree = run(rt_static_gi=rts_gi,
                   gi_pair_inst=jnp.asarray(g_pi),
                   gi_pair_meshlet=jnp.asarray(g_pm))
    assert np.isfinite(lod_tree).all()
    # diffuse GI through simplified geometry: small mean image delta
    assert np.abs(shared - lod_tree).mean() < 6.0


def test_peel_merge_matches_dense():
    """masked_peel_merge_compact with full capacity must reproduce the
    dense per-layer resolve exactly (same records -> interpolants ->
    texturing math, routed through quad compaction + a gather-based
    expansion), and small capacity must still render the covered quads
    identically."""
    import tempfile
    from toyrenderer_tpu.tools.gen_scene import GlbBuilder, quad_card

    g = GlbBuilder(compress=False)
    img_f = np.zeros((64, 64, 4), np.uint8)
    img_f[:, :, 1] = 255
    img_f[:, :, 3] = 255
    img_f[:, 32:, 3] = 0
    tf = g.add_texture(img_f)
    img_b = np.zeros((64, 64, 4), np.uint8)
    img_b[:, :, 0] = 255
    img_b[:, :, 3] = 255
    tb = g.add_texture(img_b)
    mf = g.add_material("front", base_tex=tf, alpha_mode="MASK",
                        cutoff=0.5, double_sided=True)
    mb = g.add_material("back", base_tex=tb, alpha_mode="MASK",
                        cutoff=0.5, double_sided=True)
    mg = g.add_material("bg", base_color=(0.02, 0.02, 0.02, 1.0))
    qg = g.add_mesh("qg", *quad_card(20.0, 20.0), mg)
    qf = g.add_mesh("qf", *quad_card(2.0, 2.0), mf)
    qb = g.add_mesh("qb", *quad_card(2.0, 2.0), mb)
    g.add_node("bg", mesh=qg, t=(0, -10, -5.0))
    g.add_node("front", mesh=qf, t=(0, -1, 0))
    g.add_node("back", mesh=qb, t=(0, -1, -1.0))
    cameras = [{"type": "perspective",
                "perspective": {"yfov": 1.0, "znear": 0.05}}]
    g.add_node("cam", camera=0, t=(0, 0, 2.5))
    lights = [{"type": "directional", "color": [1, 1, 1],
               "intensity": 3.0}]
    g.add_node("sun", light=0, r=[-0.3, 0.1, 0.0,
                                  float(np.sqrt(1 - 0.09 - 0.01))])
    with tempfile.TemporaryDirectory() as td:
        path = td + "/stack.glb"
        g.finish(path, cameras, lights)
        s = load_scene(path, use_cache=False)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s, 'not_mask')
    mi, mm = static_meshlet_pairs(s, 'mask')
    view = View.from_scene(s, 128, 128)
    view.enable_jitter = False
    fi = default_frame_inputs(s, view.matrices())

    def run(frac):
        st = RenderSettings(width=128, height=128, manual_exposure=0.3,
                            alpha_layers=2, max_tris_per_tile=64,
                            max_big_tris=64, tile_batch=4,
                            peel_merge_frac=frac)
        img, _, _ = make_render_fn(st)(
            d, jnp.asarray(pi), jnp.asarray(pm), fi, init_carry(d, st),
            mask_pair_inst=jnp.asarray(mi),
            mask_pair_meshlet=jnp.asarray(mm))
        return np.asarray(img).astype(int)

    dense = run(0.0)
    compact_full = run(1.0)            # cap = every screen quad
    assert np.array_equal(dense, compact_full)
    # partial capacity that still fits this scene's masked coverage
    # (the two 2-unit quads fill ~2600 of the 4096 screen quads at
    # 128x128): exercises cap < num_quads without overflow
    compact_part = run(0.8)
    assert np.array_equal(dense, compact_part)
    # undersized capacity must degrade gracefully (drops fragments,
    # never corrupts): finite image, and pixels outside the masked
    # quads' footprint identical to dense
    compact_tiny = run(0.05)
    assert np.isfinite(compact_tiny).all()
    assert np.array_equal(dense[:, :10], compact_tiny[:, :10])

    # Pallas fast path (ONE occluder-seeded L-layer peel fill + the
    # same compact merge, interpret mode) must agree with the dense XLA
    # reference within u8 rounding
    def run_pallas(frac):
        st = RenderSettings(width=128, height=128, manual_exposure=0.3,
                            alpha_layers=2, max_tris_per_tile=64,
                            max_big_tris=64, tile_batch=4,
                            peel_merge_frac=frac,
                            use_pallas_fill=True)
        img, _, _ = make_render_fn(st)(
            d, jnp.asarray(pi), jnp.asarray(pm), fi, init_carry(d, st),
            mask_pair_inst=jnp.asarray(mi),
            mask_pair_meshlet=jnp.asarray(mm))
        return np.asarray(img).astype(int)

    pal = run_pallas(0.8)
    assert np.abs(pal - dense).max() <= 1


def test_refit_cache_matches_uncached():
    """init_carry's refit caches (rt_bvh_cache / gi_bvh_cache /
    gi_shade_cache) must be transparent: a shadows+GI frame sequence
    with caches enabled renders bit-identically to the uncached one,
    including a frame where instance transforms CHANGE (the caches must
    rebuild, not serve stale trees / shade records)."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.ddgi import DdgiVolume

    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        enable_shadows=True, shadow_technique='rt',
                        manual_exposure=0.02)
    rts = build_rt_static(scene_host, pi_h, pm_h)
    rts_gi = build_rt_static(scene_host, pi_h, pm_h)
    rt_kw = dict(rt_static=rts, rt_static_gi=rts_gi,
                 gi_pair_inst=pi, gi_pair_meshlet=pm)

    def run(cached):
        view = View.from_scene(scene_host, st.width, st.height)
        view.enable_jitter = False
        ck = (dict(rt_static=rts, rt_static_gi=rts_gi,
                   pair_inst=pi, pair_meshlet=pm,
                   gi_pair_inst=pi, gi_pair_meshlet=pm)
              if cached else {})
        carry = init_carry(scene, st, vol, **ck)
        if cached:
            assert 'rt_bvh_cache' in carry and 'gi_bvh_cache' in carry
        render = make_render_fn(st, vol, donate_carry=False)
        imgs = []
        for i in range(3):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            if i == 2:   # move every instance: caches must rebuild
                fi = dict(fi, node_translation=jnp.asarray(
                    fi['node_translation']) + 0.05)
            img, carry, _ = render(scene, pi, pm, fi, carry, **rt_kw)
            imgs.append(np.asarray(img))
        return imgs

    plain = run(False)
    cached = run(True)
    for i, (a, b) in enumerate(zip(plain, cached)):
        assert np.array_equal(a, b), f"frame {i} differs"


def test_gi_convergence_with_phased_updates():
    """PHASED probe updates must still converge: the variability ring
    gets one per-CYCLE sample (block-to-block spread used to keep the
    windowed std high forever — gi_converged never fired with
    gi_update_phases > 1)."""
    from toyrenderer_tpu.ops.bvh import build_rt_static
    from toyrenderer_tpu.ops.ddgi import DdgiVolume

    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi_h, pm_h = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi_h), jnp.asarray(pm_h)
    lo, hi = (np.asarray(x) for x in scene_host.world_aabb)
    vol = DdgiVolume(origin=tuple(lo), spacing=tuple((hi - lo) / 3.0),
                     counts=(4, 4, 4), rays_per_probe=32,
                     max_ray_distance=float(np.linalg.norm(hi - lo)))
    st = RenderSettings(width=96, height=64, enable_gi=True,
                        manual_exposure=0.02, gi_update_phases=2,
                        gi_min_var_samples=3,
                        gi_variability_threshold=0.5)
    rts = build_rt_static(scene_host, pi_h, pm_h)
    view = View.from_scene(scene_host, st.width, st.height)
    view.enable_jitter = False
    carry = init_carry(scene, st, vol)
    render = make_render_fn(st, vol, donate_carry=False)
    fi = default_frame_inputs(scene_host, view.matrices())
    conv_at = None
    for i in range(30):
        img, carry, aux = render(scene, pi, pm, fi, carry,
                                 rt_static=rts)
        if bool(np.asarray(aux['ddgi_converged'])):
            conv_at = i
            break
    assert conv_at is not None, "phased volume never converged"
    # samples count CYCLES: converging takes > min_samples * phases
    # frames from the start
    assert conv_at >= st.gi_min_var_samples * st.gi_update_phases
