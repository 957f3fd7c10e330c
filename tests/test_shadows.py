"""RT shadow + denoiser tests."""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import bvh as B
from toyrenderer_tpu.ops import shadows as SH
from toyrenderer_tpu.ops import denoise as DN


def _plane_occluder_bvh():
    # a quad at y=5 covering x,z in [-10, 10]
    quad = np.asarray([
        [[-10, 5, -10], [10, 5, -10], [10, 5, 10]],
        [[-10, 5, -10], [10, 5, 10], [-10, 5, 10]],
    ], np.float32)
    return B.build_bvh(jnp.asarray(quad[:, 0]), jnp.asarray(quad[:, 1]),
                       jnp.asarray(quad[:, 2]), jnp.asarray([True, True]))


def test_shadow_mask_hard_edges():
    bvh = _plane_occluder_bvh()
    h = w = 16
    # ground points: half under the occluder, half outside it
    xs = np.linspace(-20, 20, w, dtype=np.float32)
    wp = np.zeros((h, w, 3), np.float32)
    wp[..., 0] = xs[None, :]
    wp[..., 2] = np.linspace(-5, 5, h, dtype=np.float32)[:, None]
    normal = np.zeros_like(wp)
    normal[..., 1] = 1.0
    mask = SH.trace_shadow_mask(
        bvh, jnp.asarray(wp), jnp.asarray(normal),
        jnp.ones((h, w), bool), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.asarray(0), half_angle=1e-4)
    mask = np.asarray(mask)
    assert mask[:, 0].mean() > 0.9     # x=-20: outside occluder -> lit
    assert mask[:, w // 2].mean() < 0.1  # x~0: under occluder -> shadowed


def test_shadow_backface_self():
    bvh = _plane_occluder_bvh()
    normal = jnp.asarray([[[0.0, -1.0, 0.0]]])   # facing away from sun
    mask = SH.trace_shadow_mask(
        bvh, jnp.zeros((1, 1, 3)), normal, jnp.ones((1, 1), bool),
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(0))
    assert float(mask[0, 0]) == 0.0


def test_sky_pixels_stay_lit():
    bvh = _plane_occluder_bvh()
    mask = SH.trace_shadow_mask(
        bvh, jnp.zeros((1, 2, 3)),
        jnp.asarray([[[0, 1, 0], [0, 1, 0]]], jnp.float32),
        jnp.asarray([[True, False]]),
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(0))
    assert float(mask[0, 1]) == 1.0


def test_cone_sampling_spreads():
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    r1 = jnp.asarray([0.9])
    angles = []
    for r2 in np.linspace(0, 1, 8, endpoint=False):
        s = SH.cone_sample(d, r1, jnp.asarray([r2]), half_angle=0.1)
        angles.append(float(jnp.arccos(jnp.clip(
            jnp.sum(s * d, -1), -1, 1))[0]))
    assert max(angles) < 0.11
    assert min(angles) > 0.05   # r1=0.9 -> near the cone edge
    # unit length
    s = SH.cone_sample(d, r1, jnp.asarray([0.3]), 0.1)
    assert abs(float(jnp.linalg.norm(s)) - 1.0) < 1e-5


def test_ign_decorrelates_frames():
    a = np.asarray(SH.interleaved_gradient_noise(8, 8, jnp.asarray(0)))
    b = np.asarray(SH.interleaved_gradient_noise(8, 8, jnp.asarray(1)))
    assert (a >= 0).all() and (a < 1).all()
    assert np.abs(a - b).mean() > 0.1


def test_temporal_accumulate_disocclusion():
    h = w = 8
    sig = jnp.zeros((h, w))
    hist = jnp.ones((h, w))
    motion = jnp.zeros((h, w, 2))
    depth = jnp.full((h, w), 0.5)
    # same depth -> history kept
    out = DN.temporal_accumulate(sig, motion, hist, jnp.asarray(1.0),
                                 depth, depth)
    assert float(out.mean()) > 0.8
    # wildly different prev depth -> history rejected
    out = DN.temporal_accumulate(sig, motion, hist, jnp.asarray(1.0),
                                 depth, jnp.full((h, w), 0.01))
    assert float(out.mean()) < 1e-6


def test_depth_aware_blur_respects_edges():
    h = w = 16
    sig = np.zeros((h, w), np.float32)
    sig[:, :8] = 1.0
    depth = np.full((h, w), 0.5, np.float32)
    depth[:, 8:] = 0.05                      # big depth discontinuity
    out = np.asarray(DN.depth_aware_blur(
        jnp.asarray(sig), jnp.asarray(depth)))
    # blur must not leak much across the depth edge
    assert out[:, 10].mean() < 0.12
    assert out[:, 4].mean() > 0.9


def test_shadow_map_matches_rt_reference():
    """The default shadow-map technique must agree with the BVH ray-traced
    ground truth (up to bias/edge texels) on the stress scene."""
    import jax.numpy as jnp
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = make_stress_scene(n_objects=12, sphere_res=10, seed=7)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    masks = {}
    for tech in ('map', 'rt'):
        settings = RenderSettings(
            width=192, height=96, manual_exposure=0.05,
            enable_shadows=True, shadow_technique=tech,
            shadow_map_resolution=1024, shadow_max_steps=128,
            max_tris_per_tile=256, max_big_tris=64, tile_batch=4)
        view = View.from_scene(s, 192, 96)
        view.enable_jitter = False
        carry = init_carry(d, settings)
        render = make_render_fn(settings)
        aux = None
        for _ in range(3):   # let the temporal denoiser settle
            mats = view.matrices()
            fi = default_frame_inputs(s, mats)
            img, carry, aux = render(d, pi, pm, fi, carry)
            view.advance(mats)
        masks[tech] = np.asarray(aux['shadow'])
    diff = np.abs(masks['map'] - masks['rt'])
    assert diff.mean() < 0.05, f"techniques disagree: {diff.mean()}"
    # both find real shadow (dark areas exist)
    assert masks['map'].min() < 0.3
    assert masks['rt'].min() < 0.3


def test_shadow_gdir_strip_sampling_consistent():
    """Grouped-direction shadow rays (one cone sample per 64x2 strip):
    with a ZERO cone angle the gdir mask must exactly equal the
    per-pixel mask (both trace the exact sun direction); with a real
    cone the masks agree except at penumbra-noise pixels."""
    import jax.numpy as jnp
    import numpy as np
    from toyrenderer_tpu.ops import bvh as B
    from toyrenderer_tpu.ops.shadows import trace_shadow_mask

    rng = np.random.RandomState(3)
    t = 400
    v0 = rng.uniform(-5, 5, (t, 3)).astype(np.float32)
    v0[:, 1] = np.abs(v0[:, 1]) + 1.0
    v1 = v0 + rng.uniform(-0.6, 0.6, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.6, 0.6, (t, 3)).astype(np.float32)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.ones((t,), bool))

    h, w = 96, 160
    xs = np.linspace(-5, 5, w, dtype=np.float32)
    zs = np.linspace(-5, 5, h, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)                     # (h, w)
    wp = np.stack([gx, np.zeros_like(gx), gz], -1).astype(np.float32)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3))
    hit = jnp.ones((h, w), bool)
    sun = jnp.asarray([0.3, 0.8, 0.2])
    sun = sun / jnp.linalg.norm(sun)
    fi = jnp.asarray(5)

    a = trace_shadow_mask(bvh, jnp.asarray(wp), nrm, hit, sun, fi,
                          half_angle=0.0, gdir=False)
    b = trace_shadow_mask(bvh, jnp.asarray(wp), nrm, hit, sun, fi,
                          half_angle=0.0, gdir=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = trace_shadow_mask(bvh, jnp.asarray(wp), nrm, hit, sun, fi,
                          gdir=False)
    d = trace_shadow_mask(bvh, jnp.asarray(wp), nrm, hit, sun, fi,
                          gdir=True)
    # same scene, tiny cone: disagreement limited to penumbra noise
    frac = (np.asarray(c) != np.asarray(d)).mean()
    assert frac < 0.05, frac


def test_cached_sun_map_matches_uncached():
    """cache_sun_map (the default) must be invisible: a camera-orbiting
    sequence with a static sun renders EXACTLY like the per-frame
    re-raster, and a sun move mid-sequence invalidates the cache."""
    import jax.numpy as jnp
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (make_render_fn,
                                              default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = (jnp.asarray(x) for x in static_meshlet_pairs(s))

    def run(cached):
        st = RenderSettings(width=96, height=64, enable_shadows=True,
                            shadow_technique='map',
                            shadow_map_resolution=256,
                            manual_exposure=0.02, cache_sun_map=cached)
        view = View.from_scene(s, st.width, st.height)
        view.enable_jitter = False
        carry = init_carry(d, st)
        render = make_render_fn(st, donate_carry=False)
        imgs = []
        for i in range(4):
            mats = view.matrices()
            fi = default_frame_inputs(s, mats)
            if i >= 2:
                # move the sun mid-sequence: rebuild its view-proj
                from toyrenderer_tpu.engine.frame import _sun_view_proj
                class _S:  # shifted sun
                    sun_direction = np.asarray([0.4, -1.0, 0.25])
                    world_aabb = s.world_aabb
                fi['sun_direction'] = jnp.asarray(
                    _S.sun_direction / np.linalg.norm(_S.sun_direction),
                    jnp.float32)
                fi['sun_view_proj'] = jnp.asarray(_sun_view_proj(_S))
            img, carry, _ = render(d, pi, pm, fi, carry)
            view.rotate_yaw_pitch(0.1, 0.0)
            imgs.append(np.asarray(img))
        return imgs

    a = run(True)
    b = run(False)
    for i, (x, y) in enumerate(zip(a, b)):
        assert np.array_equal(x, y), f"frame {i} differs with cache"
    # the sun move must actually change the shadows
    assert np.abs(a[1].astype(int) - a[2].astype(int)).mean() > 0.5


def test_shadow_checkerboard_pack_unpack():
    """Traced cells survive pack->unpack exactly; untraced cells are the
    mean of their two in-row traced neighbours; complementary parities
    cover the full grid."""
    import jax.numpy as jnp
    import numpy as np
    from toyrenderer_tpu.ops.shadows import (checkerboard_pack,
                                             checkerboard_unpack)

    rng = np.random.RandomState(0)
    h, w = 6, 8
    img = rng.rand(h, w).astype(np.float32)
    vec = rng.rand(h, w, 3).astype(np.float32)
    for par in (0, 1):
        p = jnp.asarray(par, jnp.int32)
        packed, pvec = checkerboard_pack((jnp.asarray(img),
                                          jnp.asarray(vec)), p)
        packed = np.asarray(packed)
        pvec = np.asarray(pvec)
        # packed cell (y, k) == img[y, 2k + (y+par)%2]
        for y in range(h):
            idx = (y + par) % 2
            np.testing.assert_array_equal(packed[y], img[y, idx::2])
            np.testing.assert_array_equal(pvec[y], vec[y, idx::2])
        full = np.asarray(checkerboard_unpack(jnp.asarray(packed), p))
        for y in range(h):
            idx = (y + par) % 2
            # traced cells exact
            np.testing.assert_array_equal(full[y, idx::2], img[y, idx::2])
            # untraced cells = mean of in-row traced neighbours (edge
            # cells clamp to the single neighbour)
            tr = img[y, idx::2]
            right = np.concatenate([tr[1:], tr[-1:]])
            left = np.concatenate([tr[:1], tr[:-1]])
            want = 0.5 * (tr + right) if idx == 0 else 0.5 * (left + tr)
            np.testing.assert_allclose(full[y, 1 - idx::2], want,
                                       rtol=1e-6)
