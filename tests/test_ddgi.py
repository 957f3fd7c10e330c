"""DDGI probe GI tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.ops import ddgi as D


def test_volume_from_aabb():
    v = D.volume_from_aabb([-10, 0, -10], [10, 5, 10], max_probes_axis=8)
    assert max(v.counts) == 8
    assert min(v.counts) >= 2
    pos = np.asarray(v.probe_positions())
    assert pos.shape == (v.num_probes, 3)
    assert pos.min(0)[1] <= 0.0 and pos.max(0)[1] >= 5.0


def test_update_probes_uniform_radiance():
    """Uniform white radiance from all directions -> every irradiance
    texel equals 1 (cosine-weighted mean of a constant is the constant)."""
    v = D.DdgiVolume(origin=(0, 0, 0), spacing=(1, 1, 1),
                     counts=(2, 2, 2), rays_per_probe=128)
    probes = D.init_probes(v)
    dirs = jnp.asarray(D._fibonacci_sphere(128))
    radiance = jnp.ones((8, 128, 3))
    dist = jnp.full((8, 128), 0.7)
    out = D.update_probes(v, probes, radiance, dist, dirs,
                          first_frame=jnp.asarray(True))
    irr = np.asarray(out['ddgi_irradiance'])
    np.testing.assert_allclose(irr, 1.0, atol=0.02)
    d = np.asarray(out['ddgi_distance'])
    np.testing.assert_allclose(d[..., 0], 0.7, atol=0.02)
    np.testing.assert_allclose(d[..., 1], 0.49, atol=0.03)


def test_update_hysteresis():
    v = D.DdgiVolume(origin=(0, 0, 0), spacing=(1, 1, 1),
                     counts=(2, 2, 2), rays_per_probe=64)
    probes = D.init_probes(v)
    probes = {k: jnp.ones_like(x) for k, x in probes.items()}
    dirs = jnp.asarray(D._fibonacci_sphere(64))
    radiance = jnp.zeros((8, 64, 3))
    dist = jnp.zeros((8, 64))
    out = D.update_probes(v, probes, radiance, dist, dirs,
                          first_frame=jnp.asarray(False))
    # hysteresis 0.5: halfway between old (1) and new (0)
    np.testing.assert_allclose(
        np.asarray(out['ddgi_irradiance']), 0.5, atol=1e-5)


def test_sample_trilinear_interpolation():
    v = D.DdgiVolume(origin=(0, 0, 0), spacing=(1, 1, 1),
                     counts=(2, 2, 2), rays_per_probe=64)
    # probe 0 black, all others white
    irr = jnp.ones((8, D.IRR_RES * D.IRR_RES, 3))
    irr = irr.at[0].set(0.0)
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    near0 = D.sample_irradiance(v, irr, jnp.asarray([[0.05, 0.05, 0.05]]),
                                up)
    center = D.sample_irradiance(v, irr, jnp.asarray([[0.5, 0.5, 0.5]]),
                                 up)
    far = D.sample_irradiance(v, irr, jnp.asarray([[0.95, 0.95, 0.95]]),
                              up)
    assert float(near0[0, 0]) < float(center[0, 0]) < float(far[0, 0])
    assert float(far[0, 0]) > 0.95


def test_fibonacci_covers_sphere():
    d = D._fibonacci_sphere(256)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # mean direction ~ 0 (uniform)
    assert np.abs(d.mean(0)).max() < 0.02
    # both hemispheres populated
    assert (d[:, 2] > 0).sum() > 100 and (d[:, 2] < 0).sum() > 100


def test_cornell_gi_lights_interior():
    """The closed Cornell box is fully sun-shadowed inside; with DDGI the
    interior must receive bounced energy."""
    import jax
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    vol = D.volume_from_aabb(s.world_aabb[0], s.world_aabb[1],
                             max_probes_axis=6, rays_per_probe=32)
    W, H = 128, 72
    base = dict(width=W, height=H, enable_shadows=True,
                manual_exposure=0.02, shadow_max_steps=64, gi_max_steps=64)
    hdrs = {}
    for gi in (False, True):
        settings = RenderSettings(enable_gi=gi, **base)
        view = View.from_scene(s, W, H)
        view.enable_jitter = False
        carry = init_carry(d, settings, vol if gi else None)
        render = make_render_fn(settings, vol if gi else None)
        for _ in range(4):
            mats = view.matrices()
            fi = default_frame_inputs(s, mats)
            img, carry, aux = render(d, pi, pm, fi, carry)
            view.advance(mats)
        hdrs[gi] = np.asarray(aux['hdr'])
    # interior (geometry) pixels must be brighter with GI
    interior = hdrs[True][20:60, 30:100].mean()
    interior_nogi = hdrs[False][20:60, 30:100].mean()
    assert interior > interior_nogi * 1.5
    assert np.isfinite(hdrs[True]).all()


def test_phased_updates_converge_like_full():
    """Block-phased probe updates must converge to the same field as
    full per-frame updates."""
    import jax
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    vol = D.volume_from_aabb(s.world_aabb[0], s.world_aabb[1],
                             max_probes_axis=4, rays_per_probe=32)
    fields = {}
    for phases in (1, 4):
        settings = RenderSettings(width=96, height=64, enable_gi=True,
                                  enable_shadows=True,
                                  gi_update_phases=phases,
                                  manual_exposure=0.02,
                                  shadow_max_steps=64, gi_max_steps=64)
        view = View.from_scene(s, 96, 64)
        view.enable_jitter = False
        carry = init_carry(d, settings, vol)
        render = make_render_fn(settings, vol)
        n = 6 if phases == 1 else 6 * phases
        for _ in range(n):
            mats = view.matrices()
            fi = default_frame_inputs(s, mats)
            img, carry, aux = render(d, pi, pm, fi, carry)
            view.advance(mats)
        fields[phases] = np.asarray(carry['ddgi_irradiance'])
    a, b = fields[1], fields[4]
    assert np.isfinite(b).all()
    # same energy scale and high correlation between the two fields
    assert abs(a.mean() - b.mean()) < 0.35 * max(a.mean(), 1e-3)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.9


def test_block_alignment_indivisible_phases():
    """num_probes not divisible by num_phases: traced positions and written
    slots must agree (ADVICE r1: the tail block used wrap-around probes
    while the write clamped, misattributing radiance)."""
    import jax
    from toyrenderer_tpu.ops import bvh as B

    # 3x1x1 probes along x at x = 0, 2, 4; a bright emissive wall only
    # near the LAST probe (x=4) so misattribution is visible.
    v = D.DdgiVolume(origin=(0.0, 0.0, 0.0), spacing=(2.0, 1.0, 1.0),
                     counts=(3, 1, 1), rays_per_probe=32)
    assert v.num_probes == 3
    num_phases = 2          # ceil(3/2)=2 -> blocks [0,2) and clamped [1,3)

    # one SMALL emissive triangle just past the last probe (x=4.5): its
    # solid angle (hence probe irradiance) falls off sharply with distance
    v0 = jnp.asarray([[4.5, -0.5, -0.5]])
    v1 = jnp.asarray([[4.5, 0.5, -0.5]])
    v2 = jnp.asarray([[4.5, 0.0, 1.0]])
    bvh = B.build_bvh(v0, v1, v2, jnp.asarray([True]))
    # shade record: normal -x, albedo 0, emissive bright white
    rec = jnp.asarray([[-1.0, 0.0, 0.0,  0.0, 0.0, 0.0,  5.0, 5.0, 5.0]])

    probes = D.init_probes(v)
    sky = lambda d: jnp.zeros((d.shape[0], 3))
    sun = jnp.asarray([0.0, 1.0, 0.0])
    suncol = jnp.asarray([1.0, 1.0, 1.0])

    for f in range(num_phases):
        rad, dist, dirs, start, _lc = D.trace_probe_block(
            v, bvh, rec, probes['ddgi_irradiance'], sun, suncol,
            jnp.asarray(0.0), jnp.asarray(f), sky, num_phases,
            max_steps=16)
        probes = D.update_probe_block(v, probes, rad, dist, dirs, start,
                                      first_frame=jnp.asarray(True))

    irr = np.asarray(probes['ddgi_irradiance']).mean(axis=(1, 2))  # (3,)
    # every probe updated; emission falls off with distance from the wall:
    # probe 2 (closest) must see the most energy, probe 0 the least.
    assert irr[2] > irr[1] >= irr[0] * 0.999
    assert irr[2] > irr[0] * 1.5


def test_probe_lifecycle_relocation_classification_variability():
    """Lifecycle parity (GIRenderer.cpp:450-577,158-190): a probe inside
    geometry relocates out; probes with no nearby geometry deactivate;
    the variability scalar decays as the field converges."""
    from toyrenderer_tpu.ops import bvh as B

    # closed axis-aligned box [-1,1]^3 made of 12 triangles, normals OUT.
    faces = []
    def quad(a, b, c, d):
        faces.append((a, b, c))
        faces.append((a, c, d))
    p = {}
    for i, (x, y, z) in enumerate([(x, y, z) for x in (-1, 1)
                                   for y in (-1, 1) for z in (-1, 1)]):
        p[i] = np.asarray([x, y, z], np.float32)
    quad(p[1], p[5], p[7], p[3])   # +z
    quad(p[4], p[0], p[2], p[6])   # -z
    quad(p[5], p[4], p[6], p[7])   # +x
    quad(p[0], p[1], p[3], p[2])   # -x
    quad(p[3], p[7], p[6], p[2])   # +y
    quad(p[0], p[4], p[5], p[1])   # -y
    tris = np.asarray(faces, np.float32)
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    bvh = B.build_bvh(v0, v1, v2, jnp.ones((len(tris),), bool))
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rec = jnp.asarray(np.concatenate(
        [nrm, np.full((len(tris), 3), 0.5), np.zeros((len(tris), 3))], 1))

    # probes: one INSIDE the box (sees only backfaces... normals point out
    # -> from inside, rays hit faces whose normal agrees with ray dir =
    # backfaces), one just OUTSIDE near a wall (frontfaces), one FAR away
    v = D.DdgiVolume(origin=(0.0, 0.0, 0.0), spacing=(1.4, 1.0, 1.0),
                     counts=(3, 1, 1), rays_per_probe=64)
    # positions: x = 0 (inside), 1.4 (just outside +x wall), 2.8 (near)
    # ... far probe needs to exceed 2.5*|spacing|: use big spacing
    v = D.DdgiVolume(origin=(0.0, 0.0, 0.0), spacing=(14.0, 1.0, 1.0),
                     counts=(3, 1, 1), rays_per_probe=64)
    probes = D.init_probes(v)
    sky = lambda dd: jnp.full((dd.shape[0], 3), 0.2)
    sun = jnp.asarray([0.0, 1.0, 0.0])
    var = []
    for f in range(8):
        rad, dist, dirs, start, lc = D.trace_probe_block(
            v, bvh, rec, probes['ddgi_irradiance'], sun, jnp.ones(3),
            jnp.asarray(1.0), jnp.asarray(f), sky, 1, max_steps=32,
            probe_offset=probes['ddgi_offset'],
            probe_state=probes['ddgi_state'])
        probes = D.update_probe_block(
            v, probes, rad, dist, dirs, start,
            first_frame=jnp.asarray(f == 0), lifecycle=lc)
        var.append(float(probes['ddgi_variability']))

    off = np.asarray(probes['ddgi_offset'])
    state = np.asarray(probes['ddgi_state'])
    # probe 0 (inside the box) relocated; the box is only 1 unit from its
    # center so the offset is nonzero toward an exit
    assert np.linalg.norm(off[0]) > 0.2
    # probe 1 at x=14 and probe 2 at x=28: far from the 2-unit box ->
    # classified inactive; probe 0 stays active (inside/nearby)
    assert state[0] == 1.0
    assert state[1] == 0.0 and state[2] == 0.0
    # variability decays as the constant-sky field converges
    assert var[-1] < var[1] * 0.7
    assert np.isfinite(var).all()


def test_trace_probe_block_gdir_layout_matches(monkeypatch):
    """The gdir traversal bricking (32 cone dirs x 128 probes per packet,
    one direction per 128-ray group) must reassemble to exactly the same
    probe radiance/dist/lifecycle as the default cone layout — on CPU
    both reach the same lockstep traversal, so this isolates the
    relayout + group-dir table construction."""
    from toyrenderer_tpu.ops import bvh as B

    rng = np.random.RandomState(11)
    t = 600
    c = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
    v0 = c + rng.normal(scale=0.5, size=(t, 3)).astype(np.float32)
    v1 = c + rng.normal(scale=0.5, size=(t, 3)).astype(np.float32)
    v2 = c + rng.normal(scale=0.5, size=(t, 3)).astype(np.float32)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.ones((t,), bool))
    nrm = np.cross(np.asarray(v1 - v0), np.asarray(v2 - v0))
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    rec = jnp.asarray(np.concatenate(
        [nrm, np.full((t, 3), 0.6), np.zeros((t, 3))], 1))

    v = D.DdgiVolume(origin=(-4.0, -4.0, -4.0), spacing=(2.0, 2.0, 2.0),
                     counts=(5, 5, 5), rays_per_probe=256)
    probes = D.init_probes(v)
    sky = lambda dd: jnp.full((dd.shape[0], 3), 0.3)
    sun = jnp.asarray([0.0, 1.0, 0.0])

    outs = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TR_GI_GDIR', flag)
        rad, dist, dirs, start, lc = D.trace_probe_block(
            v, bvh, rec, probes['ddgi_irradiance'], sun, jnp.ones(3),
            jnp.asarray(1.0), jnp.asarray(2), sky, 3, max_steps=64)
        outs[flag] = (np.asarray(rad), np.asarray(dist),
                      {k: np.asarray(x) for k, x in lc.items()})
    np.testing.assert_array_equal(outs['0'][0], outs['1'][0])
    np.testing.assert_array_equal(outs['0'][1], outs['1'][1])
    for k in outs['0'][2]:
        np.testing.assert_array_equal(outs['0'][2][k], outs['1'][2][k])
