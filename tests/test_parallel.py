"""Multi-chip SPMD tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_view_batch_renderer_matches_single():
    from jax.sharding import Mesh
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    from toyrenderer_tpu.parallel import (
        make_view_batch_renderer, replicate_scene)

    s = make_stress_scene(n_objects=6, sphere_res=8, seed=21)
    scene = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    settings = RenderSettings(width=128, height=64, manual_exposure=0.1,
                              max_tris_per_tile=64, max_big_tris=32,
                              raster_chunk=16, tile_batch=4)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))

    views = []
    fis = []
    for k in range(4):
        v = View.from_scene(s, 128, 64)
        v.enable_jitter = False
        v.move(right=0.4 * k)
        views.append(v)
        fis.append(default_frame_inputs(s, v.matrices()))
    fi_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *fis)
    carry = init_carry(scene, settings)
    carry_batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), carry)

    fn = make_view_batch_renderer(mesh, settings)
    imgs, new_carry = fn(replicate_scene(scene, mesh), pi, pm,
                         fi_batch, carry_batch)
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, 64, 128, 3)
    # each sharded view matches the single-device render
    render1 = make_render_fn(settings)
    for k in (0, 3):
        img1, _, _ = render1(scene, pi, pm, fis[k], init_carry(scene,
                                                               settings))
        np.testing.assert_array_equal(imgs[k], np.asarray(img1))
    # views differ (cameras moved)
    assert np.abs(imgs[0].astype(int) - imgs[3].astype(int)).mean() > 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sp_raster_matches_single():
    """Single-frame tile-row-sharded raster (sp=8) must match the
    unsharded streamed fill: same winners, same depth, same interpolants
    (up to the 1-2 ulp of the per-shard affine edge translation)."""
    from jax.sharding import Mesh
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.ops.geometry import (
        static_meshlet_pairs, node_world_matrices, instance_transforms,
        meshlet_clip_triangles)
    from toyrenderer_tpu.ops import raster as R
    from toyrenderer_tpu.ops.gbuffer import pack_resolve_records
    from toyrenderer_tpu.ops.raster_pallas import fill_resolve_stream
    from toyrenderer_tpu.parallel import raster_frame_sp
    from toyrenderer_tpu.engine import View

    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    w, h = 448, 256
    view = View.from_scene(s, w, h)
    mats = view.matrices()
    world = node_world_matrices(
        d, jnp.asarray(s.node_translation), jnp.asarray(s.node_rotation),
        jnp.asarray(s.node_scale))
    inst_world, inst_adj = instance_transforms(d, world)
    geo = meshlet_clip_triangles(
        d, inst_world, jnp.asarray(mats['view_proj']), pi, pm)
    cfg = R.RasterConfig(width=w, height=h, max_tris_per_tile=128,
                         max_big_tris=64)
    assert cfg.tiles_y % 8 == 0
    setup = R.setup_triangles(geo, cfg)
    records = pack_resolve_records(
        setup, d, inst_world, inst_adj, inst_world,
        jnp.asarray(mats['prev_view_proj_nojitter']))

    bins = R.bin_pairs_stream(setup, cfg)
    z1, id1, rec1 = fill_resolve_stream(setup, records, bins, cfg,
                                        interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    z8, id8, rec8, stats = raster_frame_sp(setup, records, cfg, mesh,
                                           interpret=True)
    z1, id1 = np.asarray(z1), np.asarray(id1)
    z8, id8 = np.asarray(z8), np.asarray(id8)
    assert (id8 >= 0).mean() > 0.5
    # winner flips are only possible on exact-depth slivers hit by the
    # extra 1-2 ulp of the edge translation
    agree = id1 == id8
    assert agree.mean() > 0.999, agree.mean()
    assert np.allclose(z1[agree], z8[agree], rtol=1e-5, atol=1e-6)
    i1 = np.asarray(rec1)                            # (INTERP_C, H, W)
    i8 = np.asarray(rec8)
    m = agree & (id1 >= 0)
    ok = np.isclose(i1[:, m], i8[:, m], rtol=1e-3, atol=1e-3)
    assert ok.mean() > 0.999, ok.mean()
    assert int(stats['binned_pairs']) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sp_frame_renderer_matches_single():
    """Full-frame render with the raster sharded over sp=8 vs the same
    pipeline on an sp=1 mesh: the image must agree to u8 rounding."""
    from jax.sharding import Mesh
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import default_frame_inputs
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    from toyrenderer_tpu.parallel import (
        make_sp_frame_renderer, replicate_scene)

    s = make_stress_scene(n_objects=6, sphere_res=8, seed=21)
    scene = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    settings = RenderSettings(width=128, height=256, manual_exposure=0.1,
                              max_tris_per_tile=64, max_big_tris=32,
                              raster_chunk=16, tile_batch=4,
                              use_pallas_fill=True)
    v = View.from_scene(s, 128, 256)
    v.enable_jitter = False
    fi = default_frame_inputs(s, v.matrices())

    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    img8, _, _ = make_sp_frame_renderer(mesh8, settings)(
        replicate_scene(scene, mesh8), pi, pm, fi,
        init_carry(scene, settings))
    img1, _, _ = make_sp_frame_renderer(mesh1, settings)(
        replicate_scene(scene, mesh1), pi, pm, fi,
        init_carry(scene, settings))
    img8 = np.asarray(img8).astype(int)
    img1 = np.asarray(img1).astype(int)
    assert img8.shape == (256, 128, 3)
    close = np.abs(img8 - img1) <= 2
    assert close.mean() > 0.995, close.mean()
    assert np.abs(img8 - img1).mean() < 0.1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_rt_gi_frame_matches_single():
    """A TRACED frame (rt shadows + DDGI) with ray packets sharded over
    sp=8 must match the single-device render bitwise: ray traversal has
    no cross-ray math, so shard_map over the ray stream is exact."""
    from jax.sharding import Mesh
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    from toyrenderer_tpu.ops.ddgi import volume_from_aabb
    from toyrenderer_tpu.parallel import (
        make_sp_frame_renderer, replicate_scene)

    s = load_scene("resources/cornell.gltf", use_cache=False)
    scene = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    vol = volume_from_aabb(s.world_aabb[0], s.world_aabb[1],
                           max_probes_axis=4, rays_per_probe=32)
    settings = RenderSettings(width=128, height=128, manual_exposure=0.02,
                              enable_shadows=True, shadow_technique='rt',
                              enable_gi=True, gi_max_steps=64,
                              shadow_max_steps=64,
                              gi_sun_technique='rt',
                              max_tris_per_tile=64, max_big_tris=32,
                              raster_chunk=16, tile_batch=4)
    v = View.from_scene(s, 128, 128)
    v.enable_jitter = False
    fi = default_frame_inputs(s, v.matrices())

    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    img8, carry8, _ = make_sp_frame_renderer(
        mesh8, settings, ddgi_volume=vol)(
        replicate_scene(scene, mesh8), pi, pm, fi,
        init_carry(scene, settings, vol))
    img1, carry1, _ = make_render_fn(settings, vol, donate_carry=False)(
        scene, pi, pm, fi, init_carry(scene, settings, vol))
    img8 = np.asarray(img8).astype(int)
    img1 = np.asarray(img1).astype(int)
    close = np.abs(img8 - img1) <= 2
    assert close.mean() > 0.995, close.mean()
    # probe state agrees too (the DDGI trace itself was sharded)
    i8 = np.asarray(carry8['ddgi_irradiance'])
    i1 = np.asarray(carry1['ddgi_irradiance'])
    np.testing.assert_allclose(i8, i1, rtol=1e-4, atol=1e-5)
