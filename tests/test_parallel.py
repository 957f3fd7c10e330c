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
