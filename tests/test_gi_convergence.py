"""GI convergence early-out fires at the INTEGRATION level.

Round-3 shipped the windowed-std convergence machinery
(GIRenderer.cpp:158-190, 466-470 parity) unit-tested but the real bench
loop never saw `gi_converged: true`.  This drives the real all-on
settings (4 phased blocks, shadow map, TAA) on Cornell until the flag
flips and asserts (a) it does, (b) the frozen field keeps shading,
(c) a sun change resumes updates.
"""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.scene import load_scene
from toyrenderer_tpu.engine import View, RenderSettings, init_carry
from toyrenderer_tpu.engine.frame import make_render_fn, default_frame_inputs
from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
from toyrenderer_tpu.ops.ddgi import volume_from_aabb

W, H = 160, 96


def test_allon_converges_and_sun_reset():
    scene_host = load_scene("resources/cornell.gltf", use_cache=False)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    vol = volume_from_aabb(scene_host.world_aabb[0],
                           scene_host.world_aabb[1])
    settings = RenderSettings(
        width=W, height=H, manual_exposure=0.01, enable_gi=True,
        gi_update_phases=4, enable_shadows=True, shadow_technique='map',
        enable_taa=True)
    view = View.from_scene(scene_host, W, H)
    carry = init_carry(scene, settings, vol, pair_inst=pi, pair_meshlet=pm)
    render = make_render_fn(settings, vol)

    converged_at = None
    img = None
    for f in range(150):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        img, carry, aux = render(scene, pi, pm, fi, carry)
        view.advance(mats)
        if bool(np.asarray(aux['ddgi_converged'])):
            converged_at = f
            break
    assert converged_at is not None, (
        "GI never converged in 150 frames at 4 phases "
        f"(var_samples={float(carry['ddgi_var_samples'])}, "
        f"ring={np.asarray(carry['ddgi_var_ring'])})")
    # converged frames must still shade with the frozen field
    frozen = np.asarray(carry['ddgi_irradiance'])
    mats = view.matrices()
    fi = default_frame_inputs(scene_host, mats)
    img2, carry, aux = render(scene, pi, pm, fi, carry)
    assert bool(np.asarray(aux['ddgi_converged']))
    np.testing.assert_array_equal(np.asarray(carry['ddgi_irradiance']),
                                  frozen)
    assert np.asarray(img2).std() > 5.0
    # a sun change resets the sample counter and resumes updates
    fi['sun_direction'] = jnp.asarray(
        np.asarray(fi['sun_direction']) * np.float32([-1, 1, 1]))
    img3, carry, aux = render(scene, pi, pm, fi, carry)
    assert float(carry['ddgi_var_samples']) <= 1.0
    assert not bool(np.asarray(aux['ddgi_converged']))
