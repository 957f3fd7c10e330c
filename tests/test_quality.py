"""Quality goldens for the cheap-path defaults.

The half-res GTAO horizons and half-res DDGI irradiance sampling are the
DEFAULTS (frame.py ao_half_res / gi_half_res); these tests bound their
error against the full-res paths on Cornell so the "XeGTAO-class
quality" claim is enforced by CI, not asserted.
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
    s = load_scene("resources/cornell.gltf", use_cache=False)
    d = s.to_device()
    pi, pm = static_meshlet_pairs(s)
    return s, d, jnp.asarray(pi), jnp.asarray(pm)


def _run(cornell, settings, frames=3):
    s, d, pi, pm = cornell
    view = View.from_scene(s, W, H)
    view.enable_jitter = False
    ddgi = None
    if settings.enable_gi:
        from toyrenderer_tpu.ops.ddgi import volume_from_aabb
        ddgi = volume_from_aabb(s.world_aabb[0], s.world_aabb[1],
                                max_probes_axis=6, rays_per_probe=48)
    carry = init_carry(d, settings, ddgi)
    render = make_render_fn(settings, ddgi, donate_carry=False)
    aux = None
    for _ in range(frames):
        mats = view.matrices()
        fi = default_frame_inputs(s, mats)
        img, carry, aux = render(d, pi, pm, fi, carry)
        view.advance(mats)
    return {k: np.asarray(v) for k, v in aux.items()}


def test_half_res_gtao_error_bounded(cornell):
    """Half-res GTAO (the default) must stay close to full-res GTAO:
    mean |dAO| < 0.05, and the coarse AO statistics agree."""
    base = dict(width=W, height=H, manual_exposure=0.01, enable_ao=True)
    aux_h = _run(cornell, RenderSettings(ao_half_res=True, **base))
    aux_f = _run(cornell, RenderSettings(ao_half_res=False, **base))
    ao_h, ao_f = aux_h['ao'], aux_f['ao']
    hit = aux_f['depth'] > 0
    mae = np.abs(ao_h - ao_f)[hit].mean()
    assert mae < 0.05, f"half-res GTAO mean abs error {mae:.4f}"
    # both must actually darken creases (AO does something)
    assert ao_f[hit].min() < 0.8
    assert abs(ao_h[hit].mean() - ao_f[hit].mean()) < 0.02


def test_half_res_gi_error_bounded(cornell):
    """Half-res DDGI irradiance sampling (the default) must stay close
    to full-res sampling: mean relative HDR error < 6% on lit geometry."""
    base = dict(width=W, height=H, manual_exposure=0.01, enable_gi=True,
                gi_max_steps=48)
    aux_h = _run(cornell, RenderSettings(gi_half_res=True, **base),
                 frames=4)
    aux_f = _run(cornell, RenderSettings(gi_half_res=False, **base),
                 frames=4)
    hit = aux_f['depth'] > 0
    hdr_h = aux_h['hdr'][hit]
    hdr_f = aux_f['hdr'][hit]
    rel = np.abs(hdr_h - hdr_f) / (np.abs(hdr_f) + 1e-3)
    assert rel.mean() < 0.06, f"half-res GI mean rel error {rel.mean():.4f}"
    # GI actually contributes (interior brighter than sun-only ambient)
    assert hdr_f.mean() > 0


def test_coarse_gi_visibility_error_bounded(cornell):
    """The coarse Chebyshev visibility factor (gi_vis_scale=2, the
    default — the 8 per-corner distance gathers are the measured probe-
    sampling whale) must stay close to full-rate visibility: mean
    relative HDR error < 4% on lit geometry."""
    base = dict(width=W, height=H, manual_exposure=0.01, enable_gi=True,
                gi_max_steps=48, gi_half_res=True)
    aux_c = _run(cornell, RenderSettings(gi_vis_scale=2, **base),
                 frames=4)
    aux_f = _run(cornell, RenderSettings(gi_vis_scale=1, **base),
                 frames=4)
    hit = aux_f['depth'] > 0
    hdr_c = aux_c['hdr'][hit]
    hdr_f = aux_f['hdr'][hit]
    rel = np.abs(hdr_c - hdr_f) / (np.abs(hdr_f) + 1e-3)
    assert rel.mean() < 0.04, \
        f"coarse-vis GI mean rel error {rel.mean():.4f}"
