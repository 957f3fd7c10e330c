"""Stored-image regression goldens (BASELINE.json fidelity metric).

The reference verifies shading visually (RenderDoc captures, debug views
— SURVEY.md §4); the property tests in test_e2e.py catch gross breakage
but let subtle shading regressions through.  These tests render fixed
small-res all-on configs on CPU and compare against committed PNGs with
a perceptual tolerance (blurred linear-RGB difference, FLIP-flavored:
a 1px blur discards sampling-grid noise, the mean + p99 bounds catch
both global shifts and localized artifacts).

Regenerate after an INTENTIONAL shading change:
  GOLDEN_UPDATE=1 python -m pytest tests/test_goldens.py -q
then eyeball the new PNGs and commit them.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.scene import load_scene
from toyrenderer_tpu.engine import View, RenderSettings, init_carry
from toyrenderer_tpu.engine.frame import make_render_fn, default_frame_inputs
from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("GOLDEN_UPDATE", "0") == "1"
W, H = 448, 256


def _render_allon(scene_path, frames=4, culling=False, exposure=0.01):
    scene_host = load_scene(scene_path, use_cache=False)
    scene = scene_host.to_device()
    mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
    has_mask = len(mk_i) > 0
    pi, pm = static_meshlet_pairs(
        scene_host, 'not_mask' if has_mask else 'all')
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    mk_i = jnp.asarray(mk_i) if has_mask else None
    mk_m = jnp.asarray(mk_m) if has_mask else None

    from toyrenderer_tpu.ops.ddgi import volume_from_aabb
    vol = volume_from_aabb(scene_host.world_aabb[0],
                           scene_host.world_aabb[1])
    settings = RenderSettings(
        width=W, height=H, manual_exposure=exposure,
        enable_culling=culling, enable_shadows=True,
        shadow_technique='map', enable_ao=True, enable_gi=True,
        enable_taa=True, enable_bloom=True)
    view = View.from_scene(scene_host, W, H)
    carry = init_carry(scene, settings, vol, pair_inst=pi,
                       pair_meshlet=pm, mask_pair_inst=mk_i,
                       mask_pair_meshlet=mk_m)
    render = make_render_fn(settings, vol)
    img = None
    for _ in range(frames):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        img, carry, _ = render(scene, pi, pm, fi, carry,
                               mask_pair_inst=mk_i,
                               mask_pair_meshlet=mk_m)
        view.advance(mats)
    return np.asarray(img)


def _blur3(x):
    """Separable [1 2 1]/4 blur per channel (edge-clamped)."""
    k = np.array([0.25, 0.5, 0.25])
    p = np.pad(x, ((1, 1), (0, 0), (0, 0)), mode='edge')
    x = k[0] * p[:-2] + k[1] * p[1:-1] + k[2] * p[2:]
    p = np.pad(x, ((0, 0), (1, 1), (0, 0)), mode='edge')
    return k[0] * p[:, :-2] + k[1] * p[:, 1:-1] + k[2] * p[:, 2:]


def _perceptual_diff(a_u8, b_u8):
    """Blurred linear-RGB difference stats between two sRGB u8 images."""
    def lin(u8):
        s = u8.astype(np.float64) / 255.0
        return np.where(s <= 0.04045, s / 12.92,
                        ((s + 0.055) / 1.055) ** 2.4)
    d = np.abs(_blur3(lin(a_u8)) - _blur3(lin(b_u8))).max(axis=-1)
    return float(d.mean()), float(np.percentile(d, 99))


def _check_golden(name, img):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".png")
    from PIL import Image
    if UPDATE or not os.path.exists(path):
        Image.fromarray(img).save(path)
        if not UPDATE:
            pytest.skip(f"golden {name} created; commit it")
        return
    ref = np.asarray(Image.open(path))
    assert ref.shape == img.shape, (
        f"golden {name} shape {ref.shape} vs render {img.shape}")
    mean, p99 = _perceptual_diff(ref, img)
    # tolerances: jitter-grid noise and cross-version XLA drift stay
    # well under these; a shading regression (wrong light, missing
    # pass, broken texture fetch) blows through them
    assert mean < 0.010, f"{name}: mean perceptual diff {mean:.4f}"
    assert p99 < 0.060, f"{name}: p99 perceptual diff {p99:.4f}"


def test_golden_cornell_allon():
    img = _render_allon("resources/cornell.gltf", frames=4)
    _check_golden("cornell_allon_448x256", img)


def test_golden_courtyard_allon():
    path = "resources/courtyard.glb"
    if not os.path.exists(path):
        from toyrenderer_tpu.tools.gen_scene import build
        build(path, compress=True)
    img = _render_allon(path, frames=3, culling=True, exposure=0.25)
    _check_golden("courtyard_allon_448x256", img)
