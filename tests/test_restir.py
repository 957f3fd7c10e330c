"""ReSTIR DI tests: emissive area lighting with reservoir resampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.ops import restir as R
from toyrenderer_tpu.ops import bvh as B


def _emissive_panel_scene():
    """A floor receiving light from an emissive quad above it."""
    # emissive quad at y=3, x,z in [-1,1]; plus a floor occluder piece
    tris = np.asarray([
        [[-1, 3, -1], [1, 3, -1], [1, 3, 1]],
        [[-1, 3, -1], [1, 3, 1], [-1, 3, 1]],
        # blocker at y=1.5 halfway between the panel (x~0) and receivers
        # at x~3: covers x in [0.2, 2.8]
        [[0.2, 1.5, -3], [2.8, 1.5, -3], [2.8, 1.5, 3]],
        [[0.2, 1.5, -3], [2.8, 1.5, 3], [0.2, 1.5, 3]],
    ], np.float32)
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    valid = jnp.ones((4,), bool)
    bvh = B.build_bvh(v0, v1, v2, valid)
    emission = jnp.asarray([[5.0, 5.0, 5.0]] * 2 + [[0.0, 0.0, 0.0]] * 2)
    e1 = v1 - v0
    e2 = v2 - v0
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    lum = jnp.sum(emission, -1)
    lights = dict(v0=v0[:2], e1=e1[:2], e2=e2[:2],
                  emission=emission[:2], area=area[:2],
                  valid=jnp.ones((2,), bool), count=jnp.asarray(2))
    return bvh, lights


def test_restir_lights_floor_under_panel():
    bvh, lights = _emissive_panel_scene()
    h, w = 8, 32
    xs = np.linspace(-4, 4, w, dtype=np.float32)
    wp = np.zeros((h, w, 3), np.float32)
    wp[..., 0] = xs[None, :]
    wp[..., 2] = np.linspace(-0.5, 0.5, h, dtype=np.float32)[:, None]
    normal = np.zeros_like(wp)
    normal[..., 1] = 1.0
    albedo = np.full((h, w, 3), 0.8, np.float32)

    acc = np.zeros((h, w, 3), np.float32)
    res = None
    n_frames = 16
    for f in range(n_frames):
        lit, res = R.restir_di(
            bvh, lights, jnp.asarray(wp), jnp.asarray(normal),
            jnp.asarray(albedo), jnp.ones((h, w), bool),
            jnp.asarray(f), prev_reservoir=res,
            motion=jnp.zeros((h, w, 2)))
        acc += np.asarray(lit)
    acc /= n_frames
    assert np.isfinite(acc).all()
    under = acc[:, np.abs(xs) < 0.8].mean()      # directly under panel
    far = acc[:, xs < -3.0].mean()               # far away
    assert under > far * 2.0
    assert under > 0.01


def test_restir_respects_occlusion():
    bvh, lights = _emissive_panel_scene()
    h, w = 4, 8
    # points under the blocker (x=3) vs beside it (x=4.5) — both offset
    # from the panel; the blocker shadows the panel for x~3
    wp = np.zeros((h, w, 3), np.float32)
    wp[..., 0] = np.linspace(2.6, 3.4, w, dtype=np.float32)[None, :]
    normal = np.zeros_like(wp)
    normal[..., 1] = 1.0
    albedo = np.full((h, w, 3), 0.8, np.float32)
    acc = 0
    res = None
    for f in range(8):
        lit, res = R.restir_di(
            bvh, lights, jnp.asarray(wp), jnp.asarray(normal),
            jnp.asarray(albedo), jnp.ones((h, w), bool), jnp.asarray(f),
            prev_reservoir=res, motion=jnp.zeros((h, w, 2)))
        acc = acc + np.asarray(lit)
    # blocker at y=1.5 covers x in [2.5, 3.5] -> panel fully occluded...
    # (rays toward the panel at y=3 from x~3 pass through the blocker)
    assert acc.mean() < 1e-3


def test_collect_emissive_lights():
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.ops import geometry as G
    s = make_stress_scene(n_objects=24, sphere_res=8, seed=3)
    d = s.to_device()
    world = G.node_world_matrices(d, d.node_translation, d.node_rotation,
                                  d.node_scale)
    iw, _ = G.instance_transforms(d, world)
    pi, pm = G.static_meshlet_pairs(s)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    v0, v1, v2, valid = B.world_triangles(d, iw, pi, pm)
    lights = R.collect_emissive_lights(d, pi, pm, v0, v1, v2,
                                       max_lights=512)
    n = int(lights['count'])
    # the stress scene has emissive materials (every 7th)
    assert n > 0
    em = np.asarray(lights['emission'])[:n]
    assert (em.sum(-1) > 0).all()
    assert (np.asarray(lights['area'])[:n] > 0).all()


def _many_lights_scene(n_side=4):
    """A grid of n^2 small emissive panels of very different strengths —
    the regime spatial reuse is FOR (few candidates can't find the
    important lights; neighbors pool their discoveries).  No occluders."""
    quads = []
    emis = []
    rng = np.random.default_rng(3)
    for i in range(n_side):
        for j in range(n_side):
            cx = -3.0 + 6.0 * i / (n_side - 1)
            cz = -3.0 + 6.0 * j / (n_side - 1)
            s = 0.25
            quads.append([[cx - s, 3, cz - s], [cx + s, 3, cz - s],
                          [cx + s, 3, cz + s]])
            quads.append([[cx - s, 3, cz - s], [cx + s, 3, cz + s],
                          [cx - s, 3, cz + s]])
            e = float(rng.uniform(0.05, 1.0)) ** 4 * 50.0
            emis += [[e, e, e]] * 2
    tris = np.asarray(quads, np.float32)
    v0, v1, v2 = (jnp.asarray(tris[:, k]) for k in range(3))
    n = tris.shape[0]
    bvh = B.build_bvh(v0, v1, v2, jnp.ones((n,), bool))
    emission = jnp.asarray(emis, jnp.float32)
    e1 = v1 - v0
    e2 = v2 - v0
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    lights = dict(v0=v0, e1=e1, e2=e2, emission=emission, area=area,
                  valid=jnp.ones((n,), bool), count=jnp.asarray(n))
    return bvh, lights


def test_restir_spatial_reuse_reduces_variance():
    """With many lights and few candidates, spatial resampling must cut
    per-pixel estimator noise (neighbors pool their light discoveries)
    without shifting the mean."""
    bvh, lights = _many_lights_scene()
    h, w = 16, 32
    wp = np.zeros((h, w, 3), np.float32)
    wp[..., 0] = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    wp[..., 2] = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    normal = np.zeros_like(wp)
    normal[..., 1] = 1.0
    albedo = np.full((h, w, 3), 0.8, np.float32)
    args = (bvh, lights, jnp.asarray(wp), jnp.asarray(normal),
            jnp.asarray(albedo), jnp.ones((h, w), bool))

    def run(n_spatial, frames=8):
        # temporal reuse OFF: converged temporal reservoirs already pool
        # many frames, masking the single-frame gain this test measures
        acc = []
        for f in range(frames):
            lit, _ = R.restir_di(
                *args, jnp.asarray(f), prev_reservoir=None,
                motion=None, num_candidates=1,
                num_spatial=n_spatial, spatial_radius=6.0)
            acc.append(np.asarray(lit).sum(-1))
        return np.stack(acc)

    plain = run(0)
    spatial = run(4)
    assert np.isfinite(plain).all() and np.isfinite(spatial).all()
    # same energy (unbiased-ish combine)...
    m0, m1 = plain.mean(), spatial.mean()
    assert abs(m1 - m0) < 0.25 * m0
    # ...but lower NOISE: per-pixel variation across frames (the scene
    # and camera are static, so temporal std is pure estimator noise;
    # image-space std would conflate the lighting gradient)
    v0 = plain.std(axis=0).mean()
    v1 = spatial.std(axis=0).mean()
    assert v1 < v0 * 0.8, (v0, v1)
