"""GTAO tests on analytic scenes (floor + wall)."""

import numpy as np
import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops.gtao import gtao
from toyrenderer_tpu.mathlib import perspective_reverse_z_infinite, look_at
from toyrenderer_tpu.ops.sky import view_rays

W = H = 128


def _floor_wall_scene():
    """Analytic depth/normal buffers: floor y=0 meeting wall z=-1."""
    vp = perspective_reverse_z_infinite(np.radians(60), 1.0, 0.1) @ \
        look_at([0, 1, 3], [0, 1, 0], [0, 1, 0])
    ivp = jnp.asarray(np.linalg.inv(vp))
    rays = view_rays(ivp, W, H)
    cam = jnp.asarray([0.0, 1.0, 3.0])
    t_floor = jnp.where(rays[..., 1] < -1e-4,
                        -cam[1] / rays[..., 1], jnp.inf)
    t_wall = jnp.where(rays[..., 2] < -1e-4,
                       (-1.0 - cam[2]) / rays[..., 2], jnp.inf)
    t = jnp.minimum(t_floor, t_wall)
    hitf = t_floor < t_wall
    pos = cam + rays * t[..., None]
    normal = jnp.where(hitf[..., None], jnp.asarray([0.0, 1.0, 0.0]),
                       jnp.asarray([0.0, 0.0, 1.0]))
    zfwd = jnp.sum((pos - cam) * jnp.asarray([0.0, 0.0, -1.0]), -1)
    depth = jnp.where(jnp.isfinite(t),
                      0.1 / jnp.maximum(zfwd, 1e-4), 0.0)
    return depth, normal, cam, ivp, np.asarray(hitf)


def test_gtao_corner_darker_than_open():
    depth, normal, cam, ivp, hitf = _floor_wall_scene()
    ao = np.asarray(jax.jit(
        lambda: gtao(depth, normal, cam, ivp, jnp.asarray(0)))())
    assert ao.shape == (H, W)
    assert np.isfinite(ao).all()
    assert (ao >= 0).all() and (ao <= 1).all()
    seam = np.where(~hitf[:, W // 2])[0].max()
    corner = ao[seam + 1:seam + 5, 40:88].mean()
    open_floor = ao[H - 20:H - 4, 40:88].mean()
    wall_high = ao[8:24, 40:88].mean()
    assert corner < open_floor - 0.03
    assert wall_high > 0.85
    assert open_floor > 0.6


def test_gtao_sky_is_open():
    depth, normal, cam, ivp, _ = _floor_wall_scene()
    depth = depth.at[:8].set(0.0)      # force a sky band
    ao = np.asarray(gtao(depth, normal, cam, ivp, jnp.asarray(0)))
    assert (ao[:8] == 1.0).all()


def test_gtao_temporal_rotation_changes():
    depth, normal, cam, ivp, _ = _floor_wall_scene()
    a = np.asarray(gtao(depth, normal, cam, ivp, jnp.asarray(0)))
    b = np.asarray(gtao(depth, normal, cam, ivp, jnp.asarray(3)))
    assert np.abs(a - b).mean() > 1e-4   # slices rotate across frames
    assert np.abs(a - b).mean() < 0.2    # but estimate stays stable
