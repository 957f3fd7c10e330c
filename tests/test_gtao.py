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


def test_debanding_on_slanted_wall():
    """De-banding quality gate (VERDICT r1 weak #5): the checkerboard
    phase mixing + IGN radius dither, followed by the standard depth-aware
    blur, must land closer to the ALL-PHASE ground truth (mean of every
    slice rotation) than the single-phase (banded) estimator does."""
    import jax.numpy as jnp
    from toyrenderer_tpu.ops.gtao import gtao, _N_ROT_PHASES
    from toyrenderer_tpu.ops.denoise import depth_aware_blur
    from toyrenderer_tpu.mathlib.transforms import (
        perspective_reverse_z_infinite, look_at)

    h, w = 96, 192
    eye = np.asarray([0.0, 1.0, 0.0], np.float32)
    proj = perspective_reverse_z_infinite(1.0, w / h, 0.1)
    view = look_at(eye, np.asarray([0, 0.5, -3.0], np.float32),
                   np.asarray([0, 1.0, 0], np.float32))
    vp = (proj @ view).astype(np.float32)
    inv_vp = np.linalg.inv(vp)

    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = (0.5 - (np.arange(h) + 0.5) / h) * 2
    gx, gy = np.meshgrid(xs, ys)
    clip = np.stack([gx, gy, np.full((h, w), 0.5),
                     np.ones((h, w))], -1).astype(np.float32)
    pw = clip @ inv_vp.T
    pw = pw[..., :3] / pw[..., 3:4]
    d = pw - eye
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tt = np.where(d[..., 1] < -1e-4, -eye[1] / d[..., 1], np.inf)
    hitm = np.isfinite(tt) & (tt < 50)
    pworld = eye + d * np.where(hitm, tt, 1.0)[..., None]
    box = (np.abs(pworld[..., 0]) < 0.6) & (np.abs(pworld[..., 2] + 3) < 0.6)
    pworld[..., 1] = np.where(box & hitm, 0.5, pworld[..., 1])
    ph_ = np.concatenate([pworld, np.ones((h, w, 1))], -1) @ vp.T
    depth = np.where(hitm, ph_[..., 2] / np.maximum(ph_[..., 3], 1e-6),
                     0.0).astype(np.float32)
    dj = jnp.asarray(depth)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3))

    def run(frame, dither, checker):
        return np.asarray(gtao(
            dj, normal, jnp.asarray(eye), jnp.asarray(inv_vp, jnp.float32),
            jnp.asarray(frame), radius=1.0, radius_dither=dither,
            checker_phases=checker))

    # all-phase ground truth
    ref = np.mean([run(f, 0.0, False) for f in range(_N_ROT_PHASES)], 0)
    banded = run(3, 0.0, False)
    fixed = np.asarray(depth_aware_blur(
        jnp.asarray(run(3, 0.6, True)), dj, radius=2))

    m = hitm
    err_banded = np.abs(banded - ref)[m].mean()
    err_fixed = np.abs(fixed - ref)[m].mean()
    assert err_fixed < err_banded * 0.75, (err_banded, err_fixed)
    assert np.isfinite(fixed).all()
