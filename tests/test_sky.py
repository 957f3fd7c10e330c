"""Sky model tests: Hosek-Wilkie dataset evaluation + Preetham fallback."""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import sky as S


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_hosek_data_present():
    data = S.load_hosek_data()
    assert data is not None, "run tools/gen_hosek.py"
    rgb, rad = data
    assert rgb.shape == (3, 2, 10, 6, 9)
    assert rad.shape == (3, 2, 10, 6)
    assert np.isfinite(rgb).all() and np.isfinite(rad).all()


def test_hosek_elevation_sweep():
    """Physical sanity across a sun-elevation sweep (SkyRenderer.cpp
    parity): noon sky is blue-ish, sunset horizon warm, radiance positive
    and finite everywhere, horizon brighter than zenith for low sun."""
    zen = jnp.asarray([[0.0, 1.0, 0.0]])
    for elev in (0.05, 0.2, 0.5, 0.9):
        sun = _unit([0.6, elev, 0.3])
        p = S.hosek_sky_params(2.0, sun)
        assert np.isfinite(p).all()
        # hemisphere sample grid
        th = np.linspace(0.05, 1.5, 8)
        ph = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        dirs = np.stack([
            (np.sin(th)[:, None] * np.cos(ph)[None]).ravel(),
            np.broadcast_to(np.cos(th)[:, None], (8, 8)).ravel(),
            (np.sin(th)[:, None] * np.sin(ph)[None]).ravel()], -1)
        r = np.asarray(S.sky_radiance_hosek(
            jnp.asarray(dirs, jnp.float32), jnp.asarray(sun, jnp.float32),
            jnp.asarray(p)))
        assert np.isfinite(r).all() and (r >= 0).all()
        assert r.max() > 1e-4          # not black

    # noon: zenith blue dominance
    sun = _unit([0.2, 0.9, 0.1])
    p = S.hosek_sky_params(2.0, sun)
    rz = np.asarray(S.sky_radiance_hosek(
        zen, jnp.asarray(sun, jnp.float32), jnp.asarray(p)))[0]
    assert rz[2] > rz[0]               # blue > red at zenith

    # sunset: horizon away-from-zenith warm + brighter than zenith
    sun = _unit([0.9, 0.08, 0.1])
    p = S.hosek_sky_params(3.0, sun)
    hor = jnp.asarray([_unit([0.95, 0.05, 0.1])], jnp.float32)
    rh = np.asarray(S.sky_radiance_hosek(
        hor, jnp.asarray(sun, jnp.float32), jnp.asarray(p)))[0]
    rz = np.asarray(S.sky_radiance_hosek(
        zen, jnp.asarray(sun, jnp.float32), jnp.asarray(p)))[0]
    assert rh[0] > rh[2]               # red > blue at the sun-side horizon
    assert rh.sum() > rz.sum()         # horizon brighter at sunset


def test_hosek_turbidity_dims_zenith_blue():
    """Hazier sky (higher turbidity) shifts zenith color toward gray."""
    sun = _unit([0.3, 0.7, 0.2])
    zen = jnp.asarray([[0.0, 1.0, 0.0]])
    ratios = []
    for t in (1.5, 6.0):
        p = S.hosek_sky_params(t, sun)
        r = np.asarray(S.sky_radiance_hosek(
            zen, jnp.asarray(sun, jnp.float32), jnp.asarray(p)))[0]
        ratios.append(r[2] / max(r[0], 1e-9))
    assert ratios[1] < ratios[0]


def test_preetham_fallback_still_works():
    sun = jnp.asarray(_unit([0.3, 0.8, 0.2]), jnp.float32)
    v = jnp.asarray([[0.0, 1.0, 0.0], [0.7, 0.1, 0.7]], jnp.float32)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    r = np.asarray(S.sky_radiance(v, sun))
    assert np.isfinite(r).all() and (r >= 0).all() and r.max() > 1e-4
