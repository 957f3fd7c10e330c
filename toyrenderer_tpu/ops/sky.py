"""Analytic daylight sky + sun disc: Hosek-Wilkie (default) + Preetham.

Counterpart of the reference's Hosek-Wilkie sky pass
(source/SkyRenderer.cpp:20-130 evaluates the model's fitted dataset on the
CPU per frame; sky.hlsl:10-49 evaluates the 10-parameter F formula per
pixel).  Same split here: `hosek_sky_params` runs host-side (numpy) each
frame, `sky_radiance_hosek` is the per-ray jnp formula.  The fitted RGB
dataset (Hosek & Wilkie, SIGGRAPH 2012; 3-clause BSD) is packed into
hosek_data.npz by tools/gen_hosek.py.  The closed-form Preetham model
remains as a datafile-free fallback.

All radiance functions are elementwise jnp over (..., 3) ray directions.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np

SUN_ANGULAR_RADIUS = np.radians(0.265)

# ---------------------------------------------------------------------------
# Hosek-Wilkie
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def load_hosek_data():
    """(rgb (3,2,10,6,9), rad (3,2,10,6)) f32 or None if not generated."""
    path = Path(__file__).parent / "hosek_data.npz"
    if not path.exists():
        return None
    d = np.load(path)
    return d["rgb"].astype(np.float64), d["rad"].astype(np.float64)


def _bezier5(ctrl, x, axis: int):
    """Quintic bezier over 6 control points along `axis`
    (SkyRenderer.cpp:42-52 EvaluateSpline parity)."""
    c = [1, 5, 10, 10, 5, 1]
    return sum(c[i] * (1 - x) ** (5 - i) * x ** i
               * np.take(ctrl, i, axis=axis) for i in range(6))


def hosek_sky_params(turbidity: float, sun_dir_to_light,
                     ground_albedo: float = 0.1) -> np.ndarray:
    """(10, 3) f32 Hosek parameters A..I + normalized Z for this frame's
    sun elevation (host-side numpy; CalculateSkyParameters parity,
    SkyRenderer.cpp:55-128).  Falls back to zeros when the dataset is
    missing (callers then use Preetham)."""
    data = load_hosek_data()
    if data is None:
        return np.zeros((10, 3), np.float32)
    rgb, rad = data                               # (3,2,10,6,9), (3,2,10,6)
    sun_theta = float(np.arccos(np.clip(sun_dir_to_light[1], 0.0, 1.0)))
    elev_k = max(0.0, 1.0 - sun_theta / (np.pi * 0.5)) ** (1.0 / 3.0)
    t0 = int(np.clip(int(turbidity), 1, 10))
    t1 = min(t0 + 1, 10)
    tk = float(np.clip(turbidity - t0, 0.0, 1.0))
    a = float(np.clip(ground_albedo, 0.0, 1.0))

    def blend(arr):                               # (3, 2, 10, 6[, 9])
        s0 = _bezier5(arr[:, :, t0 - 1], elev_k, axis=2)   # (3, 2[, 9])
        s1 = _bezier5(arr[:, :, t1 - 1], elev_k, axis=2)
        s = s0 * (1 - tk) + s1 * tk
        return s[:, 0] * (1 - a) + s[:, 1] * a    # (3[, 9])

    coeffs = blend(rgb)                           # (3, 9)
    z = blend(rad)                                # (3,)
    params = np.zeros((10, 3), np.float64)
    params[0:7] = coeffs[:, 0:7].T
    # dataset slots 7/8 are swapped vs the formula's H/I
    params[7] = coeffs[:, 8]
    params[8] = coeffs[:, 7]
    params[9] = z
    # Z normalization, reproducing the reference EXACTLY
    # (SkyRenderer.cpp:74-90,120-124): its CPU-side F drops the "1 +" in
    # the first factor and uses gamma^2 (not cos^2 gamma), which makes
    # S·lum NEGATIVE for daylight coefficients — hence the shader's
    # R = -Z * F coming out positive (sky.hlsl:40).
    s = _hosek_f_cpu_ref(np.cos(sun_theta), 0.0, 1.0, params) * params[9]
    lum = float(np.dot(s, [0.2126, 0.7152, 0.0722]))
    params[9] = params[9] / (lum if abs(lum) > 1e-9 else 1e-9)
    return params.astype(np.float32)


def _hosek_f_cpu_ref(cos_theta, gamma, cos_gamma, p):
    """The reference's CPU-side HosekWilkie() used only for Z
    normalization (SkyRenderer.cpp:74-90) — note: no '1 +', gamma^2."""
    a, b, c, d, e, f, g, h, i = (p[k] for k in range(9))
    chi = (1 + cos_gamma * cos_gamma) / np.power(
        1 + h * h - 2 * cos_gamma * h, 1.5)
    return ((a * np.exp(b / (cos_theta + 0.01)))
            * (c + d * np.exp(e * gamma) + f * gamma * gamma
               + g * chi + i * np.sqrt(max(cos_theta, 0.0))))


def sky_radiance_hosek(view_dir, sun_dir_to_light, params,
                       sun_intensity: float = 1.0,
                       exposure_scale: float = 1.5):
    # exposure_scale calibrated so hemisphere-average radiance matches the
    # Preetham path's tuning (scene HDR units are shared by both models)
    """Per-ray Hosek-Wilkie radiance (sky.hlsl:10-49 parity: R = -Z * F
    plus a pow-256 sun glow; our hard sun disc rides on top for bloom).

    params: (10, 3) from hosek_sky_params.
    """
    cos_theta = jnp.clip(view_dir[..., 1], 0.0, 1.0)
    cos_gamma = jnp.clip(
        jnp.sum(view_dir * sun_dir_to_light, -1), -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)

    p = params
    a, b, c, d, e = p[0], p[1], p[2], p[3], p[4]
    f, g, h, i, z = p[5], p[6], p[7], p[8], p[9]
    cg = cos_gamma[..., None]
    ct = cos_theta[..., None]
    chi = (1.0 + cg * cg) / jnp.power(
        jnp.maximum(1.0 + h * h - 2.0 * cg * h, 1e-6), 1.5)
    fval = ((1.0 + a * jnp.exp(b / (ct + 0.01)))
            * (c + d * jnp.exp(e * gamma[..., None]) + f * cg * cg
               + g * chi + i * jnp.sqrt(jnp.maximum(ct, 0.0))))
    rgb = jnp.maximum(-z * fval, 0.0) * (exposure_scale * sun_intensity)

    # sun glow (reference: pow(cos_gamma, 256) * 0.5) + hard disc.  The
    # disc uses the same absolute brightness as the Preetham path
    # (200 x 0.035) so tonemap/bloom behave identically across models.
    glow = jnp.where(cos_gamma > 0.0,
                     jnp.power(jnp.maximum(cos_gamma, 0.0), 256.0) * 0.5,
                     0.0)[..., None] * (0.035 * sun_intensity)
    in_disc = gamma < SUN_ANGULAR_RADIUS
    sun_rgb = jnp.asarray([1.0, 0.96, 0.92]) * (200.0 * 0.035
                                                * sun_intensity)
    rgb = rgb + glow
    rgb = jnp.where(in_disc[..., None] & (view_dir[..., 1:2] > 0.0),
                    rgb + sun_rgb, rgb)
    return rgb


def _perez(theta_cos, gamma, gamma_cos, coeff):
    a, b, c, d, e = coeff
    return ((1.0 + a * jnp.exp(b / jnp.maximum(theta_cos, 0.01)))
            * (1.0 + c * jnp.exp(d * gamma) + e * gamma_cos * gamma_cos))


def _zenith_chromaticity(t, theta_s):
    """Preetham zenith luminance (Kcd/m^2) and CIE x,y chromaticity."""
    chi = (4.0 / 9.0 - t / 120.0) * (np.pi - 2.0 * theta_s)
    yz = ((4.0453 * t - 4.9710) * jnp.tan(chi) - 0.2155 * t + 2.4192)
    t2, s = t * t, theta_s
    s2, s3 = s * s, s * s * s
    xz = ((0.00166 * s3 - 0.00375 * s2 + 0.00209 * s) * t2
          + (-0.02903 * s3 + 0.06377 * s2 - 0.03202 * s + 0.00394) * t
          + (0.11693 * s3 - 0.21196 * s2 + 0.06052 * s + 0.25886))
    yzc = ((0.00275 * s3 - 0.00610 * s2 + 0.00317 * s) * t2
           + (-0.04214 * s3 + 0.08970 * s2 - 0.04153 * s + 0.00516) * t
           + (0.15346 * s3 - 0.26756 * s2 + 0.06670 * s + 0.26688))
    return jnp.maximum(yz, 0.0), xz, yzc


def _perez_coeffs(t):
    cy = (0.1787 * t - 1.4630, -0.3554 * t + 0.4275, -0.0227 * t + 5.3251,
          0.1206 * t - 2.5771, -0.0670 * t + 0.3703)
    cx = (-0.0193 * t - 0.2592, -0.0665 * t + 0.0008, -0.0004 * t + 0.2125,
          -0.0641 * t - 0.8989, -0.0033 * t + 0.0452)
    cyc = (-0.0167 * t - 0.2608, -0.0950 * t + 0.0092, -0.0079 * t + 0.2102,
           -0.0441 * t - 1.6537, -0.0109 * t + 0.0529)
    return cy, cx, cyc


def _xyy_to_linear_srgb(big_y, x, y):
    y_safe = jnp.maximum(y, 1e-6)
    big_x = x / y_safe * big_y
    big_z = (1.0 - x - y) / y_safe * big_y
    r = 3.2406 * big_x - 1.5372 * big_y - 0.4986 * big_z
    g = -0.9689 * big_x + 1.8758 * big_y + 0.0415 * big_z
    b = 0.0557 * big_x - 0.2040 * big_y + 1.0570 * big_z
    return jnp.maximum(jnp.stack([r, g, b], -1), 0.0)


def sky_radiance(view_dir, sun_dir_to_light, turbidity: float = 2.5,
                 exposure_scale: float = 0.035, sun_intensity: float = 1.0):
    """Radiance (..., 3) for rays `view_dir` (unit, pointing away from eye).

    sun_dir_to_light: unit vector surface->sun (i.e. -sun_direction).
    exposure_scale maps the model's kcd/m^2-ish luminance into the scene's
    linear HDR units; tuned so a noon sky with the default exposure looks
    like the reference's.
    """
    up = jnp.array([0.0, 1.0, 0.0])
    # clamp rays below horizon to the horizon band (the reference renders
    # ground geometry below it anyway)
    cos_theta = jnp.maximum(view_dir[..., 1], 0.01)
    theta_s = jnp.arccos(jnp.clip(sun_dir_to_light[1], -1.0, 1.0))
    gamma_cos = jnp.clip(
        jnp.sum(view_dir * sun_dir_to_light, -1), -1.0, 1.0)
    gamma = jnp.arccos(gamma_cos)

    t = turbidity
    cy, cx, cyc = _perez_coeffs(t)
    yz, xz, yzc = _zenith_chromaticity(t, theta_s)

    cos_theta_s = jnp.cos(theta_s)
    def ratio(coeff, zenith):
        num = _perez(cos_theta, gamma, gamma_cos, coeff)
        den = _perez(jnp.asarray(1.0), theta_s, cos_theta_s, coeff)
        return zenith * num / jnp.maximum(den, 1e-6)

    big_y = ratio(cy, yz)
    x = ratio(cx, xz)
    y = ratio(cyc, yzc)
    rgb = _xyy_to_linear_srgb(big_y, x, y) * exposure_scale * sun_intensity

    # sun disc (sharp-edged; the bloom pass softens it)
    in_disc = gamma < SUN_ANGULAR_RADIUS
    sun_rgb = jnp.asarray([1.0, 0.96, 0.92]) * (200.0 * sun_intensity
                                                * exposure_scale)
    rgb = jnp.where(in_disc[..., None]
                    & (view_dir[..., 1:2] > 0.0), rgb + sun_rgb, rgb)
    return rgb


def view_rays(inv_view_proj, width: int, height: int):
    """Unit world-space ray directions through every pixel center."""
    import jax
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = (0.5 - py / height) * 2.0
    # reverse-Z: any depth works for a direction; use z=0.5
    clip = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5),
                      jnp.ones_like(ndc_x)], -1)
    wp = jnp.einsum('ij,...j->...i', inv_view_proj, clip)
    p = wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:4]) < 1e-20, 1e-20,
                                wp[..., 3:4])
    cam = jnp.einsum('ij,j->i', inv_view_proj,
                     jnp.asarray([0.0, 0.0, 1.0, 1.0]))  # depth 1 == near
    # direction = from camera position through the unprojected point
    cam_pos = cam[:3] / cam[3]
    d = p - cam_pos
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
