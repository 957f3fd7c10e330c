"""Analytic daylight sky + sun disc.

Capability counterpart of the reference's Hosek-Wilkie sky pass
(source/SkyRenderer.cpp + the vendored HosekDataRGB.h dataset).  We use the
Preetham et al. analytic model instead — closed-form (no 4k-line fitted
dataset to vendor) and visually close for clear-sky turbidities — plus the
same depth-tested full-screen composite and a sun disc.

All functions are elementwise jnp over (..., 3) ray directions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SUN_ANGULAR_RADIUS = np.radians(0.265)


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
