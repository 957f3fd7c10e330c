"""Physically-based BRDF: Lambert diffuse + GGX/Smith/Schlick specular.

Same shading model family as the reference (lightingcommon.hlsli:86-303):
metallic-roughness workflow, Trowbridge-Reitz (GGX) normal distribution,
height-correlated Smith visibility, Schlick Fresnel.  Written as dense
elementwise jnp ops (VPU-friendly), batched over any leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

DIELECTRIC_F0 = 0.04


def d_ggx(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-8)


def v_smith_ggx_correlated(n_dot_v, n_dot_l, alpha):
    """Height-correlated Smith visibility term (includes the 1/(4 NdotL
    NdotV) denominator)."""
    a2 = alpha * alpha
    lv = n_dot_l * jnp.sqrt(jnp.maximum(
        n_dot_v * n_dot_v * (1.0 - a2) + a2, 1e-12))
    ll = n_dot_v * jnp.sqrt(jnp.maximum(
        n_dot_l * n_dot_l * (1.0 - a2) + a2, 1e-12))
    return 0.5 / jnp.maximum(lv + ll, 1e-8)


def f_schlick(v_dot_h, f0):
    return f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - v_dot_h, 0.0, 1.0), 5.0)


def shade_directional(normal, view_dir, light_dir, albedo, roughness,
                      metallic):
    """Outgoing radiance factor for a directional light of unit irradiance.

    Args (all (..., 3) or (...,)):
      normal: shading normal (unit)
      view_dir: surface -> camera (unit)
      light_dir: surface -> light (unit)
    Returns (..., 3) to be multiplied by light color * intensity * shadow.
    """
    n_dot_l = jnp.maximum(jnp.sum(normal * light_dir, -1), 0.0)
    n_dot_v = jnp.maximum(jnp.sum(normal * view_dir, -1), 1e-4)
    h = normal * 0 + (view_dir + light_dir)
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    n_dot_h = jnp.maximum(jnp.sum(normal * h, -1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(view_dir * h, -1), 0.0)

    alpha = jnp.maximum(roughness * roughness, 1e-3)
    f0 = (DIELECTRIC_F0 * (1.0 - metallic[..., None])
          + albedo * metallic[..., None])
    f = f_schlick(v_dot_h[..., None], f0)
    spec = (d_ggx(n_dot_h, alpha)
            * v_smith_ggx_correlated(n_dot_v, n_dot_l, alpha))[..., None] * f
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo / jnp.pi
    return (diffuse + spec) * n_dot_l[..., None]
