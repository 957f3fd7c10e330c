"""Ground-truth ambient occlusion (GTAO).

Capability counterpart of the reference's XeGTAO pass
(source/AmbientOcclusionRenderer.cpp + the vendored XeGTAO.hlsli): horizon-
based AO from the depth buffer + normals, followed by an edge-aware
denoise; consumed by deferred lighting to modulate ambient/GI
(deferredlighting.hlsl).

TPU-first redesign: instead of per-pixel noise-rotated slice directions
(gather-heavy), slice directions and step ladders are UNIFORM across the
frame and rotate by the golden angle per frame — every depth sample becomes
a whole-image shift (pure streaming VPU work, no gathers), and the temporal
rotation is integrated by the TAA/denoise chain.  The horizon integral is
the standard GTAO arc formula (Jimenez et al. 2016), reimplemented from the
paper.

De-banding: frame-uniform slices turn horizon quantization into rings on
flat surfaces (the reference's XeGTAO uses per-pixel Hilbert noise
rotations instead, AmbientOcclusionRenderer.cpp:44-71).  We dither the
falloff RADIUS per pixel with interleaved-gradient noise — zero extra
samples — which converts the rings into high-frequency noise the
depth-aware blur + temporal chain remove.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_ANGLE = 2.399963229728653


def _shift2d(img, dy: int, dx: int):
    """Shift with edge-clamp (static offsets -> pure slicing)."""
    h, w = img.shape[:2]
    y0 = np.clip(dy, 0, None)
    x0 = np.clip(dx, 0, None)
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))) + \
        (((0, 0),) * (img.ndim - 2))
    p = jnp.pad(img, pad, mode='edge')
    return p[y0:y0 + h, x0:x0 + w]


def gtao(depth, normal_world, cam_pos, inv_view_proj, frame_index,
         radius: float = 1.5, n_slices: int = 3, n_steps: int = 5,
         power: float = 1.2, radius_dither: float = 0.6,
         checker_phases: bool = True, checker_b_slices: int = 0):
    """Compute AO (H, W) in [0, 1] (1 = fully open).

    Args:
      depth: (H, W) reverse-Z
      normal_world: (H, W, 3)
      cam_pos: (3,), inv_view_proj: (4, 4) (unjittered)
      frame_index: i32 scalar for the golden-angle temporal rotation
    """
    from toyrenderer_tpu.ops.lighting import world_pos_from_depth
    h, w = depth.shape
    hit = depth > 0.0
    pos = world_pos_from_depth(depth, inv_view_proj, w, h)
    v = cam_pos - pos
    dist = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    v = v / dist                                        # view dir (to eye)
    if radius_dither > 0.0:
        from toyrenderer_tpu.ops.shadows import interleaved_gradient_noise
        ign = interleaved_gradient_noise(h, w, frame_index + 31)
        radius_px = radius * (1.0 - 0.5 * radius_dither
                              + radius_dither * ign)
    else:
        radius_px = jnp.full((h, w), radius)
    if not checker_phases:
        return _gtao_static(depth, pos, normal_world, v, hit, frame_index,
                            radius_px, n_slices, n_steps, power)
    # 2x2-checkerboard phase mixing: adjacent pixels evaluate slice
    # rotations half the phase wheel apart, so horizon quantization bands
    # decorrelate at pixel scale (the reference's per-pixel Hilbert-noise
    # rotation achieves the same; AmbientOcclusionRenderer.cpp:44-71).
    # Costs one extra AO evaluation; every sample stays a static shift.
    # checker_b_slices < n_slices evaluates phase B with fewer slices
    # (it exists only for pixel-scale decorrelation and is blurred +
    # TAA-integrated afterwards).  Measured ~0.7 ms at 1080p for
    # b=ceil(n/2), but at n_slices=3 the 2-slice phase-B estimator is
    # biased enough to FAIL the de-banding quality gate
    # (test_debanding_on_slanted_wall) — so the default stays symmetric
    # and the knob is for supervised experiments only.
    b_slices = checker_b_slices or n_slices
    ao_a = _gtao_static(depth, pos, normal_world, v, hit, frame_index,
                        radius_px, n_slices, n_steps, power)
    ao_b = _gtao_static(depth, pos, normal_world, v, hit,
                        frame_index + _N_ROT_PHASES // 2,
                        radius_px, b_slices, n_steps, power)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    checker = ((xx ^ yy) & 1) == 0
    return jnp.where(checker, ao_a, ao_b)


_N_ROT_PHASES = 8


def _gtao_static(depth, pos, normal, v, hit, frame_index, radius,
                 n_slices, n_steps, power):
    """GTAO with lax.switch over quantized per-frame rotations so all
    depth/position samples are STATIC image shifts."""
    h, w = depth.shape

    def make_variant(phase: int):
        def variant(_):
            base = phase * (np.pi / n_slices / _N_ROT_PHASES)
            ao = jnp.zeros((h, w), jnp.float32)
            for s in range(n_slices):
                phi = base + s * (np.pi / n_slices)
                dxu, dyu = np.cos(phi), np.sin(phi)
                ao = ao + _slice_ao(pos, normal, v, dxu, dyu,
                                    n_steps, radius)
            return ao / n_slices
        return variant

    def _slice_ao(pos, normal, v, dxu, dyu, n_steps, radius):
        h_, w_ = pos.shape[:2]
        cos_h1 = jnp.full((h_, w_), -1.0)
        cos_h2 = jnp.full((h_, w_), -1.0)
        for k in range(n_steps):
            r = 1 << k
            dx = int(np.round(dxu * r))
            dy = int(np.round(dyu * r))
            if dx == 0 and dy == 0:
                dx = 1
            for sign, _ in ((1, None), (-1, None)):
                sp = _shift2d(pos, sign * dy, sign * dx)
                d = sp - pos
                dl = jnp.linalg.norm(d, axis=-1)
                falloff = jnp.clip(1.0 - dl / radius, 0.0, 1.0)
                # `radius` is per-pixel (IGN-dithered) — see gtao()
                cos_a = jnp.sum(d * v, -1) / jnp.maximum(dl, 1e-6)
                cos_a = cos_a * falloff + (-1.0) * (1.0 - falloff)
                # sign=+1 shifts along +t (the tangent is built from the
                # +1px sample), so it bounds the POSITIVE horizon h2
                if sign > 0:
                    cos_h2 = jnp.maximum(cos_h2, cos_a)
                else:
                    cos_h1 = jnp.maximum(cos_h1, cos_a)

        # slice plane: build tangent direction t = normalize(component of
        # world direction between +1px sample and center, orthogonal to v)
        sp1 = _shift2d(pos, int(np.round(dyu)) or 0,
                       int(np.round(dxu)) or 1)
        t = sp1 - pos
        t = t - v * jnp.sum(t * v, -1, keepdims=True)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                            1e-6)
        # project the normal onto the slice plane (v, t)
        n_v = jnp.sum(normal * v, -1)
        n_t = jnp.sum(normal * t, -1)
        n_len = jnp.sqrt(jnp.maximum(n_v * n_v + n_t * n_t, 1e-12))
        gamma = jnp.arctan2(n_t, jnp.maximum(n_v, 1e-6))

        h1 = -jnp.arccos(jnp.clip(cos_h1, -1.0, 1.0))   # side of +t
        h2 = jnp.arccos(jnp.clip(cos_h2, -1.0, 1.0))
        # clamp horizons to the hemisphere around the normal
        h1 = gamma + jnp.maximum(h1 - gamma, -0.5 * np.pi)
        h2 = gamma + jnp.minimum(h2 - gamma, 0.5 * np.pi)
        arc = (0.25 * (-jnp.cos(2.0 * h1 - gamma) + jnp.cos(gamma)
                       + 2.0 * h1 * jnp.sin(gamma))
               + 0.25 * (-jnp.cos(2.0 * h2 - gamma) + jnp.cos(gamma)
                         + 2.0 * h2 * jnp.sin(gamma)))
        return n_len * arc

    phase = (frame_index % _N_ROT_PHASES).astype(jnp.int32)
    ao = jax.lax.switch(phase,
                        [make_variant(p) for p in range(_N_ROT_PHASES)],
                        0)
    ao = jnp.clip(ao, 0.0, 1.0) ** power
    return jnp.where(hit, ao, 1.0)
