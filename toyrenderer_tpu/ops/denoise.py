"""Temporal + spatial denoiser for 1-spp stochastic signals (shadow mask,
later AO / GI).

Capability stand-in for the vendored NRD SIGMA_SHADOW pipeline the
reference dispatches (ShadowMaskRenderer.cpp:405-532): motion-reprojected
exponential temporal accumulation with neighborhood clamping, then a
depth-aware separable spatial blur.  All dense VPU-friendly image ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops.taa import _sample_bilinear


def temporal_accumulate(signal, motion, history, history_valid,
                        depth, prev_depth, blend: float = 0.9,
                        depth_tolerance: float = 0.1):
    """Reproject scalar history along motion vectors and blend.

    Disocclusion check: reprojected previous depth must match the current
    depth within a relative tolerance, else the history is rejected
    (reverse-Z planes compared in 1/depth space ~ view distance).

    The reprojection resample runs at HALF resolution: per-pixel history
    gathers are random-access bound (~10 ms at 1080p — XLA lays the pack
    table out column-major, so every row costs one access per column),
    while the shadow/AO history is a low-frequency signal that feeds a
    spatial blur anyway.  Quarter-rate gathers from a quarter-size table
    cut the cost ~4x; the result quad-expands back to full res.
    """
    h, w = signal.shape
    if h % 2 or w % 2:
        return _temporal_accumulate_full(
            signal, motion, history, history_valid, depth, prev_depth,
            blend, depth_tolerance)
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    prev_y = py - motion[..., 1] - 0.5
    prev_x = px - motion[..., 0] - 0.5

    def avgpool(a):
        return jax.lax.reduce_window(a, 0.0, jax.lax.add,
                                     (2, 2), (2, 2), 'VALID') * 0.25

    pack_h = jnp.stack([avgpool(history), avgpool(prev_depth)], -1)
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    fast = jnp.zeros((h, w), bool)
    if on_tpu and min(h, w) >= 128:
        # Pallas bounded-displacement warp (see ops/warp_pallas.py):
        # replaces the latency-bound half-res history gather with dense
        # VPU tile math; history beyond the clamp reach is rejected the
        # same way TAA rejects fast motion.
        from toyrenderer_tpu.ops.warp_pallas import MAX_DISP, warp_bilinear
        mot_h = jnp.stack([avgpool(motion[..., 0]) * 0.5,
                           avgpool(motion[..., 1]) * 0.5], -1)
        both_h = warp_bilinear(pack_h, mot_h)
        lim = 2.0 * (MAX_DISP - 1.0)     # full-res pixels of reach
        fast = (jnp.abs(motion[..., 0]) > lim) | \
               (jnp.abs(motion[..., 1]) > lim)
    else:
        both_h = _sample_bilinear(pack_h,
                                  (avgpool(prev_y) - 0.5) * 0.5,
                                  (avgpool(prev_x) - 0.5) * 0.5)
    both = jnp.repeat(jnp.repeat(both_h, 2, 0), 2, 1)
    hist = both[..., 0]
    pdepth = both[..., 1]

    off = ((prev_y < 0) | (prev_y > h - 1) | (prev_x < 0)
           | (prev_x > w - 1) | fast)
    # compare linear view distances (dist = znear/depth up to a constant)
    safe = jnp.maximum(depth, 1e-8)
    psafe = jnp.maximum(pdepth, 1e-8)
    rel = jnp.abs(1.0 / safe - 1.0 / psafe) * safe
    disoccluded = (rel > depth_tolerance) | (pdepth <= 0.0) | (depth <= 0.0)

    alpha = jnp.where(off | disoccluded, 0.0, blend * history_valid)
    out = signal * (1.0 - alpha) + hist * alpha
    return out


def _temporal_accumulate_full(signal, motion, history, history_valid,
                              depth, prev_depth, blend,
                              depth_tolerance):
    """Full-rate reference reprojection (odd dimensions / tests)."""
    h, w = signal.shape
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    prev_y = py - motion[..., 1] - 0.5
    prev_x = px - motion[..., 0] - 0.5
    both = _sample_bilinear(
        jnp.stack([history, prev_depth], -1), prev_y, prev_x)
    hist = both[..., 0]
    pdepth = both[..., 1]
    off = ((prev_y < 0) | (prev_y > h - 1) | (prev_x < 0)
           | (prev_x > w - 1))
    safe = jnp.maximum(depth, 1e-8)
    psafe = jnp.maximum(pdepth, 1e-8)
    rel = jnp.abs(1.0 / safe - 1.0 / psafe) * safe
    disoccluded = (rel > depth_tolerance) | (pdepth <= 0.0) | (depth <= 0.0)
    alpha = jnp.where(off | disoccluded, 0.0, blend * history_valid)
    return signal * (1.0 - alpha) + hist * alpha


def depth_aware_blur(signal, depth, radius: int = 2,
                     depth_sigma: float = 0.05, sigma: float = 1.5):
    """Separable cross-bilateral blur weighted by depth similarity."""
    def pass_1d(x, d, axis):
        acc = jnp.zeros_like(x)
        wacc = jnp.zeros_like(x)
        inv_d = 1.0 / jnp.maximum(d, 1e-8)
        for k in range(-radius, radius + 1):
            xs = jnp.roll(x, k, axis=axis)
            ds = jnp.roll(d, k, axis=axis)
            inv_ds = 1.0 / jnp.maximum(ds, 1e-8)
            wd = jnp.exp(-jnp.abs(inv_d - inv_ds) * d / depth_sigma)
            wg = jnp.exp(-0.5 * (k / sigma) ** 2)
            # the center tap always contributes (sky/background pixels have
            # depth 0 and would otherwise divide by zero weight)
            wk = wg * jnp.where((ds > 0.0) | (k == 0), wd, 0.0)
            acc = acc + xs * wk
            wacc = wacc + wk
        return acc / jnp.maximum(wacc, 1e-8)

    out = pass_1d(signal, depth, axis=1)
    return pass_1d(out, depth, axis=0)


def denoise_shadow(raw, motion, history, history_valid, depth, prev_depth,
                   blur_radius: int = 2):
    """Full SIGMA-style chain: temporal accumulate -> spatial blur.
    Returns (denoised, new_history)."""
    acc = temporal_accumulate(raw, motion, history, history_valid,
                              depth, prev_depth)
    out = depth_aware_blur(acc, depth, radius=blur_radius)
    return jnp.clip(out, 0.0, 1.0), acc
