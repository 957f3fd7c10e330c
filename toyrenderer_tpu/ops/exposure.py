"""Auto-exposure: log-luminance histogram + temporal adaptation.

Counterpart of source/AdaptLuminanceRenderer.cpp + adaptluminance.hlsl:
12-97 (256-bin log2-luminance histogram built with groupshared atomics,
then a weighted-mean exposure adaptation compute pass; CPU reads back the
result double-buffered).  TPU design: the histogram is one dense
segment-sum; adaptation is pure arithmetic on the carry — no readback,
the exposure scalar just flows through the frame carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_BINS = 256
MIN_LOG_LUM = -10.0
MAX_LOG_LUM = 6.0
LOG_LUM_RANGE = MAX_LOG_LUM - MIN_LOG_LUM


def luminance(rgb):
    return (rgb[..., 0] * 0.2127 + rgb[..., 1] * 0.7152
            + rgb[..., 2] * 0.0722)


def _bin_indices(hdr):
    lum = luminance(hdr)
    log_lum = jnp.log2(jnp.maximum(lum, 1e-20))
    t = jnp.clip((log_lum - MIN_LOG_LUM) / LOG_LUM_RANGE, 0.0, 1.0)
    return jnp.where(lum < 1e-8, 0,
                     (t * (NUM_BINS - 2) + 1.5).astype(jnp.int32))


def luminance_histogram(hdr):
    """(H, W, 3) HDR -> (256,) f32 histogram.  Bin 0 collects true black
    (same convention as the reference shader).

    Off the per-frame hot path (adapt_exposure computes the weighted mean
    directly): scatter-adds over megapixel index sets serialize on TPU
    (~0.9 ms / 100k updates), so the full histogram is only built for
    HUD/debug consumers."""
    flat = _bin_indices(hdr).reshape(-1)
    return jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.float32), flat, num_segments=NUM_BINS)


def average_log_luminance(hist):
    """Weighted-mean log2 luminance over non-black pixels."""
    idx = jnp.arange(NUM_BINS, dtype=jnp.float32)
    weighted = jnp.sum(hist[1:] * idx[1:])
    n = jnp.maximum(jnp.sum(hist[1:]), 1.0)
    mean_bin = weighted / n
    return (mean_bin - 1.0) / (NUM_BINS - 2) * LOG_LUM_RANGE + MIN_LOG_LUM


def adapt_exposure(hdr, prev_exposure, dt: float = 1.0 / 60.0,
                   adaptation_speed: float = 1.5,
                   key_value: float = 0.18,
                   min_exposure: float = 1e-4,
                   max_exposure: float = 1e4):
    """Returns (new_exposure, aux) given this frame's HDR output.

    exposure = key / avg_luminance, approached exponentially at
    `adaptation_speed` (the reference's eye-adaptation lerp).

    The adaptation consumes only the histogram's WEIGHTED MEAN bin, so it
    is computed directly as a masked mean over per-pixel bin indices (two
    dense reductions) — numerically the same value as the scatter-built
    histogram path, minus the TPU serialized-scatter cost.
    """
    bins = _bin_indices(hdr)
    nonblack = bins > 0
    n = jnp.maximum(jnp.sum(nonblack.astype(jnp.float32)), 1.0)
    mean_bin = jnp.sum(jnp.where(nonblack, bins.astype(jnp.float32),
                                 0.0)) / n
    avg_log = (mean_bin - 1.0) / (NUM_BINS - 2) * LOG_LUM_RANGE \
        + MIN_LOG_LUM
    avg_lum = jnp.exp2(avg_log)
    target = jnp.clip(key_value / jnp.maximum(avg_lum, 1e-8),
                      min_exposure, max_exposure)
    alpha = 1.0 - jnp.exp(-dt * adaptation_speed)
    new_exposure = prev_exposure + (target - prev_exposure) * alpha
    return new_exposure, dict(avg_luminance=avg_lum,
                              target_exposure=target)
