"""Temporal anti-aliasing.

Capability counterpart of source/TAARenderer.cpp, which wraps the DLSS/FSR
vendor SDKs (unavailable off-GPU): a from-scratch temporal accumulator with
motion-vector reprojection, bilinear history sampling, and variance-clip
neighborhood clamping (Karis/Salvi style), consuming the same inputs the
reference feeds its upscalers (color, motion, depth, jitter sequence from
Graphic.cpp:949-998).  Render == display resolution (DLAA-style), matching
the reference's configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_bilinear(img, y, x):
    """Bilinear sample img (H, W, C) at float coords (y, x) arrays.

    Quad-row formulation: the 2x2 footprint of every texel is packed into
    one (H*W, 4C) row (edge-clamped) so each sample is ONE row gather —
    TPU gathers are latency-bound per element, and four scalar gathers per
    channel would dominate every temporal pass (TAA, shadow/AO denoise)."""
    h, w = img.shape[:2]
    c = img.shape[2]
    xp = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    yp = jnp.concatenate([img[1:], img[-1:]], axis=0)
    xyp = jnp.concatenate([yp[:, 1:], yp[:, -1:]], axis=1)
    pack = jnp.concatenate([img, xp, yp, xyp], -1).reshape(h * w, 4 * c)

    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32))
    rows = pack[idx]                                   # (..., 4C)
    a = rows[..., 0 * c:1 * c]
    b = rows[..., 1 * c:2 * c]
    cc = rows[..., 2 * c:3 * c]
    d = rows[..., 3 * c:4 * c]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (cc * (1 - fx)
                                                 + d * fx) * fy


def _neighborhood_moments(color):
    """3x3 mean and stddev per pixel (variance clipping bounds)."""
    p = jnp.pad(color, ((1, 1), (1, 1), (0, 0)), mode='edge')
    acc = jnp.zeros_like(color)
    acc2 = jnp.zeros_like(color)
    h, w = color.shape[:2]
    for dy in range(3):
        for dx in range(3):
            s = p[dy:dy + h, dx:dx + w]
            acc = acc + s
            acc2 = acc2 + s * s
    mean = acc / 9.0
    var = jnp.maximum(acc2 / 9.0 - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


def taa_resolve(color, motion, history, history_valid,
                blend: float = 0.9, clip_gamma: float = 1.0):
    """One TAA step.

    Args:
      color:   (H, W, 3) current jittered HDR frame
      motion:  (H, W, 2) pixel-space motion (cur - prev)
      history: (H, W, 3) accumulated history (HDR)
      history_valid: scalar bool/float — 0 on the first frame
    Returns (output, new_history).
    """
    h, w = color.shape[:2]
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    prev_y = py - motion[..., 1] - 0.5
    prev_x = px - motion[..., 0] - 0.5

    on_tpu = jax.default_backend() in ('tpu', 'axon')
    if on_tpu and min(h, w) >= 64:
        # Pallas warp kernel: the megapixel history gather is latency-
        # bound on TPU (63 ms/frame at 1080p); the bounded-displacement
        # warp runs it as dense VPU tile math.  History beyond the
        # +-MAX_DISP reach is rejected below (fast-motion rejection).
        from toyrenderer_tpu.ops.warp_pallas import MAX_DISP, warp_bilinear
        hist = warp_bilinear(history, motion)
        fast = (jnp.abs(motion[..., 0]) > MAX_DISP - 1.0) | \
               (jnp.abs(motion[..., 1]) > MAX_DISP - 1.0)
    else:
        hist = _sample_bilinear(history, prev_y, prev_x)
        fast = jnp.zeros((h, w), bool)

    mean, sigma = _neighborhood_moments(color)
    lo = mean - sigma * clip_gamma
    hi = mean + sigma * clip_gamma
    hist = jnp.clip(hist, lo, hi)

    off = ((prev_y < 0) | (prev_y > h - 1)
           | (prev_x < 0) | (prev_x > w - 1) | fast)
    alpha = jnp.where(off[..., None], 0.0,
                      blend * history_valid)
    out = color * (1.0 - alpha) + hist * alpha
    return out, out
