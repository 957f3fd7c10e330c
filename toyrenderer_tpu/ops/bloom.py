"""Physically-based bloom: 13-tap Karis downsample + 9-tap tent upsample.

Counterpart of source/BloomRenderer.cpp + bloom.hlsl:16-129 (the
CoD:AW-style mip chain: repeated 13-tap downsamples with a Karis average on
the first level to kill fireflies, then tent-filter upsamples accumulated
back up the chain; default 6 mips).

TPU design notes (all measured on v5e):
* stride-2 lane slicing lowers to megapixel GATHER fusions (~4 ms per
  tap, 88 ms/frame for the chain) — decimation goes through
  `lax.reduce_window` instead (the HZB chain's primitive).
* tiny-channel `lax.conv` is pathological on the TPU backend (seconds
  per call) — stencils are stride-1 shift+fma chains XLA fuses into
  single VPU loop fusions.
* channel-minor (H, W, 3) images draw channel-major-but-H-minor layouts
  through reduce-window (~3 ms per pool) — the whole chain runs PLANAR
  (3, H, W): lanes along W, one 2D plane per channel, pools in-register.

The 13-tap Jimenez pattern factors exactly:
    downsample = avgpool_2x2_s2( img ⊛ [[1,0,1],[0,4,0],[1,0,1]]/8 )
and the tent upsample (bilinear-2x ∘ [1,2,1]/4 tent = [1,5,10,10,5,1]/16
on the 2x-dilated grid) splits into two stride-1 3-tap filters — one for
even, one for odd output texels — interleaved by reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_MIPS = 6


def _pad_edge(img, t, b, l, r):
    return jnp.pad(img, ((0, 0), (t, b), (l, r)), mode='edge')


def _avgpool2(img):
    """(C, H, W) -> (C, H/2, W/2) 2x2 average, H/W even."""
    return lax.reduce_window(img, 0.0, lax.add, (1, 2, 2), (1, 2, 2),
                             'VALID') * 0.25


def _pad_even(img):
    h, w = img.shape[1:]
    return _pad_edge(img, 0, h % 2, 0, w % 2)


def _box2(img, oy: int, ox: int):
    """Average of the 2x2 texel block at offset (oy, ox) on the stride-2
    grid — one bilinear tap at a half-texel corner.  Planar (C, H, W)."""
    img = _pad_even(img)
    c, h, w = img.shape
    p = _pad_edge(img, 2, 2, 2, 2)
    return _avgpool2(lax.dynamic_slice(p, (0, 2 + oy, 2 + ox), (c, h, w)))


def _luma(img):
    return (img[0] * 0.2127 + img[1] * 0.7152 + img[2] * 0.0722)


def downsample_13tap(img, karis: bool = False):
    """(C, H, W) -> (C, ceil(H/2), ceil(W/2)), Jimenez 13-tap pattern:
    5 overlapping 2x2 quads — center quad weight .5, corner quads .125."""
    if not karis:
        # exact factorization: 5-tap diagonal cross then 2x2 avg pool
        x = _pad_even(img)
        c, h, w = x.shape
        p = _pad_edge(x, 1, 1, 1, 1)

        def sh(dy, dx):
            return lax.dynamic_slice(p, (0, 1 + dy, 1 + dx), (c, h, w))
        f = (x * 0.5 + (sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1))
             * 0.125)
        return _avgpool2(f)
    # Karis average: weight each of the 5 quads by 1/(1+luma) first
    quads = [_box2(img, 0, 0), _box2(img, -1, -1), _box2(img, -1, 1),
             _box2(img, 1, -1), _box2(img, 1, 1)]
    mix = (0.5, 0.125, 0.125, 0.125, 0.125)
    num = 0.0
    den = 0.0
    for q, m in zip(quads, mix):
        w = (m / (1.0 + _luma(q)))[None]
        num = num + q * w
        den = den + w
    return num / jnp.maximum(den, 1e-8)


def _up2_axis(img, axis: int, out_n: int):
    """Exact 2x (bilinear-2x ∘ tent) upsample along `axis` (1=rows,
    2=cols of the planar image): even texels get [5,10,1]/16 of source
    k-1..k+1, odd get [1,10,5]/16; interleaved by stack+reshape."""
    c = img.shape[0]
    n = img.shape[axis]

    def sl(a, lo, hi):
        idx = [slice(None)] * 3
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]
    p = jnp.concatenate([sl(img, 0, 1), img, sl(img, n - 1, n)],
                        axis=axis)
    sm1, s0, sp1 = sl(p, 0, n), sl(p, 1, n + 1), sl(p, 2, n + 2)
    even = (5.0 * sm1 + 10.0 * s0 + 1.0 * sp1) * (1.0 / 16.0)
    odd = (1.0 * sm1 + 10.0 * s0 + 5.0 * sp1) * (1.0 / 16.0)
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(img.shape)
    shape[axis] = 2 * n
    out = out.reshape(shape)
    return sl(out, 0, out_n)


def upsample_tent(img, out_h: int, out_w: int, radius: float = 1.0):
    """~2x bilinear upsample + 3x3 tent filter, separable-exact on the
    even 2x grid (odd targets crop the last texel — a sub-texel shift
    versus a fractional resize, invisible inside the bloom sum).
    Planar (C, H, W)."""
    return _up2_axis(_up2_axis(img, 1, out_h), 2, out_w)


def bloom(hdr, num_mips: int = DEFAULT_MIPS):
    """Full bloom chain on (H, W, 3) HDR; returns the full-resolution
    bloom texture (H, W, 3).  Internally planar (3, H, W)."""
    x = hdr.transpose(2, 0, 1)
    chain = [x]
    for i in range(num_mips):
        if min(x.shape[1], x.shape[2]) < 4:
            break
        x = downsample_13tap(x, karis=(i == 0))
        chain.append(x)
    # accumulate back up
    acc = chain[-1]
    for i in range(len(chain) - 2, -1, -1):
        target = chain[i]
        acc = target + upsample_tent(acc, target.shape[1], target.shape[2])
    return (acc / len(chain)).transpose(1, 2, 0)
