"""Physically-based bloom: 13-tap Karis downsample + 9-tap tent upsample.

Counterpart of source/BloomRenderer.cpp + bloom.hlsl:16-129 (the
CoD:AW-style mip chain: repeated 13-tap downsamples with a Karis average on
the first level to kill fireflies, then tent-filter upsamples accumulated
back up the chain; default 6 mips).

TPU design: each level is dense elementwise + strided slicing (fuses into
a handful of VPU loops); no textures or samplers involved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_MIPS = 6


def _pad_even(img):
    h, w = img.shape[:2]
    return jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode='edge')


def _box2(img, oy: int, ox: int):
    """Average of the 2x2 texel block at offset (oy, ox) on the stride-2
    grid — one bilinear tap at a half-texel corner."""
    img = _pad_even(img)
    h, w = img.shape[:2]
    p = jnp.pad(img, ((2, 2), (2, 2), (0, 0)), mode='edge')
    y0 = 2 + oy
    x0 = 2 + ox
    s = (p[y0:y0 + h:2, x0:x0 + w:2]
         + p[y0 + 1:y0 + h:2, x0:x0 + w:2]
         + p[y0:y0 + h:2, x0 + 1:x0 + w:2]
         + p[y0 + 1:y0 + h:2, x0 + 1:x0 + w:2])
    return s * 0.25


def downsample_13tap(img, karis: bool = False):
    """(H, W, 3) -> (ceil(H/2), ceil(W/2), 3), Jimenez 13-tap pattern:
    5 overlapping 2x2 quads — center quad weight .5, corner quads .125."""
    quads = {
        'c': _box2(img, 0, 0),
        'tl': _box2(img, -1, -1), 'tr': _box2(img, -1, 1),
        'bl': _box2(img, 1, -1), 'br': _box2(img, 1, 1),
    }
    if karis:
        # Karis average: weight each quad by 1/(1+luma) before mixing
        def kw(x):
            luma = (x[..., 0] * 0.2127 + x[..., 1] * 0.7152
                    + x[..., 2] * 0.0722)
            return 1.0 / (1.0 + luma[..., None])
        ws = {k: kw(v) for k, v in quads.items()}
        num = (quads['c'] * ws['c'] * 0.5
               + sum(quads[k] * ws[k] for k in ('tl', 'tr', 'bl', 'br'))
               * 0.125)
        den = (ws['c'] * 0.5
               + sum(ws[k] for k in ('tl', 'tr', 'bl', 'br')) * 0.125)
        return num / jnp.maximum(den, 1e-8)
    return (quads['c'] * 0.5
            + (quads['tl'] + quads['tr'] + quads['bl'] + quads['br'])
            * 0.125)


def upsample_tent(img, out_h: int, out_w: int, radius: float = 1.0):
    """Bilinear 2x upsample followed by a 3x3 tent filter (the 9-tap
    tent upsample of bloom.hlsl's upsample pass)."""
    up = jax.image.resize(img, (out_h, out_w, img.shape[-1]), 'linear')
    p = jnp.pad(up, ((1, 1), (1, 1), (0, 0)), mode='edge')
    k = jnp.asarray([1.0, 2.0, 1.0]) / 4.0
    # separable tent
    horiz = (p[1:-1, :-2] * k[0] + p[1:-1, 1:-1] * k[1] + p[1:-1, 2:] * k[2])
    p2 = jnp.pad(horiz, ((1, 1), (0, 0), (0, 0)), mode='edge')
    return (p2[:-2] * k[0] + p2[1:-1] * k[1] + p2[2:] * k[2])


def bloom(hdr, num_mips: int = DEFAULT_MIPS):
    """Full bloom chain; returns the bloom texture at full resolution."""
    chain = [hdr]
    x = hdr
    for i in range(num_mips):
        if min(x.shape[0], x.shape[1]) < 4:
            break
        x = downsample_13tap(x, karis=(i == 0))
        chain.append(x)
    # accumulate back up
    acc = chain[-1]
    for i in range(len(chain) - 2, -1, -1):
        target = chain[i]
        acc = target + upsample_tent(acc, target.shape[0], target.shape[1])
    return acc / len(chain)
