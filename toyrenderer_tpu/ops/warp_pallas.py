"""Pallas TPU kernel: bounded-displacement bilinear image warp.

The TAA/denoise history resample is a per-pixel 2D gather — the single
most expensive op pattern on TPU (megapixel random row gathers are
latency-bound: the packed-row XLA formulation measured 63 ms/frame at
1080p).  Mosaic has no vectorized gather, but a REPROJECTION warp doesn't
need one: per-frame motion is bounded, so the sample for every output
pixel lives within a small window around it.  This kernel streams the
image through VMEM in haloed tiles and evaluates the bilinear sample as a
separable select-tree over the (2M+1)^2 integer displacement taps:

    out[p] = sum_dy wy(dy) * sum_dx wx(dx) * img[p + (dy, dx)]
    wy(dy) = relu(1 - |dyf[p] - dy|)      (tent == bilinear weights)

Every tap is a static VMEM slice + fma on full VPU tiles — no gathers,
no scalar loops.  Displacements are clamped to +-MAX_DISP pixels; callers
reject history beyond the clamp (standard TAA fast-motion rejection, the
same regime where variance clipping discards the sample anyway).

Counterpart of the history resample inside the reference's TAA/upscaler
pass (source/TAARenderer.cpp wraps DLSS/FSR which do this in fixed
hardware); the XLA gather path (ops/taa._sample_bilinear) remains the
CPU/test and unbounded-motion reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISP = 8            # +-pixels of reprojection reach
_TH, _TW = 32, 512      # output tile
_HR = 16                # row halo in the DMA window (>= MAX_DISP + 1)
_HC = 128               # col halo (lane-aligned DMA windows)


def _warp_kernel(img_ref,      # (C, Hp + 2*_HR, Wp + 2*_HC)  ANY/HBM
                 mot_ref,      # (2, _TH, _TW) VMEM  (x, y) pixel motion
                 out_ref,      # (C, _TH, _TW) VMEM
                 scr,          # (C, _TH + 2*_HR, _TW + 2*_HC) VMEM
                 sem,          # DMA semaphore
                 *, h: int, w: int, c: int, m: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    dma = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(ty * _TH, _TH + 2 * _HR),
                   pl.ds(tx * _TW, _TW + 2 * _HC)], scr, sem)
    dma.start()

    yg = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
          .astype(jnp.float32) + ty.astype(jnp.float32) * _TH)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
          .astype(jnp.float32) + tx.astype(jnp.float32) * _TW)
    mx = mot_ref[0]
    my = mot_ref[1]
    # previous-frame position, edge-clamped (matches the XLA reference
    # path), then the displacement clamped to the kernel's reach
    eps = jnp.float32(1e-3)
    lim = jnp.float32(m) - eps
    dyf = jnp.clip(jnp.clip(yg - my, 0.0, h - 1.0) - yg, -lim, lim)
    dxf = jnp.clip(jnp.clip(xg - mx, 0.0, w - 1.0) - xg, -lim, lim)

    dma.wait()

    for ch in range(c):
        acc = jnp.zeros((_TH, _TW), jnp.float32)
        for dy in range(-m, m + 1):
            wy = jnp.maximum(1.0 - jnp.abs(dyf - dy), 0.0)
            rows = scr[ch, _HR + dy:_HR + dy + _TH, :]   # (_TH, _TW+2HC)
            inner = jnp.zeros((_TH, _TW), jnp.float32)
            for dx in range(-m, m + 1):
                wx = jnp.maximum(1.0 - jnp.abs(dxf - dx), 0.0)
                inner = inner + wx * rows[:, _HC + dx:_HC + dx + _TW]
            acc = acc + wy * inner
        out_ref[ch] = acc


@functools.partial(jax.jit, static_argnames=('max_disp', 'interpret'))
def warp_bilinear(img, motion, max_disp: int = MAX_DISP,
                  interpret: bool = False):
    """Reproject img (H, W, C) by per-pixel motion (H, W, 2, x/y order:
    prev = cur - motion), bilinear, displacement clamped to +-max_disp.
    Returns the warped image (H, W, C); callers mask out pixels whose
    true displacement exceeds the clamp (see taa.taa_resolve)."""
    h, w, ch = img.shape
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    planar = jnp.pad(img.transpose(2, 0, 1),
                     ((0, 0), (_HR, hp - h + _HR), (_HC, wp - w + _HC)),
                     mode='edge')
    mot = jnp.pad(motion.transpose(2, 0, 1),
                  ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = functools.partial(_warp_kernel, h=h, w=w, c=ch, m=max_disp)
    out = pl.pallas_call(
        kernel,
        grid=(hp // _TH, wp // _TW),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, _TH, _TW), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ch, _TH, _TW), lambda ty, tx: (0, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ch, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ch, _TH + 2 * _HR, _TW + 2 * _HC), jnp.float32),
            pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(planar, mot)
    return out[:, :h, :w].transpose(1, 2, 0)
