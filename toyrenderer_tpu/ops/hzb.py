"""Hierarchical Z-buffer (HZB) build + conservative occlusion queries.

Counterpart of the reference's HZB path: depth -> min-downsample mip0 ->
FFX SPD min-reduction mip chain (BasePassRenderers.cpp:505-542, half-res
pow2 R16F), sampled by gpuculling.hlsl / basepass.hlsl with a min-reduction
sampler for 2-phase occlusion culling (culling.hlsli:36-82).

Reverse-Z convention: larger depth == closer.  The HZB stores the MINIMUM
(farthest) depth per region; an occludee whose nearest depth is still
smaller (farther) than the region minimum is hidden.

TPU design: the mip chain is a tuple of static-shape arrays carried across
frames; queries flatten the chain into one atlas vector so a batch of
bboxes can gather from their per-box mip level without control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1).bit_length())


def hzb_shape(width: int, height: int):
    """(mip0_h, mip0_w): half-res, pow2 (reference GBufferRenderer:596-616)."""
    return _next_pow2(height) // 2, _next_pow2(width) // 2


def num_hzb_mips(width: int, height: int) -> int:
    h0, w0 = hzb_shape(width, height)
    return int(np.log2(min(h0, w0))) + 1


def build_hzb(depth, width: int, height: int):
    """depth (H, W) reverse-Z -> tuple of min-reduced mips.

    mip0 is (pow2(H)/2, pow2(W)/2); each subsequent mip halves.  Padding
    uses 0 (== infinitely far), which is conservative for occlusion.
    """
    h0, w0 = hzb_shape(width, height)
    hp, wp = h0 * 2, w0 * 2
    p = jnp.pad(depth, ((0, hp - depth.shape[0]), (0, wp - depth.shape[1])))

    def min2x2(x):
        # native windowed reduce — avoids reshape/transpose data formatting
        return jax.lax.reduce_window(
            x, jnp.inf, jax.lax.min, (2, 2), (2, 2), 'VALID')

    mips = []
    m = min2x2(p)
    mips.append(m)
    for _ in range(num_hzb_mips(width, height) - 1):
        m = min2x2(m)
        mips.append(m)
    return tuple(mips)


def init_hzb(width: int, height: int):
    """All-far HZB (first frame: nothing occludes)."""
    h0, w0 = hzb_shape(width, height)
    mips = []
    h, w = h0, w0
    for _ in range(num_hzb_mips(width, height)):
        mips.append(jnp.zeros((h, w), jnp.float32))
        h, w = max(h // 2, 1), max(w // 2, 1)
    return tuple(mips)


def _flatten_mips(mips):
    flat = jnp.concatenate([m.reshape(-1) for m in mips])
    offsets = np.cumsum([0] + [int(np.prod(m.shape)) for m in mips])[:-1]
    shapes = np.asarray([m.shape for m in mips], np.int32)
    return flat, jnp.asarray(offsets, jnp.int32), jnp.asarray(shapes)


def hzb_test_bbox(mips, u0, v0, u1, v1, depth_near, width: int, height: int):
    """Conservative visibility of screen bboxes against the HZB.

    Args:
      mips: tuple from build_hzb
      u0,v0,u1,v1: (N,) bbox in [0,1] UV over the RENDERED WxH image
      depth_near: (N,) the occludee's CLOSEST depth (reverse-Z max)
    Returns (N,) bool: True == potentially visible (NOT occluded).
    """
    flat, offsets, shapes = _flatten_mips(mips)
    h0, w0 = mips[0].shape
    n_mips = len(mips)
    # UVs are over W x H; the pow2 HZB covers [0, W/(2*w0)] etc. of itself
    su = width / (2.0 * w0)
    sv = height / (2.0 * h0)
    u0c = jnp.clip(u0, 0.0, 1.0) * su
    u1c = jnp.clip(u1, 0.0, 1.0) * su
    v0c = jnp.clip(v0, 0.0, 1.0) * sv
    v1c = jnp.clip(v1, 0.0, 1.0) * sv

    # level such that the bbox spans <= 2 texels at that mip
    ext_x = (u1c - u0c) * w0
    ext_y = (v1c - v0c) * h0
    ext = jnp.maximum(jnp.maximum(ext_x, ext_y), 1e-6)
    level = jnp.clip(jnp.ceil(jnp.log2(ext)), 0, n_mips - 1).astype(jnp.int32)

    mw = shapes[level, 1]
    mh = shapes[level, 0]
    # u0c/v0c are already uv over the (padded pow2) HZB; texel = uv * size
    x0 = jnp.clip((u0c * mw.astype(jnp.float32)).astype(jnp.int32), 0, mw - 1)
    x1 = jnp.clip((u1c * mw.astype(jnp.float32)).astype(jnp.int32), 0, mw - 1)
    y0 = jnp.clip((v0c * mh.astype(jnp.float32)).astype(jnp.int32), 0, mh - 1)
    y1 = jnp.clip((v1c * mh.astype(jnp.float32)).astype(jnp.int32), 0, mh - 1)
    x1 = jnp.minimum(x1, x0 + 1)
    y1 = jnp.minimum(y1, y0 + 1)

    base = offsets[level]
    def fetch(y, x):
        return flat[base + y * mw + x]
    occ = jnp.minimum(
        jnp.minimum(fetch(y0, x0), fetch(y0, x1)),
        jnp.minimum(fetch(y1, x0), fetch(y1, x1)))
    # visible if the occludee's closest point is closer than (or equal to)
    # the farthest occluder in the footprint
    return depth_near >= occ
