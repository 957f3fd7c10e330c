"""Ray-traced sun shadows with cone sampling + temporal/spatial denoise.

Counterpart of source/ShadowMaskRenderer.cpp + shadowmask.hlsl:65-145
(inline-RT shadow rays with blue-noise cone sampling for the soft sun,
denoised by NRD SIGMA_SHADOW) — rebuilt TPU-first: rays go through the
jnp LBVH (ops/bvh.py), the noise source is interleaved-gradient noise
rotated per frame (stand-in for the reference's FFX blue-noise texture,
CommonResources.cpp:166-202), and the denoiser is a motion-reprojected
temporal accumulator + depth-aware separable spatial blur (ops/denoise.py)
standing in for SIGMA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from toyrenderer_tpu.ops import bvh as bvh_mod

SUN_ANGULAR_RADIUS = float(np.radians(0.265))


def interleaved_gradient_noise(h: int, w: int, frame_index):
    """Per-pixel noise in [0,1), decorrelated across frames (stand-in for
    the blue-noise texture; same usage pattern as shadowmask.hlsl)."""
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    f = frame_index.astype(jnp.float32) % 64.0
    # golden-ratio temporal rotation of IGN
    x = x + 5.588238 * f
    y = y + 5.588238 * f
    v = 52.9829189 * ((0.06711056 * x + 0.00583715 * y) % 1.0)
    return v % 1.0


def _orthonormal_basis(d):
    """Branchless ONB (Duff et al.) for directions (..., 3)."""
    sign = jnp.where(d[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + d[..., 2])
    b = d[..., 0] * d[..., 1] * a
    t = jnp.stack([1.0 + sign * d[..., 0] ** 2 * a, sign * b,
                   -sign * d[..., 0]], -1)
    bt = jnp.stack([b, sign + d[..., 1] ** 2 * a, -d[..., 1]], -1)
    return t, bt


def cone_sample(direction, r1, r2, half_angle: float):
    """Sample directions in a cone around `direction` (uniform disc)."""
    t, bt = _orthonormal_basis(direction)
    radius = jnp.tan(half_angle) * jnp.sqrt(r1)
    phi = 2.0 * jnp.pi * r2
    offs = (t * (radius * jnp.cos(phi))[..., None]
            + bt * (radius * jnp.sin(phi))[..., None])
    d = direction + offs
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                           1e-8)


def _shadow_gdir_enabled() -> bool:
    import os
    return os.environ.get('TR_SHADOW_GDIR', '0') == '1'


def trace_shadow_mask(bvh, world_pos, normal, hit_mask, sun_dir_to_light,
                      frame_index, half_angle: float = SUN_ANGULAR_RADIUS,
                      normal_bias: float = 2e-2, t_max: float = 1e4,
                      max_steps: int = 96, sp_mesh=None,
                      gdir: bool | None = None):
    """1 spp cone-sampled sun visibility per pixel.

    Args:
      world_pos (H, W, 3), normal (H, W, 3), hit_mask (H, W) bool
      sun_dir_to_light (3,): surface -> sun unit vector
      gdir: cone-sample per 64x2-pixel STRIP instead of per pixel so
        every 128-ray group shares one direction — the grouped-direction
        traversal kernel applies (TR_SHADOW_GDIR=1; the temporal
        accumulator averages the strip noise across frames like the
        per-pixel noise).
    Returns (H, W) f32 raw shadow mask (1 = lit).  Sky pixels return 1.
    """
    h, w = hit_mask.shape
    if gdir is None:
        gdir = _shadow_gdir_enabled()
    origins = world_pos + normal * normal_bias

    # order rays in 64x64 pixel blocks (= one 4096-ray traversal packet):
    # a packet then covers a compact screen footprint (coherent origins)
    # instead of a scanline
    blk = 64
    hp = -(-h // blk) * blk
    wp = -(-w // blk) * blk

    def to_blocks(img):
        x = jnp.pad(img, ((0, hp - h), (0, wp - w)) + ((0, 0),) *
                    (img.ndim - 2))
        x = x.reshape(hp // blk, blk, wp // blk, blk, *img.shape[2:])
        return x.swapaxes(1, 2).reshape(-1, *img.shape[2:])

    def from_blocks(v):
        x = v.reshape(hp // blk, wp // blk, blk, blk)
        return x.swapaxes(1, 2).reshape(hp, wp)[:h, :w]

    gd = None
    if gdir:
        # one cone sample per (64-wide, 2-tall) strip aligned to the
        # tile grid: after to_blocks, each 128-ray group = one strip
        sh, sw = hp // 2, wp // blk
        r1 = interleaved_gradient_noise(sh, sw, frame_index)
        r2 = interleaved_gradient_noise(sh, sw, frame_index + 17)
        strips = cone_sample(
            jnp.broadcast_to(sun_dir_to_light, (sh, sw, 3)),
            r1, r2, half_angle)                       # (hp/2, wp/64, 3)
        dirs = jnp.repeat(jnp.repeat(strips, 2, axis=0), blk,
                          axis=1)[:h, :w]
        # strip (ty*32+j, tx) -> group (tile-major, then row pair)
        gd = strips.reshape(hp // blk, blk // 2, wp // blk, 3).swapaxes(
            1, 2).reshape(-1, 3)
    else:
        r1 = interleaved_gradient_noise(h, w, frame_index)
        r2 = interleaved_gradient_noise(h, w, frame_index + 17)
        dirs = cone_sample(
            jnp.broadcast_to(sun_dir_to_light, world_pos.shape),
            r1, r2, half_angle)

    from toyrenderer_tpu.ops.bvh_pallas import traverse_auto
    # sky and sun-backfacing pixels get their value from the wheres
    # below no matter what the trace returns — mask their rays off so
    # fully-dead 64x64 packets (away-facing walls, sky regions) exit
    # immediately and partial packets shrink their scalar prefilter
    # interval to the rays that matter
    ndotl = jnp.sum(normal * sun_dir_to_light, -1)
    live = to_blocks((hit_mask & (ndotl > 0.0)).astype(jnp.float32))
    res = traverse_auto(bvh, to_blocks(origins), to_blocks(dirs),
                        t_max=t_max, max_steps=max_steps, any_hit=True,
                        live=live, sp_mesh=sp_mesh, group_dirs=gd)
    lit = 1.0 - from_blocks(res['hit'].astype(jnp.float32))
    # facing away from the sun is its own shadow; sky stays lit
    lit = jnp.where(ndotl <= 0.0, 0.0, lit)
    return jnp.where(hit_mask, lit, 1.0)


def checkerboard_pack(imgs, parity):
    """Compact the checkerboard half of each (H, W[, C]) image to
    (H, W//2[, C]).

    Kept cells are x where (x + y + parity) % 2 == 0, i.e. for row y the
    columns x = 2k + ((y + parity) % 2).  `parity` is a traced int32
    scalar (frame parity), so alternating frames trace complementary
    halves and the temporal accumulator in denoise_shadow recovers full
    half-res sampling on static content — the NRD-style checkerboard
    trick (the reference leans on SIGMA the same way for 1-spp rays,
    shadowmask.hlsl:65-145; on TPU the same denoiser investment buys a
    2x ray cut instead).
    """
    out = []
    for img in imgs:
        h, w = img.shape[:2]
        x = img.reshape(h, w // 2, 2, *img.shape[2:])
        ys = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
        sel = (((ys + parity) % 2) == 1)
        selb = sel.reshape(h, *([1] * (x.ndim - 2)))
        out.append(jnp.where(selb, x[:, :, 1], x[:, :, 0]))
    return out


def checkerboard_unpack(traced, parity):
    """Expand a packed (H, K) traced grid back to (H, 2K).

    Traced cells keep their value; the untraced half is filled with the
    mean of its two horizontal neighbours (both traced this frame, same
    row — no cross-row relayout).  The full-res temporal accumulate +
    depth-aware blur absorbs the fill the way it absorbs 1-spp cone
    noise; the complementary parity next frame makes the fill transient.
    """
    h, k = traced.shape
    right = jnp.concatenate([traced[:, 1:], traced[:, -1:]], axis=1)
    left = jnp.concatenate([traced[:, :1], traced[:, :-1]], axis=1)
    fill0 = 0.5 * (traced + right)   # parity-even rows: odd x untraced
    fill1 = 0.5 * (left + traced)    # parity-odd rows: even x untraced
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    sel = (((ys + parity) % 2) == 1)
    even = jnp.where(sel, fill1, traced)
    odd = jnp.where(sel, traced, fill0)
    return jnp.stack([even, odd], axis=2).reshape(h, 2 * k)
