"""Rasterized sun-shadow maps — the TPU-native default shadow technique.

The reference traces inline-RT shadow rays because its GPU has RT cores
(shadowmask.hlsl); this framework's speed-of-light path is the Pallas
rasterizer, so the DEFAULT sun-shadow technique renders an orthographic
depth map from the sun with the same binned raster pipeline and samples it
with one temporally-jittered bilinear tap per pixel, feeding the same
SIGMA-style denoiser.  (The BVH ray-traced path remains available as
`shadow_technique='rt'` — same mask contract, ground truth for tests.)

The shadow map is quad-row expanded (like the texture atlas) so a bilinear
depth-compare tap is ONE row gather per pixel.  Note: the reference also
ships an unused CSM/PCF path (shadowfiltering.hlsl), so shadow-map
filtering is within its capability family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from toyrenderer_tpu.ops import geometry as geo_mod
from toyrenderer_tpu.ops import raster as raster_mod
from toyrenderer_tpu.ops.raster import RasterConfig
from toyrenderer_tpu.ops.shadows import interleaved_gradient_noise


def sun_ortho_matrix(world_aabb, sun_direction) -> np.ndarray:
    """Orthographic sun view-projection covering the scene AABB (host).

    Output clip: x,y in [-1,1], z in [0,1] with 1 == closest to the sun
    (matches the raster's reverse-Z 'greater wins' convention), w == 1.
    """
    d = np.asarray(sun_direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-8)
    up = (np.array([0.0, 1.0, 0.0]) if abs(d[1]) < 0.95
          else np.array([1.0, 0.0, 0.0]))
    right = np.cross(up, d)
    right /= max(np.linalg.norm(right), 1e-8)
    up = np.cross(d, right)

    bmin, bmax = np.asarray(world_aabb, np.float64)
    corners = np.array([[x, y, z]
                        for x in (bmin[0], bmax[0])
                        for y in (bmin[1], bmax[1])
                        for z in (bmin[2], bmax[2])])
    basis = np.stack([right, up, d], axis=0)          # rows
    proj = corners @ basis.T                          # sun-space coords
    lo = proj.min(0)
    hi = proj.max(0)
    margin = (hi - lo) * 0.01 + 1e-3
    lo -= margin
    hi += margin

    # sun-space -> clip: xy -> [-1,1]; depth along +d: lo=1 (near the sun
    # side the light COMES from is -d... rays travel along d) — geometry
    # closest to the sun has the smallest d-coordinate -> map lo.z -> 1
    m = np.zeros((4, 4), np.float64)
    m[0, :3] = right * (2.0 / (hi[0] - lo[0]))
    m[1, :3] = up * (2.0 / (hi[1] - lo[1]))
    m[2, :3] = -d / (hi[2] - lo[2])
    m[0, 3] = -(lo[0] + hi[0]) / (hi[0] - lo[0])
    m[1, 3] = -(lo[1] + hi[1]) / (hi[1] - lo[1])
    m[2, 3] = hi[2] / (hi[2] - lo[2])
    m[3, 3] = 1.0
    return m.astype(np.float32)


def shadow_map_config(resolution: int) -> RasterConfig:
    """Base sun-map raster config; render_shadow_map rescales the caps
    from the STATIC caster count (the sun view concentrates the whole
    unculled scene into the map, so per-tile density is ~10-20x the
    camera view's and fixed caps cannot serve both Cornell and plaza)."""
    return RasterConfig(width=resolution, height=resolution,
                        tile_h=16, tile_w=128,
                        max_tris_per_tile=256, chunk=32,
                        max_big_tris=128, tile_batch=8,
                        compact_frac=1.0, short_frac=0.5,
                        rest_frac=0.25)


def _content_caps(cfg: RasterConfig, n_tris: int,
                  streamed: bool) -> RasterConfig:
    """Caps from the static caster-stream length.  Round-5 measurement:
    courtyard max tile 5533 pairs at 1024^2 (old K=256 silently dropped
    ~471k of ~500k pairs = structurally wrong shadows); plaza LOD0 hits
    30k.  8x the mean per-tile density covers both with margin (drop
    telemetry reports any residue).  The streamed fill makes K a count
    CLAMP (cost tracks real counts); the XLA fallback pays full K per
    tile, so its clamp stays low — it serves small scenes and tests."""
    import dataclasses
    avg = max(n_tris / cfg.num_tiles, 1.0)
    want = -(-int(8 * avg) // 128) * 128
    if streamed:
        k = min(max(want, 1024), 32768)
        b = 2048
    else:
        k = min(max(want, cfg.max_tris_per_tile), 1024)
        b = max(cfg.max_big_tris, min(k, 512))
    return dataclasses.replace(cfg, max_tris_per_tile=k, max_big_tris=b)


def render_shadow_map(scene, inst_world, pair_inst, pair_meshlet,
                      sun_view_proj, cfg: RasterConfig, use_pallas: bool,
                      tri_keep=None):
    """Depth-from-the-sun via the standard raster pipeline.

    Uses the FULL (unculled) pair list — off-screen geometry casts
    shadows.  tri_keep: optional (T,) bool per pair-stream triangle —
    the alpha-coverage classification that lets masked cutout geometry
    cast (hole-free) shadows without per-texel alpha in the raster.
    Returns (depth (S, S) f32 — 0 == nothing (fully lit beyond map),
    dropped () i32 bin-capacity overflow: overflowed casters would
    otherwise manifest as silent light leaks).
    """
    geo = geo_mod.meshlet_clip_triangles(
        scene, inst_world, sun_view_proj, pair_inst, pair_meshlet)
    if tri_keep is not None:
        geo = dict(geo, tri_valid=geo['tri_valid'] & tri_keep)
    # double-sided raster into the shadow map (no light-facing culling —
    # the cheap fix for acne from backface-only casters)
    geo = dict(geo, double_sided=jnp.ones_like(geo['double_sided']))
    cfg = _content_caps(cfg, geo['tri_valid'].shape[0], use_pallas)
    setup = raster_mod.setup_triangles(geo, cfg)
    if use_pallas:
        # streamed fill: per-tile cost tracks REAL binned counts, so the
        # unculled caster density (K up to 32k on plaza) is affordable —
        # the dense (tiles, K, 16) record table of fill_visibility_pallas
        # would cost tiles*K*64 B of HBM traffic at these caps
        from toyrenderer_tpu.ops.raster_pallas import fill_peel_stream
        bins = raster_mod.bin_pairs_stream(setup, cfg)
        z, _ = fill_peel_stream(setup, bins, cfg, layers=1)
        return z[0], sum(bins['drop'].values())
    table, counts, big, drop = raster_mod.bin_triangles(setup, cfg)
    depth, _ = raster_mod.fill_visibility(setup, table, big, cfg)
    return depth, sum(drop.values())


def quad_expand_map(depth):
    """(S, S) -> (S*S, 4) rows of each texel's 2x2 footprint (clamped)."""
    xp = jnp.concatenate([depth[:, 1:], depth[:, -1:]], axis=1)
    yp = jnp.concatenate([depth[1:], depth[-1:]], axis=0)
    xyp = jnp.concatenate([yp[:, 1:], yp[:, -1:]], axis=1)
    return jnp.stack([depth, xp, yp, xyp], -1).reshape(-1, 4)


def sample_shadow_map_points(map_quads, resolution: int, sun_view_proj,
                             points, bias: float = 3e-3):
    """Sun visibility for arbitrary world points (N, 3) -> (N,) in [0,1].

    One bilinear 4-texel depth-compare tap per point (no jitter — used
    for DDGI probe-hit direct lighting, replacing the second any-hit
    traversal per probe ray; giprobetrace.hlsl computes this visibility
    with an RT ray, this framework's default sun technique is the map).
    Points outside the map count as lit.
    """
    ph = jnp.concatenate([points, jnp.ones_like(points[..., :1])], -1)
    clip = ph @ sun_view_proj.T
    u = clip[..., 0] * 0.5 + 0.5
    v = 0.5 - clip[..., 1] * 0.5
    z = clip[..., 2]
    s = jnp.float32(resolution)
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = jnp.clip(x0, 0, resolution - 1).astype(jnp.int32)
    yi = jnp.clip(y0, 0, resolution - 1).astype(jnp.int32)
    quad = map_quads[yi * resolution + xi]             # (N, 4)
    lit4 = (quad <= (z + bias)[..., None]).astype(jnp.float32)
    lit = ((lit4[..., 0] * (1 - fx) + lit4[..., 1] * fx) * (1 - fy)
           + (lit4[..., 2] * (1 - fx) + lit4[..., 3] * fx) * fy)
    inside = ((u >= 0) & (u <= 1) & (v >= 0) & (v <= 1))
    return jnp.where(inside, lit, 1.0)


def sample_shadow_map(map_quads, resolution: int, sun_view_proj,
                      world_pos, normal, sun_dir_to_light, hit_mask,
                      frame_index, bias: float = 2e-3,
                      jitter_texels: float = 1.0):
    """One temporally-jittered bilinear depth-compare tap per 2x2 QUAD.

    Returns (H, W) f32 visibility (1 = lit).  The raw mask is a 1-spp
    stochastic signal feeding the temporal+spatial denoiser, so the tap
    runs at quad rate (map gathers are random-access bound: full-rate
    taps cost ~5 ms at 1080p); the per-quad visibility expands to full
    res and the full-res ndotl / hit masks reapply on top.  Odd
    dimensions fall back to full-rate taps.
    """
    h, w = hit_mask.shape
    quad_rate = (h % 2 == 0 and w % 2 == 0)
    if quad_rate:
        wp = jax.lax.reduce_window(
            world_pos, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
            'VALID') * 0.25
        hq, wq = h // 2, w // 2
    else:
        wp = world_pos
        hq, wq = h, w
    ph = jnp.concatenate([wp, jnp.ones_like(wp[..., :1])], -1)
    clip = jnp.einsum('ij,...j->...i', sun_view_proj, ph)
    u = clip[..., 0] * 0.5 + 0.5
    v = 0.5 - clip[..., 1] * 0.5
    z = clip[..., 2]                                   # 1 == sun-near

    r1 = interleaved_gradient_noise(hq, wq, frame_index)
    r2 = interleaved_gradient_noise(hq, wq, frame_index + 29)
    s = jnp.float32(resolution)
    x = u * s - 0.5 + (r1 - 0.5) * 2.0 * jitter_texels
    y = v * s - 0.5 + (r2 - 0.5) * 2.0 * jitter_texels
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = jnp.clip(x0, 0, resolution - 1).astype(jnp.int32)
    yi = jnp.clip(y0, 0, resolution - 1).astype(jnp.int32)
    quad = map_quads[yi * resolution + xi]             # (Hq, Wq, 4)

    # percentage-closer: compare each footprint texel, then bilinear mix
    zb = z + bias
    lit4 = (quad <= zb[..., None]).astype(jnp.float32)
    lit = ((lit4[..., 0] * (1 - fx) + lit4[..., 1] * fx) * (1 - fy)
           + (lit4[..., 2] * (1 - fx) + lit4[..., 3] * fx) * fy)
    inside = ((u >= 0) & (u <= 1) & (v >= 0) & (v <= 1))
    lit = jnp.where(inside, lit, 1.0)
    if quad_rate:
        lit = jnp.repeat(jnp.repeat(lit, 2, 0), 2, 1)

    ndotl = jnp.sum(normal * sun_dir_to_light, -1)
    lit = jnp.where(ndotl <= 0.0, 0.0, lit)
    return jnp.where(hit_mask, lit, 1.0)
