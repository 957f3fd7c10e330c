"""ReSTIR DI: reservoir-based direct lighting from many emissive lights.

Capability counterpart of the reference's RTXDI integration
(source/ReSTIRRenderer.cpp + restirshading.hlsl + RtxdiApplicationBridge):
initial candidate sampling into per-pixel reservoirs, temporal reuse, and
visibility shading.  Like the reference — which registers the renderer but
does NOT schedule it in the frame (SURVEY.md §2.3) — this pass is
implemented and off by default (RenderSettings.enable_restir).

Light set: emissive triangles of the scene (the reference samples its
light buffer through RTXDI; our scenes carry emissive materials).  All
math is dense per-pixel jnp; visibility uses the shared BVH.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops import bvh as bvh_mod
from toyrenderer_tpu.ops.shadows import interleaved_gradient_noise


def collect_emissive_lights(scene, pair_inst, pair_meshlet, v0, v1, v2,
                            max_lights: int):
    """Fixed-capacity emissive-triangle light list from world triangles.

    Returns dict of (L, ...) arrays: v0/e1/e2, emission (L, 3), area (L,),
    valid (L,).  Overflow drops lights (bounded like everything else).
    """
    prim = scene.meshlet_prim[pair_meshlet]
    mat = jnp.repeat(scene.prim_material[prim], 96, axis=0)
    emission = scene.mat_emissive[mat]
    lum = jnp.sum(emission, -1)
    e1 = v1 - v0
    e2 = v2 - v0
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    is_light = (lum > 1e-3) & (area > 1e-10)

    rank = jnp.cumsum(is_light.astype(jnp.int32)) - 1
    slot = jnp.where(is_light & (rank < max_lights), rank, max_lights)
    t = v0.shape[0]
    idx = jnp.zeros((max_lights + 1,), jnp.int32).at[slot].max(
        jnp.arange(t, dtype=jnp.int32), mode='drop')[:max_lights]
    count = jnp.minimum(jnp.sum(is_light.astype(jnp.int32)), max_lights)
    valid = jnp.arange(max_lights) < count
    safe = jnp.where(valid, idx, 0)
    return dict(v0=v0[safe], e1=e1[safe], e2=e2[safe],
                emission=emission[safe], area=area[safe],
                valid=valid, count=count)


def _sample_light_point(lights, li, r1, r2):
    """Uniform point on light triangle li; returns (pos, normal, area)."""
    su = jnp.sqrt(r1)
    b1 = 1.0 - su
    b2 = r2 * su
    v0 = lights['v0'][li]
    e1 = lights['e1'][li]
    e2 = lights['e2'][li]
    pos = v0 + e1 * b1[..., None] + e2 * b2[..., None]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return pos, n, lights['area'][li]


def _target_pdf(world_pos, normal, albedo, lpos, lnormal, emission, area):
    """Unshadowed path contribution (luminance) — the ReSTIR target."""
    d = lpos - world_pos
    dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-6)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    cos_s = jnp.maximum(jnp.sum(normal * wi, -1), 0.0)
    cos_l = jnp.maximum(jnp.sum(lnormal * -wi, -1), 0.0)
    g = cos_s * cos_l / dist2
    lum = jnp.sum(emission, -1) * jnp.sum(albedo, -1) / (3.0 * jnp.pi)
    return lum * g * area


def restir_di(scene_bvh, lights, world_pos, normal, albedo, hit_mask,
              frame_index, prev_reservoir=None, motion=None,
              num_candidates: int = 8, max_steps: int = 64,
              num_spatial: int = 4, spatial_radius: float = 16.0):
    """One ReSTIR DI step: RIS candidates -> temporal reuse -> SPATIAL
    reuse (disk-neighbor reservoir merging with geometric rejection, the
    RTXDI spatial-resampling pass) -> one visibility ray + shading.

    Returns (radiance (H, W, 3), reservoir dict for the carry).
    Reservoir per pixel: light index, sample uv (r1, r2), weight W,
    target pdf of the kept sample, M (candidate count).
    """
    h, w = hit_mask.shape
    l_count = jnp.maximum(lights['count'], 1)

    def noise(k):
        return interleaved_gradient_noise(h, w, frame_index * 31 + k)

    # --- initial candidates (RIS) -----------------------------------------
    res_li = jnp.zeros((h, w), jnp.int32)
    res_r1 = jnp.zeros((h, w))
    res_r2 = jnp.zeros((h, w))
    res_wsum = jnp.zeros((h, w))
    res_p = jnp.zeros((h, w))
    for k in range(num_candidates):
        li = (noise(4 * k) * l_count.astype(jnp.float32)).astype(
            jnp.int32) % l_count
        r1 = noise(4 * k + 1)
        r2 = noise(4 * k + 2)
        lpos, ln, area = _sample_light_point(lights, li, r1, r2)
        p_hat = _target_pdf(world_pos, normal, albedo, lpos, ln,
                            lights['emission'][li], area)
        # source pdf: uniform light x uniform area -> 1/(count*area);
        # RIS weight = p_hat / p_src = p_hat * count * area ... area
        # already folded into p_hat, so w = p_hat * count
        wgt = p_hat * l_count.astype(jnp.float32)
        res_wsum = res_wsum + wgt
        take = (noise(4 * k + 3) < wgt / jnp.maximum(res_wsum, 1e-12))
        res_li = jnp.where(take, li, res_li)
        res_r1 = jnp.where(take, r1, res_r1)
        res_r2 = jnp.where(take, r2, res_r2)
        res_p = jnp.where(take, p_hat, res_p)
    res_m = jnp.full((h, w), float(num_candidates))

    # --- temporal reuse -----------------------------------------------------
    if prev_reservoir is not None and motion is not None:
        from toyrenderer_tpu.ops.taa import _sample_bilinear
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        ppy = jnp.clip(py - motion[..., 1] - 0.5, 0, h - 1).astype(
            jnp.int32)
        ppx = jnp.clip(px - motion[..., 0] - 0.5, 0, w - 1).astype(
            jnp.int32)
        pr = {k: v[ppy, ppx] for k, v in prev_reservoir.items()}
        pm = jnp.minimum(pr['m'], 20.0 * num_candidates)
        pli = jnp.clip(pr['li'], 0, l_count - 1)
        lpos, ln, area = _sample_light_point(lights, pli, pr['r1'],
                                             pr['r2'])
        p_hat_prev = _target_pdf(world_pos, normal, albedo, lpos, ln,
                                 lights['emission'][pli], area)
        w_prev = p_hat_prev * pr['w'] * pm
        res_wsum = res_wsum + w_prev
        take = (noise(71) < w_prev / jnp.maximum(res_wsum, 1e-12))
        res_li = jnp.where(take, pli, res_li)
        res_r1 = jnp.where(take, pr['r1'], res_r1)
        res_r2 = jnp.where(take, pr['r2'], res_r2)
        res_p = jnp.where(take, p_hat_prev, res_p)
        res_m = res_m + pm

    big_w = res_wsum / jnp.maximum(res_m * jnp.maximum(res_p, 1e-12),
                                   1e-12)
    # the carry keeps the PRE-spatial reservoir: feeding the spatially
    # merged result back through temporal reuse compounds neighbor
    # correlation frame over frame (RTXDI likewise decouples the
    # temporal feedback from the spatial pass)
    reservoir = dict(li=res_li, r1=res_r1, r2=res_r2, w=big_w, m=res_m)

    # --- spatial reuse (RTXDI spatial resampling): merge disk-neighbor
    # reservoirs with geometric rejection (normal agreement + the
    # neighbor's surface lying near OUR tangent plane, scale-invariant),
    # re-evaluating each neighbor sample's target pdf at OUR pixel ------
    if num_spatial > 0:
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        in_li, in_r1, in_r2 = res_li, res_r1, res_r2
        in_w, in_m, in_p = big_w, res_m, res_p
        # restart the running reservoir with our OWN sample's combined
        # weight (Bitterli alg. 4: update with p_hat * W * M)
        res_wsum = in_p * in_w * in_m
        for k in range(num_spatial):
            ang = noise(83 + 5 * k) * (2.0 * jnp.pi)
            rad = jnp.sqrt(noise(84 + 5 * k)) * spatial_radius
            ny = jnp.clip(py + rad * jnp.sin(ang), 0, h - 1).astype(
                jnp.int32)
            nx = jnp.clip(px + rad * jnp.cos(ang), 0, w - 1).astype(
                jnp.int32)
            n_li = in_li[ny, nx]
            n_r1 = in_r1[ny, nx]
            n_r2 = in_r2[ny, nx]
            n_w = in_w[ny, nx]
            n_m = in_m[ny, nx]
            nrm_nb = normal[ny, nx]
            wp_nb = world_pos[ny, nx]
            dwp = wp_nb - world_pos
            plane_d = jnp.abs(jnp.sum(normal * dwp, -1))
            lateral = jnp.maximum(jnp.linalg.norm(dwp, axis=-1), 1e-6)
            ok = ((jnp.sum(normal * nrm_nb, -1) > 0.9)
                  & (plane_d < 0.1 * lateral + 1e-5)
                  & hit_mask[ny, nx])
            lpos, ln, area = _sample_light_point(lights, n_li, n_r1,
                                                 n_r2)
            p_hat = _target_pdf(world_pos, normal, albedo, lpos, ln,
                                lights['emission'][n_li], area)
            wgt = jnp.where(ok, p_hat * n_w * n_m, 0.0)
            res_wsum = res_wsum + wgt
            take = (noise(85 + 5 * k)
                    < wgt / jnp.maximum(res_wsum, 1e-12))
            res_li = jnp.where(take, n_li, res_li)
            res_r1 = jnp.where(take, n_r1, res_r1)
            res_r2 = jnp.where(take, n_r2, res_r2)
            res_p = jnp.where(take, p_hat, res_p)
            res_m = res_m + jnp.where(ok, n_m, 0.0)
        big_w = res_wsum / jnp.maximum(
            res_m * jnp.maximum(res_p, 1e-12), 1e-12)

    # --- visibility + shading ------------------------------------------------
    lpos, ln, area = _sample_light_point(lights, res_li, res_r1, res_r2)
    d = lpos - world_pos
    dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-4)
    wi = d / dist[..., None]
    origin = world_pos + normal * 1e-2
    # t_max measured from the OFFSET origin, shortened so the light
    # surface itself never registers as an occluder
    od = lpos - origin
    odist = jnp.maximum(jnp.linalg.norm(od, axis=-1), 1e-4)
    import os

    from toyrenderer_tpu.ops.bvh_pallas import traverse_auto

    # ReSTIR visibility rays point at per-pixel sampled light points —
    # divergent, the block-pair traversal's home turf (TR_RT_CHUNKS=1
    # opts in; default off until the TPU fusion crash is fixed)
    sh = traverse_auto(
        scene_bvh, origin.reshape(-1, 3),
        wi.reshape(-1, 3),
        t_max=(odist * 0.99 - 1e-3).reshape(-1),
        max_steps=max_steps, any_hit=True,
        chunked=os.environ.get('TR_RT_CHUNKS', '0') == '1')
    visible = ~sh['hit'].reshape(h, w)

    emission = lights['emission'][res_li]
    cos_s = jnp.maximum(jnp.sum(normal * wi, -1), 0.0)
    cos_l = jnp.maximum(jnp.sum(ln * -wi, -1), 0.0)
    g = cos_s * cos_l / jnp.maximum(dist * dist, 1e-6)
    lit = (albedo / jnp.pi) * emission * (
        g * lights['area'][res_li] * big_w
        * visible.astype(jnp.float32))[..., None]
    lit = jnp.where((hit_mask & (lights['count'] > 0))[..., None],
                    lit, 0.0)
    return lit, reservoir
