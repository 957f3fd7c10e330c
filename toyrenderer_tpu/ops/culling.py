"""GPU-driven culling: frustum / occlusion / cone tests + screen-error LOD
selection + compacted pair-list building.

Counterpart of source/shaders/gpuculling.hlsl (per-instance frustum cull,
2-phase HZB occlusion vs the PREVIOUS frame's HZB and transforms, screen-
error LOD selection, atomic amplification into bounded indirect args) and
the per-meshlet culling in basepass.hlsl AS_Main:40-122 (frustum + cone +
HZB per meshlet).

TPU design: no atomics — compaction is a cumsum + searchsorted over a
FIXED-capacity pair list (overflow drops work, mirroring the reference's
kMaxThreadGroupsPerDimension overflow drop, gpuculling.hlsl:69-74).
Everything is dense masked math over all instances / pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

from toyrenderer_tpu.ops import hzb as hzb_mod


def sphere_screen_bbox(center_w, radius, view_proj, width, height):
    """Conservative UV bbox + nearest depth of world-space spheres.

    Returns (u0, v0, u1, v1, depth_near, in_front) — all (N,).
    The bbox is built from the 8 corners of the sphere's AABB projected
    conservatively; spheres touching the camera plane are flagged
    in_front=False (treat as visible).
    """
    n = center_w.shape[0]
    offs = jnp.asarray([[sx, sy, sz] for sx in (-1, 1)
                        for sy in (-1, 1) for sz in (-1, 1)], jnp.float32)
    corners = center_w[:, None, :] + offs[None] * radius[:, None, None]
    h = jnp.concatenate([corners, jnp.ones_like(corners[..., :1])], -1)
    clip = jnp.einsum('ij,nkj->nki', view_proj, h)      # (N, 8, 4)
    w = clip[..., 3]
    in_front = jnp.all(w > 1e-6, axis=-1)
    w_safe = jnp.maximum(w, 1e-6)
    u = (clip[..., 0] / w_safe) * 0.5 + 0.5
    v = 0.5 - (clip[..., 1] / w_safe) * 0.5
    # conservative nearest depth from the CENTER projection: w is the
    # view-forward distance, so the sphere's closest point has
    # w_c - radius; z_clip is w-independent per vertex for our projections
    ch = jnp.concatenate([center_w, jnp.ones_like(center_w[..., :1])], -1)
    cclip = jnp.einsum('ij,nj->ni', view_proj, ch)
    d_near = cclip[..., 2] / jnp.maximum(cclip[..., 3] - radius, 1e-6)
    return (u.min(-1), v.min(-1), u.max(-1), v.max(-1),
            d_near, in_front)


def world_spheres(centers_local, radii_local, world):
    """Transform bounding spheres by instance matrices (max-scale radius)."""
    h = jnp.concatenate(
        [centers_local, jnp.ones_like(centers_local[..., :1])], -1)
    c = jnp.einsum('nij,nj->ni', world, h)[..., :3]
    scale = jnp.max(jnp.linalg.norm(world[..., :3, :3], axis=-2), axis=-1)
    return c, radii_local * scale


def frustum_visible(planes, center_w, radius_w):
    d = jnp.einsum('pk,nk->np', planes[:, :3], center_w) + planes[None, :, 3]
    return jnp.all(d >= -radius_w[:, None], axis=-1)


def select_lod(scene, prim_ids, dist, proj_scale_px,
               error_threshold_px: float = 1.0, forced_lod: int = -1,
               error_scale=None):
    """Screen-error LOD pick (gpuculling.hlsl:39-58 semantics): choose the
    coarsest LOD whose object-space error projects below the threshold."""
    errors = scene.prim_lod_error[prim_ids]            # (N, L)
    if error_scale is not None:
        errors = errors * error_scale[:, None]
    counts = scene.prim_lod_count[prim_ids]            # (N,)
    l = errors.shape[1]
    err_px = errors * (proj_scale_px / jnp.maximum(dist, 1e-3))[:, None]
    lod_idx = jnp.arange(l, dtype=jnp.int32)[None, :]
    ok = (err_px <= error_threshold_px) & (lod_idx < counts[:, None])
    # LOD 0 always qualifies (error 0)
    pick = jnp.max(jnp.where(ok, lod_idx, 0), axis=1)
    if forced_lod >= 0:
        pick = jnp.minimum(jnp.full_like(pick, forced_lod), counts - 1)
    return pick


def cull_instances(scene, inst_world, planes, cam_pos, proj_scale_px,
                   width, height, hzb=None, hzb_view_proj=None,
                   hzb_inst_world=None, error_threshold_px: float = 1.0,
                   forced_lod: int = -1):
    """Instance-level culling.

    Occlusion uses `hzb_inst_world`/`hzb_view_proj` (previous frame's
    transforms for the early phase, per gpuculling.hlsl:143-146).

    Returns dict: visible (I,), occluded_candidate (I,), lod (I,).
    """
    prim = scene.inst_prim
    c_l = scene.prim_center[prim]
    r_l = scene.prim_radius[prim]
    c_w, r_w = world_spheres(c_l, r_l, inst_world)

    vis = frustum_visible(planes, c_w, r_w)
    real = jnp.arange(vis.shape[0]) < scene.num_instances
    vis = vis & real

    dist = jnp.linalg.norm(c_w - cam_pos[None], axis=-1)
    # LOD errors are object-space: scale by the instance's max axis scale
    inst_scale = jnp.max(
        jnp.linalg.norm(inst_world[..., :3, :3], axis=-2), axis=-1)
    lod = select_lod(scene, prim, jnp.maximum(dist - r_w, 1e-3),
                     proj_scale_px, error_threshold_px, forced_lod,
                     error_scale=inst_scale)

    occluded = jnp.zeros_like(vis)
    if hzb is not None:
        c_prev, r_prev = world_spheres(
            c_l, r_l, hzb_inst_world if hzb_inst_world is not None
            else inst_world)
        u0, v0, u1, v1, d_near, in_front = sphere_screen_bbox(
            c_prev, r_prev, hzb_view_proj, width, height)
        hzb_vis = hzb_mod.hzb_test_bbox(
            hzb, u0, v0, u1, v1, d_near, width, height)
        occluded = vis & in_front & ~hzb_vis
        vis = vis & ~occluded
    return dict(visible=vis, occluded_candidate=occluded, lod=lod)


def build_pairs(scene, inst_mask, lod, capacity: int):
    """Compact (instance, meshlet) pairs for masked instances at their
    selected LODs into a fixed-capacity list.

    Returns (pair_inst (C,), pair_meshlet (C,), pair_valid (C,), total).
    """
    prim = scene.inst_prim
    i_idx = jnp.arange(prim.shape[0])
    counts = jnp.where(
        inst_mask,
        scene.prim_meshlet_count[prim, lod], 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    starts = cum - counts

    j = jnp.arange(capacity, dtype=jnp.int32)
    inst = jnp.searchsorted(cum, j, side='right').astype(jnp.int32)
    valid = j < jnp.minimum(total, capacity)
    inst_safe = jnp.minimum(inst, prim.shape[0] - 1)
    local = j - starts[inst_safe]
    meshlet = (scene.prim_meshlet_offset[prim[inst_safe], lod[inst_safe]]
               + local)
    meshlet = jnp.where(valid, meshlet, 0)
    return inst_safe, meshlet, valid, total


def cull_meshlets(scene, pair_inst, pair_meshlet, pair_valid, inst_world,
                  planes, cam_pos, width, height,
                  hzb=None, hzb_view_proj=None, cone_cull: bool = True):
    """Per-meshlet culling for a pair list (basepass.hlsl AS_Main parity:
    frustum + cone + optional HZB).  Returns refined pair_valid."""
    c_l = scene.meshlet_center[pair_meshlet]
    r_l = scene.meshlet_radius[pair_meshlet]
    world = inst_world[pair_inst]
    c_w, r_w = world_spheres(c_l, r_l, world)

    ok = pair_valid & frustum_visible(planes, c_w, r_w)

    if cone_cull:
        axis_l = scene.meshlet_cone_axis[pair_meshlet]
        cutoff = scene.meshlet_cone_cutoff[pair_meshlet]
        rot = world[..., :3, :3]
        axis_w = jnp.einsum('nij,nj->ni', rot, axis_l)
        axis_w = axis_w / jnp.maximum(
            jnp.linalg.norm(axis_w, axis=-1, keepdims=True), 1e-8)
        to_c = c_w - cam_pos[None]
        dist = jnp.linalg.norm(to_c, axis=-1)
        # backfacing cluster: dot(view->center, axis) >= cutoff*dist + r
        backfacing = (jnp.sum(to_c * axis_w, -1)
                      >= cutoff * dist + r_w)
        # double-sided materials skip cone culling (alpha-masked set parity)
        mat = scene.prim_material[scene.meshlet_prim[pair_meshlet]]
        ds = scene.mat_double_sided[mat] != 0
        ok = ok & (ds | ~backfacing | (cutoff >= 1.0))

    if hzb is not None:
        u0, v0, u1, v1, d_near, in_front = sphere_screen_bbox(
            c_w, r_w, hzb_view_proj, width, height)
        hzb_vis = hzb_mod.hzb_test_bbox(
            hzb, u0, v0, u1, v1, d_near, width, height)
        ok = ok & (~in_front | hzb_vis)
    return ok
