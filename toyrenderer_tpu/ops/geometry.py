"""Geometry stage: node hierarchy -> world matrices -> clip-space meshlet
triangles (dense, jit-safe).

Counterpart of the reference's GPU instance-transform pass
(source/shaders/updateinstanceconsts.hlsl:12-53 walks each node's parent
chain per GPU thread; source/BasePassRenderers.cpp:125-162 drives it).
TPU-first design: the hierarchy is resolved with `node_depth` batched
compose passes over the whole node array — no divergent walks — and the
meshlet->triangle expansion is one dense gather producing fixed-shape
(T, 3, 4) clip-space vertices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.mathlib.transforms import adjugate3, compose_trs


def node_world_matrices(scene, node_translation, node_rotation, node_scale):
    """(N,4,4) world matrices from per-node local TRS + static parent array.

    `scene.node_depth` is static, so this unrolls to `depth-1` batched
    4x4 matmul passes — each pass resolves one more hierarchy level.
    """
    local = compose_trs(node_translation, node_rotation, node_scale)
    parent = scene.node_parent
    has_parent = parent >= 0
    parent_safe = jnp.maximum(parent, 0)
    world = local
    for _ in range(max(scene.node_depth - 1, 0)):
        gathered = world[parent_safe]
        composed = jnp.einsum('nij,njk->nik', gathered, local)
        world = jnp.where(has_parent[:, None, None], composed, world)
    return world


def instance_transforms(scene, world):
    """Per-instance world matrix + adjugate normal matrix.

    Returns (I,4,4) world and (I,3,3) adjugate (normal transform that is
    correct under non-uniform scale, as in toyrenderer_common.hlsli).
    """
    inst_world = world[scene.inst_node]
    return inst_world, adjugate3(inst_world)


def meshlet_clip_triangles(scene, inst_world, view_proj,
                           pair_inst, pair_meshlet, pair_valid=None):
    """Expand (instance, meshlet) pairs into clip-space triangles.

    Args:
      inst_world: (I, 4, 4) instance world matrices.
      view_proj: (4, 4) jittered view-projection.
      pair_inst / pair_meshlet: (Tp,) i32 — the visible-meshlet list (from
        culling, or the static all-meshlets list).

    Returns a dict of dense (T = Tp*96, ...) arrays:
      clip: (T, 3, 4) clip-space vertices
      vtx_ids: (T, 3) i32 global vertex indices
      inst_id / mat_id: (T,) i32
      double_sided: (T,) bool
      tri_valid: (T,) bool (padding triangles beyond tri_count are invalid)
    """
    tris = scene.meshlet_tris[pair_meshlet]          # (Tp, 96, 3)
    tp, mt, _ = tris.shape
    tri_in_meshlet = jnp.broadcast_to(
        jnp.arange(mt, dtype=jnp.int32)[None, :], (tp, mt))
    tri_valid = tri_in_meshlet < scene.meshlet_tri_count[pair_meshlet][:, None]
    if pair_valid is not None:
        tri_valid = tri_valid & pair_valid[:, None]

    prim = scene.meshlet_prim[pair_meshlet]          # (Tp,)
    mat = scene.prim_material[prim]                  # (Tp,)
    double_sided = scene.mat_double_sided[mat] != 0  # (Tp,)

    world = inst_world[pair_inst]                    # (Tp, 4, 4)
    mvp = jnp.einsum('ij,tjk->tik', view_proj, world)  # (Tp, 4, 4)

    if getattr(scene, 'ml_verts', None) is not None:
        # meshlet-window fetch (see gbuffer.pack_resolve_records): one
        # contiguous 64-vertex block per pair + exact one-hot assembly
        # replaces (Tp, 96, 3) latency-bound random position gathers;
        # transforming at window rate is also 4.5x fewer MACs
        win = scene.ml_verts[pair_meshlet]           # (Tp, 64, 8)
        lt = scene.ml_local_tris[pair_meshlet]       # (Tp, 96, 3)
        wpos = win[..., 0:3]
        wpos_h = jnp.concatenate(
            [wpos, jnp.ones_like(wpos[..., :1])], -1)
        clip_w = jnp.einsum('tik,tvk->tvi', mvp, wpos_h)  # (Tp, 64, 4)
        oh = (lt[..., None]
              == jnp.arange(win.shape[1], dtype=lt.dtype)
              ).astype(clip_w.dtype)                 # (Tp, 96, 3, 64)
        clip = jnp.einsum('tmvk,tkc->tmvc', oh, clip_w,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        obj = scene.positions[tris]                  # (Tp, 96, 3, 3)
        obj_h = jnp.concatenate(
            [obj, jnp.ones_like(obj[..., :1])], axis=-1)
        clip = jnp.einsum('tik,tmvk->tmvi', mvp, obj_h)  # (Tp, 96, 3, 4)

    rep = lambda x: jnp.repeat(x, mt, axis=0)
    return dict(
        clip=clip.reshape(tp * mt, 3, 4),
        vtx_ids=tris.reshape(tp * mt, 3),
        inst_id=rep(pair_inst.astype(jnp.int32)),
        mat_id=rep(mat.astype(jnp.int32)),
        double_sided=rep(double_sided),
        tri_valid=tri_valid.reshape(tp * mt),
        # (Tp,) pair arrays ride along for pair-rate consumers (the
        # meshlet-window record fetch in gbuffer.pack_resolve_records)
        pair_meshlet=pair_meshlet.astype(jnp.int32),
        pair_inst=pair_inst.astype(jnp.int32),
    )


def rt_lod_pairs(scene_host, alpha_filter: str = 'all',
                 budget_tris: int = 500_000):
    """RT-topology pair list at the finest LOD whose triangle count fits
    the budget — Bistro-scale scenes trace shadow/GI rays against
    simplified geometry (primary visibility stays rasterized at full
    LOD; the RT tree must fit the traversal kernel's VMEM box budget).
    Returns (pair_inst, pair_meshlet, lod)."""
    import numpy as np
    max_lods = int(np.asarray(scene_host.prim_meshlet_offset).shape[1])
    counts = np.asarray(scene_host.meshlet_tri_count)
    for lod in range(max_lods):
        pi, pm = static_meshlet_pairs(scene_host, alpha_filter, lod=lod)
        tris = int(counts[np.asarray(pm)].sum())
        if tris <= budget_tris or lod == max_lods - 1:
            return pi, pm, lod
    return pi, pm, max_lods - 1


def static_meshlet_pairs(scene_host, alpha_filter: str = 'all',
                         lod: int = 0):
    """Host helper: the no-culling (instance, meshlet) pair list at a
    fixed LOD (default LOD0).

    Uses the *host* SceneBuffers (numpy) — this is the pre-culling fallback
    and the capacity bound for the culling kernel's compacted output.
    alpha_filter: 'all' | 'opaque' (opaque + alpha-masked) |
    'opaque_strict' (no masked) | 'mask' | 'blend' — the alpha-mode set
    split of the reference's base pass / transparent forward.
    lod: requested LOD per primitive, clamped to its coarsest built
    level — lod > 0 is the RT-topology budget knob for Bistro-scale
    scenes (shadow/GI rays trace simplified geometry; primary
    visibility stays rasterized at full detail).
    """
    import numpy as np
    from toyrenderer_tpu.scene.gltf import ALPHA_BLEND, ALPHA_MASK
    pi, pm = [], []
    for i in range(scene_host.num_instances):
        p = int(scene_host.inst_prim[i])
        mode = int(scene_host.mat_alpha_mode[
            int(scene_host.prim_material[p])])
        if alpha_filter == 'opaque' and mode == ALPHA_BLEND:
            continue
        if alpha_filter == 'opaque_strict' and mode != 0:
            continue
        if alpha_filter == 'not_mask' and mode == ALPHA_MASK:
            continue
        if alpha_filter == 'mask' and mode != ALPHA_MASK:
            continue
        if alpha_filter == 'blend' and mode != ALPHA_BLEND:
            continue
        li = lod
        while li > 0 and int(scene_host.prim_meshlet_count[p, li]) == 0:
            li -= 1
        off = int(scene_host.prim_meshlet_offset[p, li])
        cnt = int(scene_host.prim_meshlet_count[p, li])
        pi.extend([i] * cnt)
        pm.extend(range(off, off + cnt))
    if not pi:
        if alpha_filter in ('blend', 'mask'):
            return (np.zeros(0, np.int32), np.zeros(0, np.int32))
        # the base (opaque) set cannot be empty — the frame needs >= 1
        # raster pair.  A scene with ZERO opaque instances degenerates:
        # instance 0 pads the set and renders opaque (document over
        # support; the reference's base pass also assumes an opaque set)
        pi, pm = [0], [0]
    return (np.asarray(pi, np.int32), np.asarray(pm, np.int32))
