"""BVH build + traversal: the TPU replacement for DXR acceleration
structures and RayQuery (reference: BLAS/TLAS creation in
source/Visual.cpp:509-542 + source/Scene.cpp:411-466, inline-RT consumers
in shadowmask.hlsl / giprobetrace.hlsl).

Design (TPU-first, no pointers, no stacks in memory):
* One WORLD-SPACE BVH over all triangles, rebuilt (morton sort + level
  reductions) per frame inside jit — the analogue of the reference's
  GPU-updated TLAS-over-BLAS (it also rebuilds the TLAS every frame).
* COMPLETE 8-ary tree over morton-sorted leaf groups of LEAF_TRIS
  triangles: level l holds 8^l nodes; child links are implicit
  (node i -> 8i+k).  STORAGE is prefix-truncated: valid groups sort
  first, so each level's reachable nodes are a prefix and only
  ceil(n_real / 8^depth) rows are kept per level (level_offset maps
  level -> row offset).
* Traversal is lockstep masked DFS over all rays simultaneously: per-ray
  state is (level, index-path, one 8-bit visit mask per level) — bounded
  iteration, no divergence beyond masking, the classic SIMT->SIMD
  reshaping.  `max_steps` bounds cost; unfinished rays report conservative
  results (shadow: lit).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LEAF_TRIS = 12   # 12 tris/leaf row = 120 of the 128 VMEM lanes a row
#                  physically occupies (Mosaic pads the minor dim to 128
#                  lanes, so 8-tri/80-float rows wasted 37% of leaf VMEM
#                  and an extra tree level)
ARITY = 8


def _expand_bits(v):
    """Spread 10 bits to every 3rd bit (morton)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3d(p01):
    """(N, 3) coords in [0,1] -> (N,) uint32 30-bit morton codes."""
    q = jnp.clip(p01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return ((_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1)
            | _expand_bits(q[:, 2]))


@dataclass
class Bvh:
    """Pytree: row-gather-friendly flattened tree.

    Gather discipline (the TPU bottleneck is per-element gather count, not
    bytes): everything a traversal step needs is ONE contiguous row —
    `child_boxes` packs all 8 children's lo/hi per PARENT row (48 f32);
    `leaf_rows` packs the 8 leaf triangles' v0/e1/e2 + payload per GROUP
    row (80 f32).
    """
    child_boxes: jnp.ndarray     # (total_parents, 48) f32:
    #                              8 x [lo.xyz, hi.xyz] per parent node
    level_offset: tuple          # static: offset of each PARENT level
    num_levels: int              # static: leaf level == num_levels - 1
    leaf_rows: jnp.ndarray       # (Ng, 80) f32: 8 x [v0.xyz e1.xyz e2.xyz
    #                              payload-as-f32]; payload -1 = padding


def _register():
    arr = ('child_boxes', 'leaf_rows')
    static = ('level_offset', 'num_levels')
    jax.tree_util.register_pytree_node(
        Bvh,
        lambda b: (tuple(getattr(b, f) for f in arr),
                   tuple(getattr(b, f) for f in static)),
        lambda aux, ch: Bvh(**dict(zip(arr, ch)),
                            **dict(zip(static, aux))))


_register()


def _level_sizes(n_levels: int, n_real_groups: int) -> list:
    """Stored parent-row count per level 0..n_levels-2: the reachable
    prefix ceil(n_real / 8^depth), 8-row aligned, capped at the complete
    level size."""
    sizes = []
    for l in range(n_levels - 1):
        depth = (n_levels - 1) - l
        n = -(-max(n_real_groups, 1) // ARITY ** depth)
        sizes.append(min(-(-n // 8) * 8, ARITY ** l))
    return sizes


def num_levels_for(n_tris: int) -> int:
    n_groups = max(-(-n_tris // LEAF_TRIS), 1)
    levels = 1
    while ARITY ** (levels - 1) < n_groups:
        levels += 1
    return levels


def build_bvh(v0, v1, v2, valid, n_levels: int | None = None) -> Bvh:
    """Build the BVH from world-space triangles (T, 3) x3 + validity mask.

    n_levels must be static; derive it from the static T via
    num_levels_for(T).
    """
    t = v0.shape[0]
    if n_levels is None:
        n_levels = num_levels_for(t)
    n_groups = ARITY ** (n_levels - 1)

    big = jnp.float32(3e37)
    centroid = (v0 + v1 + v2) * (1.0 / 3.0)
    lo = jnp.min(jnp.where(valid[:, None], centroid, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], centroid, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    codes = morton3d((centroid - lo) / ext)
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))

    order = jnp.argsort(codes)
    v0s, v1s, v2s = v0[order], v1[order], v2[order]
    valid_s = valid[order]
    payload = jnp.where(valid_s, order.astype(jnp.int32), -1)

    # pad to n_groups * 8 triangles
    cap = n_groups * LEAF_TRIS
    def pad(x, fill=0.0):
        if x.shape[0] >= cap:
            return x[:cap]
        pw = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw, constant_values=fill)
    v0s, v1s, v2s = pad(v0s), pad(v1s), pad(v2s)
    payload = pad(payload, -1)
    n_real = min(-(-t // LEAF_TRIS), n_groups)
    return _pack_tree(v0s, v1s - v0s, v2s - v0s, payload, n_levels, n_real)


def _pack_tree(v0s, e1s, e2s, payload, n_levels: int, n_real_groups: int
               ) -> Bvh:
    """Pack morton-ORDERED padded triangles (n_groups*8 rows, v0 + edge
    vectors, payload -1 = padding) into the flattened complete-tree Bvh.
    Shared by the per-frame full rebuild and the refit path."""
    n_groups = ARITY ** (n_levels - 1)
    big = jnp.float32(3e37)
    valid_p = payload >= 0
    v1s = v0s + e1s
    v2s = v0s + e2s

    tri_lo = jnp.minimum(jnp.minimum(v0s, v1s), v2s)
    tri_hi = jnp.maximum(jnp.maximum(v0s, v1s), v2s)
    tri_lo = jnp.where(valid_p[:, None], tri_lo, big)
    tri_hi = jnp.where(valid_p[:, None], tri_hi, -big)

    # leaf-level group AABBs, then reduce by ARITY up the levels.
    # Empty boxes (all-padding subtrees) reduce to (big, -big); collapse
    # them to a far POINT so the orientation-agnostic slab test rejects
    # them — inverted min/max sentinels would otherwise read as an
    # infinite box and traversals would walk every padding leaf.
    def _seal(lo, hi):
        empty = (lo[..., :1] > hi[..., :1])
        return (jnp.where(empty, big, lo), jnp.where(empty, big, hi))

    # reductions stay on the raw (big, -big) sentinels (neutral for
    # min/max); sealing happens only when PACKING child rows below
    level_lo = [tri_lo.reshape(n_groups, LEAF_TRIS, 3).min(1)]
    level_hi = [tri_hi.reshape(n_groups, LEAF_TRIS, 3).max(1)]
    for _ in range(n_levels - 1):
        level_lo.insert(0, level_lo[0].reshape(-1, ARITY, 3).min(1))
        level_hi.insert(0, level_hi[0].reshape(-1, ARITY, 3).max(1))

    # pack CHILD boxes per parent row: level l parents hold level l+1
    # children: (8^l, 8 children x [lo.xyz hi.xyz]) = (8^l, 48).
    # PREFIX TRUNCATION: valid leaf groups are a morton-sorted PREFIX, so
    # the reachable nodes of every level are a prefix too — store only
    # ceil(n_real / 8^depth) rows per level (sublane-aligned) instead of
    # the dense complete level.  A Sponza-scale tree shrinks ~8x (the
    # deepest level of a complete tree is mostly empty padding).
    # COMPONENT-MAJOR rows ([lox x8 | loy x8 | loz x8 | hix | hiy | hiz]):
    # the Pallas kernel transposes a row to (48, 1) and takes contiguous
    # (8, 1) sublane slices per component — the only layout Mosaic can
    # turn into vector columns without gathers or strided slices.
    sizes = _level_sizes(n_levels, n_real_groups)
    rows = []
    for l in range(n_levels - 1):
        clo, chi = _seal(level_lo[l + 1], level_hi[l + 1])
        clo = clo.reshape(-1, ARITY, 3)
        chi = chi.reshape(-1, ARITY, 3)
        both = jnp.concatenate([clo, chi], axis=-1)     # (n, 8, 6)
        rows.append(both.transpose(0, 2, 1).reshape(-1, 48)[:sizes[l]])
    child_boxes = (jnp.concatenate(rows, axis=0) if rows
                   else jnp.zeros((1, 48), jnp.float32))
    offsets = tuple(int(x) for x in np.cumsum([0] + sizes)[:-1])

    # pack leaf rows: (Ng, 8 tris x [v0 e1 e2 payload]) = (Ng, 80).
    # The morton sort puts valid triangles first, so groups past
    # ceil(T/8) are all padding with inverted parent AABBs — traversal
    # can never reach them; store only the reachable prefix (complete-
    # tree padding would otherwise waste up to 8x leaf memory).
    leaf = jnp.concatenate([
        v0s, e1s, e2s,
        payload.astype(jnp.float32)[:, None],
    ], axis=1)                                          # (Ng*12, 10)
    # component-major rows (see child_boxes note): [v0x x12 | v0y x12 |
    # ... | pay x12]
    leaf_rows = leaf.reshape(n_groups, LEAF_TRIS, 10).transpose(
        0, 2, 1).reshape(n_groups, LEAF_TRIS * 10)
    n_real = -(-n_real_groups // 8) * 8                 # sublane align
    n_real = min(n_real, n_groups)
    leaf_rows = leaf_rows[:n_real]

    return Bvh(child_boxes=child_boxes, level_offset=offsets,
               num_levels=n_levels, leaf_rows=leaf_rows)


@dataclass
class RtStatic:
    """Static ray-tracing topology — the BLAS-cache analogue.

    The reference builds one BLAS per mesh ONCE (compaction-allowed,
    source/Visual.cpp:509-542) and per frame only updates instance
    transforms + rebuilds the TLAS (source/Scene.cpp:411-466,
    source/BasePassRenderers.cpp:125-162).  The TPU-first equivalent:
    freeze the morton ORDER (tree topology) from the rest pose at scene
    load, store object-space triangles + their instance ids in that order,
    and per frame only REFIT — transform leaves by the current instance
    matrices and re-reduce the AABB levels bottom-up.  No per-frame sort,
    no hierarchy rebuild; traversal is unchanged.  Instance motion only
    loosens AABBs (slower traversal, never wrong); rebuild via build_bvh
    remains the fallback for topology-changing deformation.

    Arrays are in morton order, padded to a multiple of 8 covering the
    reachable leaf-group prefix (valid triangles sort first).
    """
    obj_v0: jnp.ndarray          # (cap, 3) f32 object-space v0
    obj_e1: jnp.ndarray          # (cap, 3) f32 object-space v1 - v0
    obj_e2: jnp.ndarray          # (cap, 3) f32 object-space v2 - v0
    tri_inst: jnp.ndarray        # (cap,) i32 instance id (0 for padding)
    payload: jnp.ndarray         # (cap,) i32 pair-order tri id; -1 pad
    pair_keep: jnp.ndarray       # (Tcat,) bool: per pair-stream triangle
    #                              alpha-coverage keep (all-True when no
    #                              masked set); consumed by the sun-map
    #                              raster so cutout casters match the tree
    num_levels: int              # static
    n_real_groups: int           # static: reachable leaf-group prefix
    n_mask_pairs: int = 0        # static: alpha-masked pairs appended to
    #                              the pair list (payload indexes the
    #                              CONCATENATED opaque+masked stream)


def _register_rt_static():
    arr = ('obj_v0', 'obj_e1', 'obj_e2', 'tri_inst', 'payload',
           'pair_keep')
    static = ('num_levels', 'n_real_groups', 'n_mask_pairs')
    jax.tree_util.register_pytree_node(
        RtStatic,
        lambda b: (tuple(getattr(b, f) for f in arr),
                   tuple(getattr(b, f) for f in static)),
        lambda aux, ch: RtStatic(**dict(zip(arr, ch)),
                                 **dict(zip(static, aux))))


_register_rt_static()


def alpha_coverage_keep(scene_host, pair_inst, pair_meshlet,
                        thresh: float = 0.3,
                        samples: int = 7) -> np.ndarray:
    """(T,) bool per pair-expanded triangle: mean alpha-test coverage of
    the triangle's base-color texture >= thresh.

    The reference's shadow/GI rays alpha-test cutout hits inside the
    any-hit (shadowmask.hlsl alpha-mask emulation).  Per-texel tests in
    the packet traversal would need UV + texture plumbing per leaf
    triangle, so the frozen RT topology instead PRE-CLASSIFIES each
    alpha-masked triangle at scene load: a handful of barycentric
    samples of the base texture's alpha at a coarse mip — triangles
    lying inside cutout holes drop from the tree, mostly-opaque ones
    occlude (VERDICT r2 #5 'conservatively pre-classify').  Host-side
    numpy; runs once.
    """
    tris = np.asarray(scene_host.meshlet_tris)[np.asarray(pair_meshlet)]
    tp, mt, _ = tris.shape
    counts = np.asarray(scene_host.meshlet_tri_count)[
        np.asarray(pair_meshlet)]
    valid = (np.arange(mt)[None, :] < counts[:, None]).reshape(-1)
    flat = tris.reshape(-1, 3)
    uv = np.asarray(scene_host.uvs)[flat]                # (T, 3, 2)
    prim = np.asarray(scene_host.meshlet_prim)[np.asarray(pair_meshlet)]
    mat = np.repeat(np.asarray(scene_host.prim_material)[prim], mt)
    entry = np.asarray(scene_host.mat_base_color_tex)[mat]
    cutoff = np.asarray(scene_host.mat_alpha_cutoff)[mat]
    base_a = np.asarray(scene_host.mat_base_color)[mat, 3]

    # barycentric sample set (interior-biased)
    bw = np.asarray([(1 / 3, 1 / 3), (0.6, 0.2), (0.2, 0.6), (0.2, 0.2),
                     (0.45, 0.45), (0.1, 0.45), (0.45, 0.1)],
                    np.float32)[:samples]
    w = np.stack([1.0 - bw[:, 0] - bw[:, 1], bw[:, 0], bw[:, 1]], -1)
    uv_s = np.einsum('sk,tkc->tsc', w, uv)               # (T, S, 2)

    texels = getattr(scene_host, 'tex_texels', None)
    off_t = getattr(scene_host, 'tex_offset', None)
    keep = base_a >= np.minimum(cutoff, 0.999)           # untextured
    if texels is not None and off_t is not None and np.any(entry >= 0):
        texels = np.asarray(texels)
        off_t = np.asarray(off_t)
        w_t = np.asarray(scene_host.tex_width)
        h_t = np.asarray(scene_host.tex_height)
        nm_t = np.asarray(scene_host.tex_num_mips)
        wrap = np.asarray(scene_host.tex_wrap)
        # per texture: a coarse RESIDENT mip (~<=64x64)
        n_tex = off_t.shape[0]
        mip_of = np.zeros(n_tex, np.int32)
        for t in range(n_tex):
            m = max(int(nm_t[t]) - 1, 0)
            while m > 0 and (off_t[t, m] < 0
                             or w_t[t, m] * h_t[t, m] < 32 * 32):
                m -= 1
            while m > 0 and off_t[t, m] < 0:
                m -= 1
            mip_of[t] = m
        e = np.maximum(entry, 0)
        m = mip_of[e]
        ww = w_t[e, m].astype(np.float32)
        hh = h_t[e, m].astype(np.float32)
        u = uv_s[..., 0]
        v = uv_s[..., 1]
        is_rep = (wrap[e] == 0)[:, None]
        u = np.where(is_rep, u - np.floor(u), np.clip(u, 0.0, 1.0))
        v = np.where(is_rep, v - np.floor(v), np.clip(v, 0.0, 1.0))
        wi = w_t[e, m].astype(np.int64)[:, None]
        hi_ = h_t[e, m].astype(np.int64)[:, None]
        x = np.minimum((u * ww[:, None]).astype(np.int64), wi - 1)
        y = np.minimum((v * hh[:, None]).astype(np.int64), hi_ - 1)
        row = off_t[e, m].astype(np.int64)[:, None] + y * wi + x
        row = np.clip(row, 0, texels.shape[0] - 1)
        alpha = ((texels[row, 0] >> 24) & 0xFF) / 255.0  # (T, S)
        cov = (alpha * base_a[:, None]
               >= cutoff[:, None]).mean(axis=1)
        keep = np.where(entry >= 0, cov >= thresh, keep)
    return keep & valid


def _median8_order(centroid: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Static-topology triangle order: recursive forced-size best-axis
    median partition of the complete tree's leaf-group slots (invalid
    triangles last, valid groups stay a contiguous prefix so the
    per-level prefix truncation holds).

    Replaces the morton sort for the FROZEN topology (build_rt_static
    only — the in-jit build_bvh fallback keeps morton, which is
    jit-friendly): morton bit-slicing ignores geometry extents, so
    sibling boxes overlap more than a median split's.  Measured on the
    courtyard packet workload: 1.10x fewer internal and 1.21x fewer
    leaf packet-visits than morton at identical storage/refit/kernel.
    (An adaptive SAH tree is worth another ~1.35x but needs explicit
    child pointers — a separate container/kernel.)
    """
    ids = np.nonzero(valid)[0]
    n = len(ids)
    if n == 0:
        return np.argsort(~valid, kind='stable').astype(np.int32)
    cent = centroid[ids]
    vg = -(-n // LEAF_TRIS)
    levels = num_levels_for(n)
    total_slots = ARITY ** (levels - 1)
    out = np.empty(n, np.int64)
    pos = [0]

    def rec(idxs, slots):
        if slots == 1 or len(idxs) <= LEAF_TRIS:
            out[pos[0]:pos[0] + len(idxs)] = idxs
            pos[0] += len(idxs)
            return
        sub = slots // ARITY
        rem = idxs
        for c in range(ARITY):
            if len(rem) == 0:
                break
            take = min(sub * LEAF_TRIS, len(rem))
            if c == ARITY - 1 or take == len(rem):
                part, rem2 = rem, rem[:0]
            else:
                cc = cent[rem]
                ax = int(np.argmax(cc.max(0) - cc.min(0)))
                sel = np.argpartition(cc[:, ax], take - 1)
                part, rem2 = rem[sel[:take]], rem[sel[take:]]
            rec(part, sub)
            rem = rem2

    rec(np.arange(n), total_slots)
    inval = np.nonzero(~valid)[0]
    return np.concatenate([ids[out], inval]).astype(np.int32)


def _pair_world_tris(scene_host, pair_inst, pair_meshlet,
                     rest_inst_world=None):
    """Host-side pair-list expansion to triangles: returns (obj (T,3,3)
    object-space verts, inst (T,) i32, w (T,3,3) rest-pose world verts,
    valid (T,) bool).  Shared by the static-topology builders."""
    if rest_inst_world is None:
        from toyrenderer_tpu.scene.scenebuild import _world_matrices_host
        nw = _world_matrices_host(
            scene_host.node_parent, scene_host.node_translation,
            scene_host.node_rotation, scene_host.node_scale)
        rest_inst_world = nw[np.asarray(scene_host.inst_node)]
    tris = np.asarray(scene_host.meshlet_tris)[np.asarray(pair_meshlet)]
    tp, mt, _ = tris.shape                               # (Tp, 96, 3)
    counts = np.asarray(scene_host.meshlet_tri_count)[
        np.asarray(pair_meshlet)]
    valid = (np.arange(mt)[None, :] < counts[:, None]).reshape(-1)

    pos = np.asarray(scene_host.positions)
    obj = pos[tris.reshape(-1, 3)]                       # (T, 3, 3)
    inst = np.repeat(np.asarray(pair_inst, np.int32), mt)
    world = np.asarray(rest_inst_world)[inst]            # (T, 4, 4)
    obj_h = np.concatenate([obj, np.ones_like(obj[..., :1])], axis=-1)
    w = np.einsum('tik,tvk->tvi', world, obj_h)[..., :3]
    return obj, inst, w, valid


def transform_leaf_tris(tri_inst, obj_v0, obj_e1, obj_e2, inst_world):
    """In-jit object->world transform of static leaf triangles by the
    current instance matrices.  The matrix fetch is a one-hot MXU matmul
    in hi/lo bf16 (f32 dot_general silently rounds to ONE bf16 pass on
    TPU; the hi/lo split restores ~2^-17 relative accuracy) — gathers at
    triangle rate are latency-bound, matmuls are not."""
    n_inst = inst_world.shape[0]
    cap = tri_inst.shape[0]
    w_flat = inst_world.reshape(n_inst, 16)
    onehot = (tri_inst[:, None]
              == jnp.arange(n_inst, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)                      # (cap, I)
    hi = w_flat.astype(jnp.bfloat16).astype(jnp.float32)
    lo_p = w_flat - hi
    w_tri = (jnp.dot(onehot, hi, precision=jax.lax.Precision.DEFAULT)
             + jnp.dot(onehot, lo_p,
                       precision=jax.lax.Precision.DEFAULT))
    w_tri = w_tri.reshape(cap, 4, 4)
    r = w_tri[:, :3, :3]
    t = w_tri[:, :3, 3]

    tf = lambda v: jnp.einsum('tij,tj->ti', r, v)
    return tf(obj_v0) + t, tf(obj_e1), tf(obj_e2)


def rt_pairs_with_mask(scene_host, pair_inst, pair_meshlet,
                       mask_pair_inst, mask_pair_meshlet):
    """Append the alpha-masked pair set (coverage-classified, see
    alpha_coverage_keep) to the opaque RT pair list.  Returns
    (pair_inst, pair_meshlet, keep (T,) bool-or-None, n_mask_pairs) —
    keep spans the CONCATENATED pair-tri stream."""
    if mask_pair_inst is None or len(mask_pair_inst) == 0:
        return pair_inst, pair_meshlet, None, 0
    mk_i = np.asarray(mask_pair_inst, np.int32)
    mk_m = np.asarray(mask_pair_meshlet, np.int32)
    pi = np.concatenate([np.asarray(pair_inst, np.int32), mk_i])
    pm = np.concatenate([np.asarray(pair_meshlet, np.int32), mk_m])
    keep_m = alpha_coverage_keep(scene_host, mk_i, mk_m)
    mt = np.asarray(scene_host.meshlet_tris).shape[1]
    keep = np.concatenate(
        [np.ones(len(np.asarray(pair_inst)) * mt, bool), keep_m])
    return pi, pm, keep, len(mk_i)


def build_rt_static(scene_host, pair_inst, pair_meshlet,
                    rest_inst_world=None, mask_pair_inst=None,
                    mask_pair_meshlet=None) -> RtStatic:
    """One-time (scene load) construction of the static RT topology over
    the full pair list — the analogue of Mesh::BuildBLAS.  The order is
    derived from REST-POSE world centroids (computed from the host scene's
    node TRS unless rest_inst_world is given); triangles are stored in
    OBJECT space so refit_bvh can re-transform them each frame.

    scene_host: SceneBuffers (numpy); pair_inst/pair_meshlet: host or
    device i32 arrays (the FULL RT pair list, normally LOD0 no-culling).
    mask_pair_inst/mask_pair_meshlet: optional alpha-masked set — its
    triangles join the tree when their alpha coverage passes the
    pre-classification (shadowmask.hlsl any-hit alpha parity)."""
    pair_inst, pair_meshlet, keep, n_mask = rt_pairs_with_mask(
        scene_host, pair_inst, pair_meshlet, mask_pair_inst,
        mask_pair_meshlet)
    obj, inst, w, valid = _pair_world_tris(
        scene_host, pair_inst, pair_meshlet, rest_inst_world)
    if keep is not None:
        valid = valid & keep
    t = w.shape[0]
    n_levels = num_levels_for(t)
    n_groups = ARITY ** (n_levels - 1)

    centroid = w.mean(axis=1)
    order = _median8_order(centroid, valid)

    n_valid = int(valid.sum())
    n_real = min(-(-max(n_valid, 1) // LEAF_TRIS), n_groups)
    n_real = min(-(-n_real // 8) * 8, n_groups)          # sublane align
    cap = n_real * LEAF_TRIS
    order = order[:cap]
    obj_s = obj[order]
    pay = np.where(valid[order], order, -1).astype(np.int32)
    inst_s = np.where(pay >= 0, inst[order], 0).astype(np.int32)
    if cap > len(order):                                 # tiny scenes
        extra = cap - len(order)
        obj_s = np.pad(obj_s, [(0, extra), (0, 0), (0, 0)])
        pay = np.pad(pay, (0, extra), constant_values=-1)
        inst_s = np.pad(inst_s, (0, extra))

    return RtStatic(
        obj_v0=jnp.asarray(obj_s[:, 0]),
        obj_e1=jnp.asarray(obj_s[:, 1] - obj_s[:, 0]),
        obj_e2=jnp.asarray(obj_s[:, 2] - obj_s[:, 0]),
        tri_inst=jnp.asarray(inst_s),
        payload=jnp.asarray(pay),
        pair_keep=jnp.asarray(keep if keep is not None
                              else np.ones(t, bool)),
        num_levels=n_levels,
        n_real_groups=n_real,
        n_mask_pairs=n_mask)


def refit_bvh(rts: RtStatic, inst_world) -> Bvh:
    """Per-frame refit: transform the static object-space leaves by the
    current instance matrices and rebuild only the AABB levels (the
    reference's per-frame TLAS update, Scene.cpp:411-466).  Runs inside
    the frame jit; cost is one instance-matrix fetch + elementwise
    transforms + log8 min/max reductions — no sort.

    The instance-matrix fetch is a one-hot MXU matmul in hi/lo bf16
    (see transform_leaf_tris).
    """
    cap = rts.tri_inst.shape[0]
    v0w, e1w, e2w = transform_leaf_tris(
        rts.tri_inst, rts.obj_v0, rts.obj_e1, rts.obj_e2, inst_world)

    n_levels = rts.num_levels
    n_groups = ARITY ** (n_levels - 1)
    full = n_groups * LEAF_TRIS
    if cap < full:
        # complete-tree padding beyond the reachable prefix: constants
        pad = [(0, full - cap), (0, 0)]
        v0w = jnp.pad(v0w, pad)
        e1w = jnp.pad(e1w, pad)
        e2w = jnp.pad(e2w, pad)
        payload = jnp.pad(rts.payload, (0, full - cap),
                          constant_values=-1)
    else:
        payload = rts.payload
    return _pack_tree(v0w, e1w, e2w, payload, n_levels,
                      rts.n_real_groups)


def _ray_box(lo, hi, origin, inv_dir, t_max):
    """Slab test, broadcast over trailing box axis.  origin/inv_dir
    (..., 1, 3); lo/hi (..., K, 3).  Returns (..., K) bool."""
    t0 = (lo - origin) * inv_dir
    t1 = (hi - origin) * inv_dir
    tmin = jnp.minimum(t0, t1).max(-1)
    tmax = jnp.maximum(t0, t1).min(-1)
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= t_max)


def _ray_tri(v0, e1, e2, origin, direction, t_max, eps=1e-7):
    """Moller-Trumbore, broadcast over trailing tri axis.
    origin/direction (..., 1, 3); v0/e1/e2 (..., K, 3).
    Returns (hit (..., K) bool, t, u, v)."""
    pvec = jnp.cross(jnp.broadcast_to(direction, e2.shape), e2)
    det = jnp.sum(e1 * pvec, -1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, jnp.inf, det)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    w = jnp.sum(jnp.broadcast_to(direction, qvec.shape) * qvec, -1)
    v = w * inv_det
    t = jnp.sum(e2 * qvec, -1) * inv_det
    hit = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > eps) & (t < t_max))
    return hit, t, u, v


def traverse(bvh: Bvh, origins, directions, t_max, max_steps: int = 128,
             any_hit: bool = False):
    """Lockstep masked DFS for a batch of rays.

    Args:
      origins, directions: (N, 3); t_max: (N,) or scalar
      any_hit: stop a ray at its first confirmed hit (shadow rays)
    Returns dict(hit (N,) bool, t (N,), tri (N,) i32 payload id,
                 u (N,), v (N,), steps (N,)).
    """
    n = origins.shape[0]
    l_max = bvh.num_levels
    inv_dir = 1.0 / jnp.where(jnp.abs(directions) < 1e-12,
                              jnp.full_like(directions, 1e-12), directions)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # single-level trees (tiny scenes) have no parent rows; keep the
    # offsets array non-empty so the (inert) internal branch stays valid
    offsets = jnp.asarray(bvh.level_offset or (0,), jnp.int32)

    state = dict(
        level=jnp.zeros((n,), jnp.int32),            # current stack depth
        path=jnp.zeros((n, l_max), jnp.int32),       # node index per level
        mask=jnp.zeros((n, l_max), jnp.int32),       # children to visit
        done=jnp.zeros((n,), bool),
        best_t=t_max,
        hit=jnp.zeros((n,), bool),
        tri=jnp.full((n,), -1, jnp.int32),
        uu=jnp.zeros((n,), jnp.float32),
        vv=jnp.zeros((n,), jnp.float32),
        steps=jnp.zeros((n,), jnp.int32),
    )
    # seed: test root's children == treat root at level 0 with mask {root}
    state['mask'] = state['mask'].at[:, 0].set(1)

    o1 = origins[:, None, :]
    d1 = directions[:, None, :]
    id1 = inv_dir[:, None, :]

    def cond(s):
        return jnp.any(~s['done']) & (jnp.min(s['steps']) < max_steps)

    def body(s):
        level = s['level']
        cur_mask = jnp.take_along_axis(s['mask'], level[:, None], 1)[:, 0]
        has_work = (cur_mask != 0) & ~s['done']

        # next child at this level = lowest set bit
        low = cur_mask & (-cur_mask)
        child = _ctz8(low)
        new_mask = cur_mask & (cur_mask - 1)
        base_path = jnp.take_along_axis(s['path'], level[:, None], 1)[:, 0]
        node = base_path * ARITY + child            # node index at `level`
        node = jnp.where(level == 0, 0, node)       # level 0: root only

        is_leaf_level = level == (l_max - 1)

        # --- leaf: ONE row gather -> 8 triangles --------------------------
        g = jnp.clip(node, 0, bvh.leaf_rows.shape[0] - 1)
        leaf = bvh.leaf_rows[g].reshape(n, 10, LEAF_TRIS)  # comp-major
        tv0 = leaf[:, 0:3].transpose(0, 2, 1)
        te1 = leaf[:, 3:6].transpose(0, 2, 1)
        te2 = leaf[:, 6:9].transpose(0, 2, 1)
        pay = leaf[:, 9].astype(jnp.int32)
        h, t, u, v = _ray_tri(tv0, te1, te2, o1, d1, s['best_t'][:, None])
        h = h & (pay >= 0) & has_work[:, None] & is_leaf_level[:, None]
        t_m = jnp.where(h, t, jnp.inf)
        k = jnp.argmin(t_m, axis=1)
        leaf_hit = jnp.any(h, axis=1)
        t_best = jnp.take_along_axis(t_m, k[:, None], 1)[:, 0]
        pay_best = jnp.take_along_axis(pay, k[:, None], 1)[:, 0]
        u_best = jnp.take_along_axis(u, k[:, None], 1)[:, 0]
        v_best = jnp.take_along_axis(v, k[:, None], 1)[:, 0]

        upd = leaf_hit & (t_best < s['best_t'])
        best_t = jnp.where(upd, t_best, s['best_t'])
        hit = s['hit'] | upd
        tri = jnp.where(upd, pay_best, s['tri'])
        uu = jnp.where(upd, u_best, s['uu'])
        vva = jnp.where(upd, v_best, s['vv'])

        # --- internal: ONE row gather -> 8 child AABBs --------------------
        parent_row = (offsets[jnp.minimum(level, l_max - 2)] + node)
        parent_row = jnp.clip(parent_row, 0,
                              bvh.child_boxes.shape[0] - 1)
        boxes = bvh.child_boxes[parent_row].reshape(n, 6, ARITY)
        blo = boxes[:, 0:3].transpose(0, 2, 1)
        bhi = boxes[:, 3:6].transpose(0, 2, 1)
        cmask_hit = _ray_box(blo, bhi, o1, id1, best_t[:, None])
        cmask = jnp.where(
            has_work & ~is_leaf_level,
            jnp.sum(jnp.where(cmask_hit,
                              jnp.int32(1) << jnp.arange(ARITY)[None, :],
                              0), axis=1),
            0)

        # --- state update -----------------------------------------------------
        # write back the popped mask at `level`
        mask = _set_at(s['mask'], level, new_mask)
        path = s['path']
        descend = has_work & ~is_leaf_level & (cmask != 0)
        # push: set mask/path at level+1
        next_level = level + 1
        lvl_push = jnp.minimum(next_level, l_max - 1)
        mask = jnp.where(descend[:, None],
                         _set_at(mask, lvl_push, cmask), mask)
        path = jnp.where(descend[:, None],
                         _set_at(path, lvl_push, node), path)
        new_lvl = jnp.where(descend, lvl_push, level)

        # pop: if current level empty (and not descending), go up while empty
        def pop_up(lvl, mask):
            # one pop per iteration is enough — empty levels fall through
            cur = jnp.take_along_axis(mask, lvl[:, None], 1)[:, 0]
            can_pop = (cur == 0) & (lvl > 0)
            return jnp.where(can_pop, lvl - 1, lvl)
        new_lvl = jnp.where(~descend & has_work | ~has_work,
                            pop_up(new_lvl, mask), new_lvl)

        root_mask = mask[:, 0]
        lvl0_empty = (new_lvl == 0) & (root_mask == 0)
        done = s['done'] | lvl0_empty
        if any_hit:
            done = done | hit

        return dict(level=new_lvl, path=path, mask=mask, done=done,
                    best_t=best_t, hit=hit, tri=tri, uu=uu, vv=vva,
                    steps=s['steps'] + 1)

    state = jax.lax.while_loop(cond, body, state)
    return dict(hit=state['hit'], t=state['best_t'], tri=state['tri'],
                u=state['uu'], v=state['vv'], steps=state['steps'])


def _ctz8(x):
    """Count trailing zeros for values with one bit set in [1, 128]."""
    r = jnp.zeros_like(x)
    for k in range(1, ARITY):
        r = jnp.where(x == (1 << k), k, r)
    return r


def _set_at(arr, idx, val):
    """arr (N, L); set arr[i, idx[i]] = val[i]."""
    l = arr.shape[1]
    onehot = (jnp.arange(l)[None, :] == idx[:, None])
    return jnp.where(onehot, val[:, None], arr)


def world_triangles(scene, inst_world, pair_inst, pair_meshlet):
    """Expand (instance, meshlet) pairs to world-space triangles for the
    BVH (the RT scene build; analogous to the reference's TLAS refresh)."""
    tris = scene.meshlet_tris[pair_meshlet]          # (Tp, 96, 3)
    tp, mt, _ = tris.shape
    tri_in = jnp.broadcast_to(jnp.arange(mt, dtype=jnp.int32)[None], (tp, mt))
    valid = tri_in < scene.meshlet_tri_count[pair_meshlet][:, None]
    world = inst_world[pair_inst]                    # (Tp, 4, 4)
    obj = scene.positions[tris]                      # (Tp, 96, 3, 3)
    obj_h = jnp.concatenate([obj, jnp.ones_like(obj[..., :1])], -1)
    w = jnp.einsum('tik,tmvk->tmvi', world, obj_h)[..., :3]
    w = w.reshape(tp * mt, 3, 3)
    return w[:, 0], w[:, 1], w[:, 2], valid.reshape(-1)
