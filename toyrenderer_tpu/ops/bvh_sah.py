"""Adaptive binned-SAH 8-wide BVH with explicit child pointers.

The default RT tree (ops/bvh.py) is a COMPLETE 8-ary tree: pointer-free
storage, trivial refit, jit-friendly in-frame rebuild — but its balanced
shape cannot adapt depth to geometry density, so sibling boxes overlap
and leaves straddle surfaces.  Measured on the courtyard probe-packet
workload, an adaptive SAH tree visits ~0.9x the internal nodes and
~0.5x the LEAVES of the (median-ordered) complete tree — and leaf
visits are the expensive ones (12 Moller-Trumbore lanes each; one HBM
DMA each in big-scene mode).

Reference parity: the driver-side BLAS build of Visual.cpp:509-542 —
built ONCE at scene load (native C++ builder, native/sah.cpp), refit
per frame from instance transforms (Scene.cpp:411-466 TLAS-update
analogue).  The Pallas packet kernels (bvh_pallas.py) traverse it via
explicit child refs read from the node rows (explicit_refs mode).

Storage: node rows are (PR, 64) f32 — 48 child-box floats in the same
component-major layout as Bvh.child_boxes, then 8 float-encoded child
refs (>= 0 internal node row, < -0.5 leaf row -(l+1), <= ABSENT_REF
empty slot), the split axis, and padding.  Rows <= 128 lanes cost the
same padded VMEM bytes as 48-wide rows, so the pointers are free.
Leaf rows are bit-identical in layout to Bvh.leaf_rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from toyrenderer_tpu.ops.bvh import (
    ARITY, LEAF_TRIS, _pair_world_tris, transform_leaf_tris)

ABSENT_REF = -3.0e8     # float child-ref sentinel for empty slots
_ABSENT_I = np.int32(-2147483648)
BIG = 3.0e37


@dataclass(frozen=True)
class BvhSah:
    """Refit SAH tree, ready for the Pallas explicit-refs traversal."""
    node_rows: jnp.ndarray       # (PR, 64) f32: boxes+refs+axis (above)
    leaf_rows: jnp.ndarray       # (NG, 120) f32: Bvh.leaf_rows layout


def _register_bvh_sah():
    jax.tree_util.register_pytree_node(
        BvhSah,
        lambda b: ((b.node_rows, b.leaf_rows), ()),
        lambda aux, ch: BvhSah(*ch))


_register_bvh_sah()


@dataclass(frozen=True)
class RtStaticSah:
    """Frozen SAH topology (scene load) for the per-frame refit."""
    obj_v0: jnp.ndarray          # (NG*12, 3) object-space, leaf order
    obj_e1: jnp.ndarray
    obj_e2: jnp.ndarray
    tri_inst: jnp.ndarray        # (NG*12,) i32 instance id (0 pad)
    payload: jnp.ndarray         # (NG*12,) i32 pair-order tri id; -1 pad
    child_ref: jnp.ndarray       # (PR, 8) i32 (INT32_MIN absent)
    node_axis: jnp.ndarray       # (PR,) i32 split axis
    pair_keep: jnp.ndarray = None  # (Tcat,) bool: see RtStatic.pair_keep
    seg_inst: jnp.ndarray = None  # (S,) i32: instance of each contiguous
    #                               leaf-triangle segment (instance-major
    #                               builds; see refit_sah)
    depth_ranges: tuple = ()     # static ((start, count), ...) by depth
    n_mask_pairs: int = 0        # static: see RtStatic.n_mask_pairs
    seg_lens: tuple = ()         # static: triangle count per segment


def _register_rt_static_sah():
    arr = ('obj_v0', 'obj_e1', 'obj_e2', 'tri_inst', 'payload',
           'child_ref', 'node_axis', 'pair_keep', 'seg_inst')
    jax.tree_util.register_pytree_node(
        RtStaticSah,
        lambda b: (tuple(getattr(b, f) for f in arr),
                   (b.depth_ranges, b.n_mask_pairs, b.seg_lens)),
        lambda aux, ch: RtStaticSah(**dict(zip(arr, ch)),
                                    depth_ranges=aux[0],
                                    n_mask_pairs=aux[1],
                                    seg_lens=aux[2]))


_register_rt_static_sah()


def _build_sah8_native(tlo, thi, leaf_tris: int, nbins: int):
    """Native builder; returns (child (PR,8) i32, axis (PR,), leaf
    (NL, leaf_tris) i32, max_depth) or None if the toolchain is absent."""
    from toyrenderer_tpu.native import sah_lib
    lib = sah_lib()
    if lib is None:
        return None
    import ctypes
    n = tlo.shape[0]
    max_nodes = max(n, 8)
    max_leaves = max(n, 8)
    tlo = np.ascontiguousarray(tlo, np.float32)
    thi = np.ascontiguousarray(thi, np.float32)
    child = np.empty((max_nodes, 8), np.int32)
    axis = np.empty((max_nodes,), np.int32)
    leaf = np.empty((max_leaves, leaf_tris), np.int32)
    counts = np.zeros((3,), np.int32)
    rc = lib.build_sah8(
        tlo.ctypes.data_as(ctypes.c_void_p),
        thi.ctypes.data_as(ctypes.c_void_p),
        n, leaf_tris, nbins, max_nodes, max_leaves,
        child.ctypes.data_as(ctypes.c_void_p),
        axis.ctypes.data_as(ctypes.c_void_p),
        leaf.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    pr, nl, md = int(counts[0]), int(counts[1]), int(counts[2])
    return child[:pr], axis[:pr], leaf[:nl], md


def _build_sah8_np(tlo, thi, leaf_tris: int, nbins: int):
    """Pure-numpy fallback builder, same contract as the native one.
    Binary binned SAH collapsed 3 levels to 8 wide; children sorted by
    centroid along the node axis; nodes emitted grouped by depth."""
    n = tlo.shape[0]
    cent = (tlo + thi) * 0.5

    def split(idxs):
        if len(idxs) <= leaf_tris:
            return None
        c = cent[idxs]
        clo = c.min(0)
        ext = c.max(0) - clo
        best = None
        for ax in range(3):
            if ext[ax] <= 1e-9:
                continue
            b = np.minimum(((c[:, ax] - clo[ax]) / ext[ax]
                            * nbins).astype(int), nbins - 1)
            cnt = np.bincount(b, minlength=nbins)
            blo = np.full((nbins, 3), BIG)
            bhi = np.full((nbins, 3), -BIG)
            for k in np.unique(b):
                m = b == k
                blo[k] = tlo[idxs[m]].min(0)
                bhi[k] = thi[idxs[m]].max(0)

            def area(lo_, hi_):
                d = np.maximum(hi_ - lo_, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] \
                    + d[:, 2] * d[:, 0]
            plo = np.minimum.accumulate(blo, 0)
            phi = np.maximum.accumulate(bhi, 0)
            slo = np.minimum.accumulate(blo[::-1], 0)[::-1]
            shi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
            pc = np.cumsum(cnt)
            sc = np.cumsum(cnt[::-1])[::-1]
            cost = (area(plo, phi)[:-1] * pc[:-1]
                    + area(slo[1:], shi[1:]) * sc[1:])
            cost = np.where((pc[:-1] == 0) | (sc[1:] == 0), np.inf, cost)
            k = int(np.argmin(cost))
            if np.isfinite(cost[k]) and (best is None
                                         or cost[k] < best[0]):
                best = (cost[k], ax, k, b)
        if best is None:
            ax = int(np.argmax(ext))
            order = np.argsort(c[:, ax], kind='stable')
            h = len(idxs) // 2
            return ax, idxs[order[:h]], idxs[order[h:]]
        _, ax, k, b = best
        return ax, idxs[b <= k], idxs[b > k]

    nodes = []       # (axis, depth, [child descriptors])
    leaves = []

    def mk_leaf(p):
        lid = len(leaves)
        leaves.append(np.pad(p, (0, leaf_tris - len(p)),
                             constant_values=-1))
        return -(lid + 1)

    def chop(idxs, depth):
        # terminal for small subtrees (n <= 8*leaf_tris): ONE node of
        # consecutive FULL leaves sliced along the widest centroid axis
        # (row-optimal; see native/sah.cpp chop)
        c = cent[idxs]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        order = idxs[np.argsort(c[:, ax], kind='stable')]
        me = len(nodes)
        nodes.append([ax, depth, []])
        for off in range(0, len(order), leaf_tris):
            nodes[me][2].append(mk_leaf(order[off:off + leaf_tris]))
        return me

    def build(idxs, depth):
        if len(idxs) <= leaf_tris and depth > 0:
            return mk_leaf(idxs)
        if len(idxs) <= leaf_tris * 8:
            return chop(idxs, depth)
        me = len(nodes)
        nodes.append([0, depth, []])
        # split the largest splittable part until 8 wide (node rows
        # cost the same padded VMEM bytes at any width)
        parts = [idxs]
        first_axis = None
        while len(parts) < 8:
            bi = max((i for i in range(len(parts))
                      if len(parts[i]) > leaf_tris),
                     key=lambda i: len(parts[i]), default=None)
            if bi is None:
                break
            s = split(parts[bi])
            if s is None:
                break
            ax, a, b = s
            if first_axis is None:
                first_axis = ax
            parts[bi:bi + 1] = [a, b]
        ax = 0 if first_axis is None else first_axis
        nodes[me][0] = ax
        parts.sort(key=lambda p: float(cent[p][:, ax].mean()))
        # merge consecutive small parts into FULL leaves (a leaf visit
        # costs 12 Moller-Trumbore lanes at any fill)
        groups = []
        for p in parts:
            if groups and len(groups[-1]) + len(p) <= leaf_tris:
                groups[-1] = np.concatenate([groups[-1], p])
            else:
                groups.append(p)
        for p in groups:
            nodes[me][2].append(mk_leaf(p) if len(p) <= leaf_tris
                                else build(p, depth + 1))
        return me

    build(np.arange(n), 0)
    pr = len(nodes)
    max_d = max(nd[1] for nd in nodes)
    remap = np.empty(pr, np.int32)
    nxt = 0
    for d in range(max_d + 1):
        for i in range(pr):
            if nodes[i][1] == d:
                remap[i] = nxt
                nxt += 1
    child = np.full((pr, 8), _ABSENT_I, np.int32)
    axis = np.zeros((pr,), np.int32)
    for i, (ax, _d, kids) in enumerate(nodes):
        o = remap[i]
        axis[o] = ax
        for k, kid in enumerate(kids):
            child[o, k] = kid if kid < 0 else remap[kid]
    leaf = np.asarray(leaves, np.int32).reshape(-1, leaf_tris)
    return child, axis, leaf, max_d


def _build_one(tlo, thi, nbins):
    built = _build_sah8_native(tlo, thi, LEAF_TRIS, nbins)
    if built is None:
        built = _build_sah8_np(tlo, thi, LEAF_TRIS, nbins)
    return built


def _build_instance_major(tlo, thi, inst_v, nbins):
    """BLAS/TLAS-structured topology (Visual.cpp BLAS-per-mesh +
    Scene.cpp TLAS parity, flattened into one node array): one SAH
    subtree per INSTANCE over its own triangles, plus a median-split
    top tree whose children are the instance roots.  Instance-major
    leaf order makes each instance's triangles one CONTIGUOUS segment,
    so the per-frame refit broadcasts ONE matrix per segment instead of
    a (tris x instances) one-hot matmul — O(T) at any instance count
    (the plaza/Bistro-scale enabler).

    Returns (child (PR,8), axis (PR,), leaf (NL,12) LOCAL-valid tri
    ids, seg_inst list, seg_tris list)."""
    uinst = np.unique(inst_v)
    childs, axes, leaves = [], [], []
    roots, seg_inst, seg_tris = [], [], []
    n_off = 0
    l_off = 0
    ilo = np.empty((len(uinst), 3), np.float32)
    ihi = np.empty((len(uinst), 3), np.float32)
    for j, iid in enumerate(uinst):
        sel = np.nonzero(inst_v == iid)[0]
        c, a, lf, _md = _build_one(tlo[sel], thi[sel], nbins)
        # globalize: internal refs shift by n_off, leaf refs by l_off,
        # local tri ids -> this call's selection
        gi = np.where(c >= 0, c + n_off,
                      np.where(c == _ABSENT_I, c, c - l_off))
        childs.append(gi)
        axes.append(a)
        lg = np.where(lf >= 0, sel[np.maximum(lf, 0)], -1)
        leaves.append(lg)
        roots.append(n_off)
        seg_inst.append(int(iid))
        seg_tris.append(int(lf.shape[0]) * LEAF_TRIS)
        ilo[j] = tlo[sel].min(0)
        ihi[j] = thi[sel].max(0)
        n_off += c.shape[0]
        l_off += lf.shape[0]

    child = np.concatenate(childs, axis=0)
    axis = np.concatenate(axes, axis=0)
    leaf = np.concatenate(leaves, axis=0)
    if len(uinst) == 1:
        return child, axis, leaf, seg_inst, seg_tris

    # top tree (TLAS): median-split over instance AABB centers; children
    # are instance roots (global node ids) or deeper top nodes.  Top
    # node t's FINAL id is n_off + t, assigned at creation, so refs are
    # final immediately.
    cent = (ilo + ihi) * 0.5
    n_inst_nodes = n_off
    top_child, top_axis = [], []

    def build_top(items):
        me = len(top_child)
        top_child.append(np.full(8, _ABSENT_I, np.int64))
        top_axis.append(0)
        c = cent[items]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        top_axis[me] = ax
        order = items[np.argsort(c[:, ax], kind='stable')]
        if len(order) <= 8:
            groups = [order[i:i + 1] for i in range(len(order))]
        else:
            bounds = np.linspace(0, len(order), 9).astype(int)
            groups = [order[bounds[i]:bounds[i + 1]] for i in range(8)
                      if bounds[i] < bounds[i + 1]]
        for k, g in enumerate(groups):
            top_child[me][k] = (roots[g[0]] if len(g) == 1
                                else build_top(g))
        return n_inst_nodes + me

    root_final = build_top(np.arange(len(uinst)))
    child = np.concatenate(
        [child, np.stack(top_child).astype(child.dtype)], axis=0)
    axis = np.concatenate(
        [axis, np.asarray(top_axis, axis.dtype)], axis=0)
    # the depth relabel in build_rt_static_sah moves the (single
    # unreferenced) root — wherever it sits — to node 0
    assert root_final == n_inst_nodes
    return child, axis, leaf, seg_inst, seg_tris


def build_rt_static_sah(scene_host, pair_inst, pair_meshlet,
                        rest_inst_world=None, mask_pair_inst=None,
                        mask_pair_meshlet=None,
                        nbins: int = 16) -> RtStaticSah:
    """One-time (scene load) SAH topology over the full RT pair list —
    rest-pose world AABBs drive the build; triangles are stored in
    OBJECT space in leaf order so refit_sah re-transforms them per
    frame.  Uses the native builder (native/sah.cpp) with a numpy
    fallback.  Optional alpha-masked pairs join coverage-classified
    (see bvh.rt_pairs_with_mask).  Topology is instance-major
    (BLAS/TLAS-structured, see _build_instance_major)."""
    from toyrenderer_tpu.ops.bvh import rt_pairs_with_mask
    pair_inst, pair_meshlet, keep, n_mask = rt_pairs_with_mask(
        scene_host, pair_inst, pair_meshlet, mask_pair_inst,
        mask_pair_meshlet)
    obj, inst, w, valid = _pair_world_tris(
        scene_host, pair_inst, pair_meshlet, rest_inst_world)
    if keep is not None:
        valid = valid & keep
    ids = np.nonzero(valid)[0]
    wv = w[ids]
    tlo = wv.min(axis=1)
    thi = wv.max(axis=1)
    child, axis, leaf, seg_inst, seg_tris = _build_instance_major(
        tlo, thi, inst[ids], nbins)
    pr = child.shape[0]

    # depth relabel: instance-major concatenation interleaves depths, so
    # permute nodes into depth-grouped order (refit walks contiguous
    # depth ranges bottom-up)
    depth = np.full((pr,), -1, np.int32)
    # roots: nodes never referenced as children
    referenced = np.zeros(pr, bool)
    refs = child[(child >= 0) & (child != _ABSENT_I)]
    referenced[refs] = True
    depth[~referenced] = 0
    frontier = np.nonzero(~referenced)[0]
    while len(frontier):
        nxt = []
        for i in frontier:
            for k in range(8):
                c = child[i, k]
                if c >= 0:
                    depth[c] = depth[i] + 1
                    nxt.append(c)
        frontier = np.asarray(nxt, np.int64)
    max_d = int(depth.max())
    assert (depth >= 0).all()
    # kernel DFS stack bound (bvh_pallas.STACK_CAP)
    assert (max_d + 1) * (ARITY - 1) + 1 <= 160, \
        f"SAH tree too deep for the traversal stack (depth {max_d})"
    perm = np.argsort(depth, kind='stable')      # new order -> old id
    remap = np.empty(pr, np.int64)               # old id -> new id
    remap[perm] = np.arange(pr)
    child = np.where(child >= 0, remap[np.maximum(child, 0)],
                     child)[perm]
    axis = axis[perm]
    depth = depth[perm]
    assert depth[0] == 0
    ranges = []
    for d in range(max_d + 1):
        idx = np.nonzero(depth == d)[0]
        assert idx[-1] - idx[0] + 1 == len(idx)
        ranges.append((int(idx[0]), int(len(idx))))

    # leaf-order triangle arrays (absent slots: payload -1, degenerate
    # zero triangles, instance 0)
    flat = leaf.reshape(-1)
    ok = flat >= 0
    src = ids[np.where(ok, flat, 0)]
    obj_s = np.where(ok[:, None, None], obj[src], 0.0)
    pay = np.where(ok, src, -1).astype(np.int32)
    inst_s = np.where(ok, inst[src], 0).astype(np.int32)

    return RtStaticSah(
        obj_v0=jnp.asarray(obj_s[:, 0].astype(np.float32)),
        obj_e1=jnp.asarray((obj_s[:, 1] - obj_s[:, 0]).astype(np.float32)),
        obj_e2=jnp.asarray((obj_s[:, 2] - obj_s[:, 0]).astype(np.float32)),
        tri_inst=jnp.asarray(inst_s),
        payload=jnp.asarray(pay),
        child_ref=jnp.asarray(child.astype(np.int32)),
        node_axis=jnp.asarray(axis),
        pair_keep=jnp.asarray(keep if keep is not None
                              else np.ones(w.shape[0], bool)),
        seg_inst=jnp.asarray(np.asarray(seg_inst, np.int32)),
        depth_ranges=tuple(ranges), n_mask_pairs=n_mask,
        seg_lens=tuple(seg_tris))


def build_rt_static_auto(scene_host, pair_inst, pair_meshlet,
                         rest_inst_world=None, mask_pair_inst=None,
                         mask_pair_meshlet=None):
    """Frozen-topology selector for the frame tools: the adaptive SAH
    tree on TPU backends (its traversal is Pallas-only), the complete
    morton/median tree otherwise (CPU tests, XLA fallback).  Env knob
    TR_RT_SAH overrides ('1' force SAH, '0' force complete; default is
    '0' until the explicit-refs kernel is measured on hardware)."""
    import os

    import jax
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    want = os.environ.get('TR_RT_SAH', '0') == '1'
    if on_tpu and want:
        return build_rt_static_sah(scene_host, pair_inst, pair_meshlet,
                                   rest_inst_world,
                                   mask_pair_inst=mask_pair_inst,
                                   mask_pair_meshlet=mask_pair_meshlet)
    from toyrenderer_tpu.ops.bvh import build_rt_static
    return build_rt_static(scene_host, pair_inst, pair_meshlet,
                           rest_inst_world,
                           mask_pair_inst=mask_pair_inst,
                           mask_pair_meshlet=mask_pair_meshlet)


def build_rt_static_gi(scene_host, alpha_filter: str = 'all',
                       mask_pair_inst=None, mask_pair_meshlet=None,
                       rest_inst_world=None):
    """GI-dedicated frozen topology: DDGI probe rays are
    diffuse-frequency, so they trace LOD-REDUCED geometry (budget
    TR_GI_TRIS, default 100k triangles) on the SAH tree — the measured
    probe-ray winner (courtyard rtbench: 1.80 vs 1.33 Mrays/s closest-
    hit) — while camera-frequency shadow rays keep the full-detail main
    tree.  The reference shares one TLAS for both ray kinds
    (giprobetrace.hlsl + shadowmask.hlsl trace the same AS); splitting
    them is the TPU-first trade: probe packets visit ~proportionally
    fewer nodes on the smaller tree, and GI quality is bounded by the
    half-res/golden CI tests, not by LOD0 detail.

    TR_GI_SAH=0 forces the complete morton/median flavor (the SAH
    traversal is Pallas-only, so non-TPU backends always get it).
    Returns (rt_static_gi, gi_pair_inst, gi_pair_meshlet, lod)."""
    import os

    import jax

    from toyrenderer_tpu.ops.geometry import rt_lod_pairs
    budget = int(os.environ.get('TR_GI_TRIS', '100000'))
    g_pi, g_pm, lod = rt_lod_pairs(scene_host, alpha_filter,
                                   budget_tris=budget)
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    want_sah = os.environ.get('TR_GI_SAH', '1') == '1'
    build = (build_rt_static_sah if (on_tpu and want_sah) else None)
    if build is None:
        from toyrenderer_tpu.ops.bvh import build_rt_static
        build = build_rt_static
    rts = build(scene_host, g_pi, g_pm, rest_inst_world,
                mask_pair_inst=mask_pair_inst,
                mask_pair_meshlet=mask_pair_meshlet)
    import jax.numpy as jnp
    return rts, jnp.asarray(g_pi), jnp.asarray(g_pm), lod


def refit_sah(rts: RtStaticSah, inst_world) -> BvhSah:
    """Per-frame refit: transform the static object-space leaves by the
    current instance matrices, rebuild leaf AABBs, then reduce node
    boxes bottom-up over the static depth ranges (children of a node
    are strictly deeper, so each range only reads ranges already
    written).  Runs inside the frame jit; no sort, no topology work."""
    cap = rts.tri_inst.shape[0]
    ng = cap // LEAF_TRIS
    if rts.seg_lens:
        # instance-major leaf order: each instance's triangles are one
        # contiguous segment — broadcast ONE matrix per segment (static
        # repeat pattern) instead of the (tris x instances) one-hot
        # matmul; O(T) at any instance count
        w_seg = inst_world[rts.seg_inst]                 # (S, 4, 4)
        w_tri = jnp.repeat(w_seg, jnp.asarray(rts.seg_lens), axis=0,
                           total_repeat_length=cap)
        r = w_tri[:, :3, :3]
        t = w_tri[:, :3, 3]
        tf = lambda v: jnp.einsum('tij,tj->ti', r, v)    # noqa: E731
        v0w = tf(rts.obj_v0) + t
        e1w = tf(rts.obj_e1)
        e2w = tf(rts.obj_e2)
    else:
        v0w, e1w, e2w = transform_leaf_tris(
            rts.tri_inst, rts.obj_v0, rts.obj_e1, rts.obj_e2,
            inst_world)

    # leaf rows: component-major [v0x*12 | v0y | v0z | e1xyz | e2xyz |
    # pay*12] — identical layout to Bvh.leaf_rows
    payf = rts.payload.astype(jnp.float32)
    leaf = jnp.concatenate([v0w, e1w, e2w, payf[:, None]], axis=1)
    leaf_rows = leaf.reshape(ng, LEAF_TRIS, 10).transpose(
        0, 2, 1).reshape(ng, 10 * LEAF_TRIS)

    # leaf AABBs (invalid slots excluded)
    v1w = v0w + e1w
    v2w = v0w + e2w
    okm = (rts.payload >= 0)[:, None]
    tl = jnp.where(okm, jnp.minimum(jnp.minimum(v0w, v1w), v2w), BIG)
    th = jnp.where(okm, jnp.maximum(jnp.maximum(v0w, v1w), v2w), -BIG)
    leaf_lo = tl.reshape(ng, LEAF_TRIS, 3).min(axis=1)   # (NG, 3)
    leaf_hi = th.reshape(ng, LEAF_TRIS, 3).max(axis=1)

    pr = rts.child_ref.shape[0]
    own_lo = jnp.zeros((pr, 3), jnp.float32)
    own_hi = jnp.zeros((pr, 3), jnp.float32)
    rows48 = jnp.zeros((pr, 48), jnp.float32)
    for start, count in reversed(rts.depth_ranges):
        refs = jax.lax.dynamic_slice(rts.child_ref, (start, 0),
                                     (count, 8))
        absent = refs == int(_ABSENT_I)
        is_leaf = (refs < 0) & ~absent
        lid = jnp.clip(-(refs + 1), 0, ng - 1)
        nid = jnp.clip(refs, 0, pr - 1)
        cl = jnp.where(is_leaf[..., None], leaf_lo[lid], own_lo[nid])
        ch = jnp.where(is_leaf[..., None], leaf_hi[lid], own_hi[nid])
        cl = jnp.where(absent[..., None], BIG, cl)       # (c, 8, 3)
        ch = jnp.where(absent[..., None], -BIG, ch)
        own_lo = jax.lax.dynamic_update_slice(
            own_lo, cl.min(axis=1), (start, 0))
        own_hi = jax.lax.dynamic_update_slice(
            own_hi, ch.max(axis=1), (start, 0))
        # component-major child boxes: lo x8 y8 z8 | hi x8 y8 z8.
        # Absent slots carry an inverted box but pushes are masked by
        # the ref sentinel in the kernel, so values are inert.
        box = jnp.concatenate([cl.transpose(0, 2, 1).reshape(count, 24),
                               ch.transpose(0, 2, 1).reshape(count, 24)],
                              axis=1)
        rows48 = jax.lax.dynamic_update_slice(rows48, box, (start, 0))

    ref_f = jnp.where(rts.child_ref == int(_ABSENT_I),
                      jnp.float32(ABSENT_REF),
                      rts.child_ref.astype(jnp.float32))
    node_rows = jnp.concatenate(
        [rows48, ref_f, rts.node_axis.astype(jnp.float32)[:, None],
         jnp.zeros((pr, 7), jnp.float32)], axis=1)       # (PR, 64)
    return BvhSah(node_rows=node_rows, leaf_rows=leaf_rows)
