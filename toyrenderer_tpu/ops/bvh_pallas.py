"""Pallas TPU packet traversal for the 8-ary BVH (ops/bvh.py).

The XLA lockstep traversal (bvh.traverse) pays two row gathers per ray per
step — every ray fetches a leaf row AND a child-box row each iteration
whether it needs them or not, and the while-loop runs until the SLOWEST
ray finishes (measured 0.17 Mrays/s at round 1).  This kernel reshapes the
problem for the TPU the classic way: RAY PACKETS.

* A packet is `packet` rays laid out as (sub, 128) vregs — full VPU tiles
  per vector op.  The whole packet walks the tree together with ONE shared
  scalar DFS stack (SMEM), so there are NO per-ray gathers at all.
* Node data is consumed VECTORIZED: a visited node's row is transposed to
  a column ((W, 1) — Mosaic supports 2D transposes), component columns
  are contiguous (K, 1) sublane slices of it (rows are stored
  COMPONENT-major for exactly this reason), and a (K, 1, 1) x
  (1, sub, 128) broadcast evaluates all K children/triangles against the
  whole packet in one batched 3D op chain.  An earlier variant extracted
  every node scalar with a (1, 1) vector read (~120 extracts per leaf
  visit) and was measured ~10x slower per visit — scalar extracts and
  per-child `lax.cond`s are the dominant per-visit cost, not VPU flops.
* Internal nodes: slab-test all 8 children batched; children any ray
  intersects are pushed near-to-far by the packet's dominant direction
  octant (morton child order makes k XOR flipmask a front-to-back order).
* Leaves: LEAF_TRIS Moller-Trumbore tests batched over the packet,
  closest-hit folded with a static-index where-chain.
* `any_hit` packets terminate once every live ray has a hit.

Packets win when rays are coherent: shadow rays (shared sun direction,
tile-local origins — shadowmask.hlsl parity) and DDGI probe rays grouped
into cones (ddgi.trace_probe_block) both are.  Incoherent sets degrade
toward the union of per-ray traversals, never worse than visiting every
node once.

Capacity contract: child boxes and leaf rows are staged whole in VMEM.
With prefix-truncated box levels + 12-tri/120-lane leaf rows, a
Sponza-class 260k-tri scene is ~13 MB real (lane-padded) and fits the
~16 MB/core VMEM; `fits_vmem(bvh)` checks the REAL padded bytes.
Larger scenes keep boxes in VMEM and stream leaf rows from HBM per
visit (`boxes_fit_vmem`); the XLA lockstep traversal remains the final
fallback.

Reference parity: DXR RayQuery consumers source/shaders/shadowmask.hlsl:
65-145 and giprobetrace.hlsl:23-148.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toyrenderer_tpu.ops.bvh import ARITY, LEAF_TRIS, Bvh

PACKET = 4096                 # default rays per packet: (SUB, 128) vregs
_LANE = 128
STACK_CAP = 160               # DFS stack bound: (levels-1)*7+1, levels<=12
_ENC_LEVEL_BITS = 4           # stack entry = (index << 4) | level
ABSENT_CUT = -1.0e8           # SAH child refs are valid iff > this
#                               (leaf refs are -(leaf+1) >= -NG >> cut;
#                               absent slots carry bvh_sah.ABSENT_REF)


def _row_bytes(n_rows: int) -> int:
    # Mosaic pads VMEM arrays to (8, 128) f32 tiles: any row narrower
    # than 128 lanes still occupies 128 lanes physically
    return -(-n_rows // 8) * 8 * 128 * 4


def _node_array(bvh):
    """(rows, W) node array of either tree flavor: Bvh.child_boxes
    (complete tree) or BvhSah.node_rows (explicit SAH refs)."""
    return (bvh.node_rows if hasattr(bvh, 'node_rows')
            else bvh.child_boxes)


def fits_vmem(bvh, budget_bytes: int = 13 * 2**20) -> bool:
    """True if this BVH's node data fits the kernel's VMEM staging budget
    (REAL lane-padded bytes, ~16 MB/core minus packet/scratch room)."""
    return (_row_bytes(_node_array(bvh).shape[0])
            + _row_bytes(bvh.leaf_rows.shape[0])) <= budget_bytes


def boxes_fit_vmem(bvh, budget_bytes: int = 12 * 2**20) -> bool:
    """True if at least the internal child boxes fit VMEM — the big-scene
    mode: boxes staged in VMEM, leaf rows stay HBM-resident and stream in
    per leaf visit with an async DMA (one 512B padded row per visit).
    Internal boxes are a small fraction of the tree bytes (prefix-
    truncated levels), so this covers Bistro-scale scenes the all-VMEM
    kernel cannot stage."""
    return _row_bytes(_node_array(bvh).shape[0]) <= budget_bytes


def traverse_auto(bvh: Bvh, origins, directions, t_max,
                  any_hit: bool = False, max_steps: int = 128,
                  live=None, interpret: bool = False, sp_mesh=None,
                  group_dirs=None, chunked: bool = False,
                  pairs: bool = False, pair_tables=None):
    """Dispatch: packet kernel on TPU when the tree fits VMEM, else the
    XLA lockstep traversal (also the CPU/test path).  Same contract as
    bvh.traverse; `live` optionally masks rays off (they report miss).

    sp_mesh=(Mesh, axis): rays are embarrassingly parallel — shard the
    packet stream over the mesh axis with a REPLICATED tree (the
    multi-chip RT path; the reference is single-GPU so this is new
    TPU-native capability).

    group_dirs (N//128, 3): when the caller's ray stream gives every
    128 consecutive rays ONE shared direction (DDGI gdir bricking;
    uniform sun rays), the grouped-direction kernel variant runs
    instead — directions live in a tiny side table rather than six
    full-packet vector arrays (see _traverse_kernel_gdir).  Fallback
    paths still use the per-ray `directions`.

    chunked=True routes to the block-pair dense traversal
    (ops/rt_chunks.py) — the divergent-ray path (DDGI probes, ReSTIR):
    pure XLA, cost scales with real block-chunk overlaps instead of
    packet path unions.

    pairs=True routes to the pair-MXU traversal (ops/rt_pairs.py) —
    the MEASURED probe-ray winner (1.42x over the packet-cone kernel
    on the courtyard): dense Moller-Trumbore as one MXU matmul per
    (ray block, tri chunk) pair inside a Pallas kernel.  TPU (or
    interpret) only; other backends fall through to the paths below.
    pair_tables caches mt_tables(bvh) alongside the moved-gated refit.
    """
    import os

    import jax
    # TR_INTERPRET=1: run the Pallas kernels in interpret mode on any
    # backend — lets CPU tests drive the FULL frame through the packet
    # traversal (SAH/gdir integration) without TPU hardware
    interpret = interpret or os.environ.get('TR_INTERPRET', '0') == '1'
    if sp_mesh is not None and sp_mesh[0].shape[sp_mesh[1]] > 1:
        return _traverse_sharded(bvh, origins, directions, t_max,
                                 any_hit=any_hit, max_steps=max_steps,
                                 live=live, interpret=interpret,
                                 sp_mesh=sp_mesh, group_dirs=group_dirs,
                                 chunked=chunked, pairs=pairs,
                                 pair_tables=pair_tables)
    on_tpu_now = jax.default_backend() in ('tpu', 'axon')
    if pairs and (on_tpu_now or interpret):
        from toyrenderer_tpu.ops.rt_pairs import traverse_pairs
        return traverse_pairs(bvh, origins, directions, t_max,
                              any_hit=any_hit, live=live,
                              tables=pair_tables, interpret=interpret)
    if chunked:
        from toyrenderer_tpu.ops.rt_chunks import traverse_chunks
        return traverse_chunks(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               interpret=interpret)
    from toyrenderer_tpu.ops.bvh import traverse as traverse_xla
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    use_gdir = group_dirs is not None and origins.shape[0] % GDIR_GROUP == 0
    if fits_vmem(bvh) and (on_tpu or interpret):
        if use_gdir:
            return traverse_pallas_gdir(bvh, origins, group_dirs, t_max,
                                        any_hit=any_hit, live=live,
                                        interpret=interpret)
        return traverse_pallas(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               interpret=interpret)
    if boxes_fit_vmem(bvh) and on_tpu:
        # Sponza-scale: leaf rows stream from HBM per visit
        if use_gdir:
            return traverse_pallas_gdir(bvh, origins, group_dirs, t_max,
                                        any_hit=any_hit, live=live,
                                        leaf_hbm=True)
        return traverse_pallas(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               leaf_hbm=True)
    if hasattr(bvh, 'node_rows'):
        raise RuntimeError(
            "BvhSah traversal needs the Pallas kernel (TPU backend or "
            "interpret=True); use the complete tree (ops/bvh.py) on "
            "this backend")
    if live is not None:
        t_max = jnp.where(jnp.asarray(live, bool),
                          jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                           (origins.shape[0],)), 0.0)
    return traverse_xla(bvh, origins, directions, t_max,
                        max_steps=max_steps, any_hit=any_hit)


def _traverse_sharded(bvh: Bvh, origins, directions, t_max,
                      any_hit: bool, max_steps: int, live, interpret,
                      sp_mesh, group_dirs=None, chunked: bool = False,
                      pairs: bool = False, pair_tables=None):
    """shard_map over ray blocks: each device traverses its slice of the
    ray stream against the replicated BVH; results concatenate back.
    Bitwise-identical to the single-device path (no cross-ray math)."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, axis = sp_mesh
    nsp = mesh.shape[axis]
    n = origins.shape[0]
    # group_dirs: shard boundaries must not straddle a 128-ray group
    quant = nsp * GDIR_GROUP if group_dirs is not None else nsp
    n_pad = -(-n // quant) * quant

    def pad(x):
        return jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1))

    origins_p = pad(origins)
    dirs_p = pad(directions)
    t_max_p = pad(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    live_p = pad(jnp.ones((n,), jnp.float32) if live is None
                 else jnp.asarray(live, jnp.float32))

    if group_dirs is not None:
        gd = jnp.asarray(group_dirs, jnp.float32)
        gd_p = jnp.pad(gd, ((0, n_pad // GDIR_GROUP - gd.shape[0]),
                            (0, 0)))

        def local(bvh, o, d, tm, lv, g):
            return traverse_auto(bvh, o, d, tm, any_hit=any_hit,
                                 max_steps=max_steps, live=lv,
                                 interpret=interpret, group_dirs=g,
                                 chunked=chunked)

        res = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_rep=False)(
            bvh, origins_p, dirs_p, t_max_p, live_p, gd_p)
        return {k: v[:n] for k, v in res.items()}

    # pair_tables (optional) replicates like the tree; a dict wrapper
    # keeps the shard_map arity fixed whether or not tables were passed
    pt_wrap = {} if pair_tables is None else {'t': pair_tables}

    def local(bvh, pt, o, d, tm, lv):
        return traverse_auto(bvh, o, d, tm, any_hit=any_hit,
                             max_steps=max_steps, live=lv,
                             interpret=interpret, chunked=chunked,
                             pairs=pairs, pair_tables=pt.get('t'))

    res = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_rep=False)(
        bvh, pt_wrap, origins_p, dirs_p, t_max_p, live_p)
    return {k: v[:n] for k, v in res.items()}


def _traverse_kernel(*refs,
                     n_levels: int, level_offsets: tuple,
                     any_hit: bool, max_visits: int, sub: int,
                     want_uv: bool, leaf_hbm: bool,
                     explicit_refs: bool = False, seeded: bool = False):
    """refs = [seed_ref?, ray_ref, cb_ref, leaf_ref, out_ref,
               stack_scr, leaf_scr, leaf_sem]

    ray_ref (1, 8*SUB, 128) packet components; cb_ref (PR, 48|64) node
    rows (VMEM); leaf_ref (NG, 120) leaf rows (VMEM/HBM); out_ref
    (1, C*SUB, 128); stack_scr SMEM (STACK_CAP,) i32.

    seeded: scalar-prefetched per-packet stack seed (binned traversal —
    the packet starts at its bin's SUBTREE root instead of the tree
    root; a negative seed marks an all-padding packet, which exits
    immediately).
    """
    if seeded:
        (seed_ref, ray_ref, cb_ref, leaf_ref, out_ref,
         stack_scr, leaf_scr, leaf_sem) = refs
    else:
        (ray_ref, cb_ref, leaf_ref, out_ref,
         stack_scr, leaf_scr, leaf_sem) = refs
    ray = ray_ref[0]
    ox, oy, oz = ray[0:sub], ray[sub:2 * sub], ray[2 * sub:3 * sub]
    dx, dy, dz = (ray[3 * sub:4 * sub], ray[4 * sub:5 * sub],
                  ray[5 * sub:6 * sub])
    t_cap = ray[6 * sub:7 * sub]
    live = ray[7 * sub:8 * sub] > 0.0

    eps = 1e-12
    sdx = jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    sdy = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    sdz = jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    idx_ = 1.0 / sdx
    idy_ = 1.0 / sdy
    idz_ = 1.0 / sdz
    # slab tests below are FMA-shaped: t = lo * inv - (o * inv)
    oxi = ox * idx_
    oyi = oy * idy_
    ozi = oz * idz_

    # Batched-3D views: node columns arrive as (K, 1, 1) and broadcast
    # against (1, 8, 128) ray chunks — all K children/tris x one vreg
    # tile of rays per op chain.  The middle (sublane) dim MUST be one
    # vreg tile (8): Mosaic's (K,1,1) broadcast lowering CHECK-fails
    # when it spans multiple tiles, so a packet's sub rows are processed
    # in sub//8 static chunks.
    CH = 8
    nch = sub // CH

    def ch3(x, c):                      # chunk c as (1, 8, 128)
        return x[c * CH:(c + 1) * CH][None]

    # dominant direction octant -> near-to-far child visit order
    fx = (jnp.sum(jnp.where(live, dx, 0.0)) < 0.0).astype(jnp.int32)
    fy = (jnp.sum(jnp.where(live, dy, 0.0)) < 0.0).astype(jnp.int32)
    fz = (jnp.sum(jnp.where(live, dz, 0.0)) < 0.0).astype(jnp.int32)
    flip = (fx << 2) | (fy << 1) | fz

    leaf_level = n_levels - 1

    if seeded:
        seed = seed_ref[pl.program_id(0)]
        stack_scr[0] = jnp.maximum(seed, 0)
        sp0 = jnp.where(seed >= 0, jnp.int32(1), jnp.int32(0))
    else:
        # seed: the root node (level 0 index 0)
        stack_scr[0] = jnp.int32(0 << _ENC_LEVEL_BITS | 0)
        sp0 = jnp.int32(1)

    neg1 = jnp.full((sub, 128), -1.0)
    zero = jnp.zeros((sub, 128))

    # Register-pressure note: the vector while-carry is kept MINIMAL —
    # (best_t, best_tri) only.  The hit mask is best_tri >= 0 (misses
    # carry the -1 sentinel payload; leaf tests require pay >= 0), and
    # barycentrics join the carry only when a consumer wants them.

    def _unpack(s):
        pend = pslot = None
        if leaf_hbm:
            s, pend, pslot = s[:-2], s[-2], s[-1]
        if want_uv:
            sp, visits, best_t, best_tri, best_u, best_v = s
        else:
            sp, visits, best_t, best_tri = s
            best_u = best_v = zero
        return sp, visits, best_t, best_tri, best_u, best_v, pend, pslot

    def _pack(sp, visits, best_t, best_tri, best_u, best_v,
              pend=None, pslot=None):
        if want_uv:
            s = (sp, visits, best_t, best_tri, best_u, best_v)
        else:
            s = (sp, visits, best_t, best_tri)
        if leaf_hbm:
            s = s + (pend, pslot)
        return s

    def cond(s):
        sp, visits, best_t, best_tri = s[:4]
        go = sp > 0
        if leaf_hbm:
            go = go | (s[-2] >= 0)      # pending prefetched leaf
        go = go & (visits < max_visits)
        if any_hit:
            go = go & jnp.any(live & (best_tri < 0.0))
        return go

    def leaf_mt(row, active, best_t, best_tri, best_u, best_v):
        """Moller-Trumbore a (1, >=120) leaf row against the packet."""
        tcol = row.T                                   # (W, 1)

        def col(c):                                    # (12, 1, 1)
            return tcol[c * LEAF_TRIS:(c + 1) * LEAF_TRIS][:, :, None]
        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        pay3 = col(9) * jnp.ones((1, CH, 128))    # (12, 8, 128)
        # Moller-Trumbore: all LEAF_TRIS tris x one ray chunk per
        # batched op chain
        ts, tris, us, vs = [], [], [], []
        for c in range(nch):
            sl = slice(c * CH, (c + 1) * CH)
            dxc, dyc, dzc = ch3(dx, c), ch3(dy, c), ch3(dz, c)
            px = dyc * e2z - dzc * e2y
            py = dzc * e2x - dxc * e2z
            pz = dxc * e2y - dyc * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-7, 0.0, 1.0 / det)
            tx = ch3(ox, c) - v0x
            ty = ch3(oy, c) - v0y
            tz = ch3(oz, c) - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((inv_det != 0.0) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (tt > 1e-7) & (pay3 >= 0.0))
            # closest-hit fold, static batch indices
            bt2, btri2 = best_t[sl], best_tri[sl]
            bu2, bv2 = best_u[sl], best_v[sl]
            act = active[sl]
            for j in range(LEAF_TRIS):
                upd = ok[j] & (tt[j] < bt2) & act
                bt2 = jnp.where(upd, tt[j], bt2)
                btri2 = jnp.where(upd, pay3[j], btri2)
                if want_uv:
                    bu2 = jnp.where(upd, u[j], bu2)
                    bv2 = jnp.where(upd, v[j], bv2)
            ts.append(bt2)
            tris.append(btri2)
            us.append(bu2)
            vs.append(bv2)
        cat = (lambda xs: xs[0] if nch == 1
               else jnp.concatenate(xs, axis=0))
        return cat(ts), cat(tris), cat(us), cat(vs)

    def body(s):
        (sp, visits, best_t, best_tri, best_u, best_v,
         pend, pslot) = _unpack(s)
        # leaf_hbm pipelining peeks without popping (sp may be 0 on the
        # drain iteration); the plain path pops unconditionally
        top = jnp.maximum(sp - 1, 0) if leaf_hbm else sp - 1
        entry = stack_scr[top]
        if not leaf_hbm:
            sp = sp - 1
        if explicit_refs:
            # SAH tree: stack entries are (row << 1) | is_leaf
            level = jnp.int32(0)
            node = entry >> 1
        else:
            level = entry & ((1 << _ENC_LEVEL_BITS) - 1)
            node = entry >> _ENC_LEVEL_BITS

        active = live & (best_t > 0.0)
        if any_hit:
            active = active & (best_tri < 0.0)

        def visit_leaf():
            row = leaf_ref[pl.ds(node, 1), :]              # (1, 120)
            bt, btri, bu, bv = leaf_mt(row, active, best_t, best_tri,
                                       best_u, best_v)
            return _pack(sp, visits + 1, bt, btri, bu, bv)

        def visit_leaf_pipelined():
            # 1-slot leaf-row DMA pipeline — see the gdir kernel's
            # docstring for the scheme (identical here)
            def with_pend():
                pr = jnp.maximum(pend, 0)
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(pr, 1), :],
                    leaf_scr.at[pl.ds(pslot, 1), :], leaf_sem)
                dma.wait()
                row = leaf_scr[pl.ds(pslot, 1), :]
                return leaf_mt(row, active, best_t, best_tri,
                               best_u, best_v)

            def no_pend():
                return best_t, best_tri, best_u, best_v

            bt, btri, bu, bv = jax.lax.cond(pend >= 0, with_pend,
                                            no_pend)

            def stash():
                ns = 1 - pslot
                pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(node, 1), :],
                    leaf_scr.at[pl.ds(ns, 1), :], leaf_sem).start()
                return sp - 1, node, ns

            def drained():
                return sp, jnp.int32(-1), pslot

            sp2, pend2, pslot2 = jax.lax.cond(sp > 0, stash, drained)
            return _pack(sp2, visits + 1, bt, btri, bu, bv,
                         pend2, pslot2)

        def visit_internal():
            if explicit_refs:
                row = cb_ref[pl.ds(node, 1), :]            # (1, 64)
            else:
                # per-level row offset of the PREFIX-TRUNCATED box
                # storage (static table -> scalar select; level dynamic)
                lrow = jnp.int32(level_offsets[0] if level_offsets else 0)
                for j in range(1, n_levels - 1):
                    lrow = jnp.where(level == j,
                                     jnp.int32(level_offsets[j]), lrow)
                row = cb_ref[pl.ds(lrow + node, 1), :]     # (1, 48)
            tcol = row.T                                   # (W, 1)

            def col(c):                                    # (8, 1, 1)
                return tcol[c * ARITY:(c + 1) * ARITY][:, :, None]
            lox, loy, loz = col(0), col(1), col(2)
            hix, hiy, hiz = col(3), col(4), col(5)
            child_level = level + 1
            # slab-test all 8 children x one ray chunk per batched chain
            acc = None
            for c in range(nch):
                sl = slice(c * CH, (c + 1) * CH)
                ixc, iyc, izc = ch3(idx_, c), ch3(idy_, c), ch3(idz_, c)
                oxc, oyc, ozc = ch3(oxi, c), ch3(oyi, c), ch3(ozi, c)
                t0x = lox * ixc - oxc
                t1x = hix * ixc - oxc
                t0y = loy * iyc - oyc
                t1y = hiy * iyc - oyc
                t0z = loz * izc - ozc
                t1z = hiz * izc - ozc
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z),
                                best_t[sl][None]))
                okc = (tmax >= tmin) & active[sl][None]
                acc = okc if acc is None else (acc | okc)
            # ONE vector->scalar sync for all ARITY hit-any bits: each
            # child's mask becomes its power-of-two, a per-vreg max
            # folds sublanes/lanes, and the cross-child sum of DISTINCT
            # powers is exactly the bitwise OR.  The per-child jnp.any
            # formulation paid ARITY cross-lane reductions + scalar
            # syncs per visit — the dominant share of the measured
            # ~4.3 us/visit.
            kbit = jnp.int32(1) << jax.lax.broadcasted_iota(
                jnp.int32, (ARITY, 1, 1), 0)
            bits3 = jnp.where(acc, kbit, 0)          # (ARITY, CH, 128)
            want_bits = jnp.sum(jnp.max(jnp.max(bits3, axis=1), axis=1))
            new_sp = sp - 1 if leaf_hbm else sp      # pop (peeked) entry
            if explicit_refs:
                # SAH node: children pre-sorted ascending along the
                # node's split axis; pop nearest first by pushing in
                # (reversed-by-ray-sign) order.  Absent slots are
                # masked by the ref sentinel.
                refs = [row[0, 48 + k] for k in range(ARITY)]
                ax = row[0, 48 + ARITY].astype(jnp.int32)
                fa = jnp.where(ax == 0, fx, jnp.where(ax == 1, fy, fz))
                rev = fa > 0
                for jj in range(ARITY - 1, -1, -1):
                    kk = jnp.where(rev, jnp.int32(ARITY - 1 - jj),
                                   jnp.int32(jj))
                    ref = jnp.where(rev, refs[ARITY - 1 - jj], refs[jj])
                    lf = ref < -0.5
                    idx = jnp.where(lf, -(ref + 1.0), ref).astype(
                        jnp.int32)
                    bit = (((want_bits >> kk) & 1)
                           * (ref > ABSENT_CUT).astype(jnp.int32))
                    stack_scr[new_sp] = (idx << 1) | lf.astype(jnp.int32)
                    new_sp = new_sp + bit
            else:
                # push far-to-near by the packet's dominant octant
                # (morton child order makes k ^ flip front-to-back), so
                # the nearest child pops first
                for jj in range(ARITY - 1, -1, -1):
                    k = jnp.int32(jj) ^ flip
                    bit = (want_bits >> k) & 1
                    child = node * ARITY + k
                    stack_scr[new_sp] = ((child << _ENC_LEVEL_BITS)
                                         | child_level)
                    new_sp = new_sp + bit
            return _pack(new_sp, visits + 1, best_t, best_tri,
                         best_u, best_v, pend, pslot)

        if explicit_refs:
            is_leaf = (entry & 1) == 1
        else:
            is_leaf = level == leaf_level
        if leaf_hbm:
            do_internal = (sp > 0) & ~is_leaf
            return jax.lax.cond(do_internal, visit_internal,
                                visit_leaf_pipelined)
        return jax.lax.cond(is_leaf, visit_leaf, visit_internal)

    init = _pack(sp0, jnp.int32(0), t_cap, neg1, zero, zero,
                 jnp.int32(-1), jnp.int32(0))
    fin = jax.lax.while_loop(cond, body, init)
    (sp, visits, best_t, best_tri, best_u, best_v,
     pend, pslot) = _unpack(fin)
    if leaf_hbm:
        # pair any in-flight prefetch's semaphore before the kernel ends
        def _drain():
            pltpu.make_async_copy(
                leaf_ref.at[pl.ds(jnp.maximum(pend, 0), 1), :],
                leaf_scr.at[pl.ds(pslot, 1), :], leaf_sem).wait()

        jax.lax.cond(pend >= 0, _drain, lambda: None)

    out_ref[0, 0:sub] = best_t
    out_ref[0, sub:2 * sub] = best_tri
    out_ref[0, 2 * sub:3 * sub] = (best_tri >= 0.0).astype(jnp.float32)
    out_ref[0, 3 * sub:4 * sub] = (jnp.full((sub, 128), 1.0)
                                   * visits.astype(jnp.float32))
    if want_uv:
        out_ref[0, 4 * sub:5 * sub] = best_u
        out_ref[0, 5 * sub:6 * sub] = best_v


GDIR_GROUP = 128              # rays per shared-direction group (1 sublane)


def _traverse_kernel_gdir(ray_ref,        # (1, 5*SUB, 128) o/t_cap/live
                          dir_ref,        # (1, RP, 128) per-chunk dir rows
                          cb_ref,         # (PR, 48) child boxes (VMEM)
                          leaf_ref,       # (NG, 120) leaf rows (VMEM/HBM)
                          out_ref,        # (1, C*SUB, 128) results
                          stack_scr,      # SMEM (STACK_CAP,) i32
                          leaf_scr,       # VMEM (1, 128) leaf-row landing
                          leaf_sem,       # DMA semaphore
                          *, n_levels: int, level_offsets: tuple,
                          any_hit: bool, max_visits: int, sub: int,
                          want_uv: bool, leaf_hbm: bool,
                          explicit_refs: bool = False):
    """Grouped-direction packet traversal: every SUBLANE (128 rays)
    shares ONE direction, carried in a tiny side table instead of six
    full-packet vector arrays.

    Motivation (ROADMAP round-3): per-visit cost of the general kernel
    is ~4.3 us at packet=4096 — far above the op-count estimate — with
    vector-register spilling the prime suspect (~70 live (sub,128)
    values).  With per-sublane directions the d/inv-d/o*inv arrays
    (9 x 4 vregs) vanish: directions become (1, 8, 1) columns read from
    a (nch, 48) VMEM table, the slab lo*inv multiplies collapse from
    (8,8,128) to (8,8,1), and the Moller-Trumbore d-cross-e2 / det /
    inv_det chain collapses from (12,8,128) to (12,8,1) — ~1.5x fewer
    full-width vector ops AND a much smaller live set.

    Ray populations that satisfy the layout: DDGI probe rays re-bricked
    to (32 cone dirs x 128 morton probes) per packet — with 256
    fibonacci rays each 32-dir block is exactly one octant — and
    uniform-direction sun rays (every group identical).
    """
    ray = ray_ref[0]
    ox, oy, oz = ray[0:sub], ray[sub:2 * sub], ray[2 * sub:3 * sub]
    t_cap = ray[3 * sub:4 * sub]
    live = ray[4 * sub:5 * sub] > 0.0

    CH = 8
    nch = sub // CH

    def ch3(x, c):                      # chunk c as (1, 8, 128)
        return x[c * CH:(c + 1) * CH][None]

    # per-chunk direction columns (hoisted: nch x 6 tiny (1,8,1) values).
    # dir_ref rows are lane-padded to 128 (Mosaic block divisibility);
    # the 48 payload values live in lanes 0..47 and become sublanes
    # 0..47 of the (128, 1) transpose.
    dcol = []
    sx = jnp.float32(0.0)
    sy = jnp.float32(0.0)
    sz = jnp.float32(0.0)
    for c in range(nch):
        t = dir_ref[0, c:c + 1, :].T                  # (128, 1)
        cols = tuple(t[k * CH:(k + 1) * CH][None] for k in range(6))
        dcol.append(cols)
        sx = sx + jnp.sum(t[0:CH])
        sy = sy + jnp.sum(t[CH:2 * CH])
        sz = sz + jnp.sum(t[2 * CH:3 * CH])

    # dominant direction octant -> near-to-far child visit order
    fx = (sx < 0.0).astype(jnp.int32)
    fy = (sy < 0.0).astype(jnp.int32)
    fz = (sz < 0.0).astype(jnp.int32)
    flip = (fx << 2) | (fy << 1) | fz

    leaf_level = n_levels - 1
    stack_scr[0] = jnp.int32(0)

    neg1 = jnp.full((sub, 128), -1.0)
    zero = jnp.zeros((sub, 128))

    def _unpack(s):
        pend = pslot = None
        if leaf_hbm:
            s, pend, pslot = s[:-2], s[-2], s[-1]
        if want_uv:
            sp, visits, best_t, best_tri, best_u, best_v = s
        else:
            sp, visits, best_t, best_tri = s
            best_u = best_v = zero
        return sp, visits, best_t, best_tri, best_u, best_v, pend, pslot

    def _pack(sp, visits, best_t, best_tri, best_u, best_v,
              pend=None, pslot=None):
        if want_uv:
            s = (sp, visits, best_t, best_tri, best_u, best_v)
        else:
            s = (sp, visits, best_t, best_tri)
        if leaf_hbm:
            s = s + (pend, pslot)
        return s

    def cond(s):
        sp, visits, best_t, best_tri = s[:4]
        go = sp > 0
        if leaf_hbm:
            go = go | (s[-2] >= 0)      # pending prefetched leaf
        go = go & (visits < max_visits)
        if any_hit:
            go = go & jnp.any(live & (best_tri < 0.0))
        return go

    def leaf_mt(row, active, best_t, best_tri, best_u, best_v):
        """Moller-Trumbore a (1, >=120) leaf row against the packet;
        returns the folded (best_t, best_tri, best_u, best_v)."""
        tcol = row.T                                   # (W, 1)

        def col(c):                                    # (12, 1, 1)
            return tcol[c * LEAF_TRIS:(c + 1) * LEAF_TRIS][:, :, None]
        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        pay3 = col(9) * jnp.ones((1, CH, 128))    # (12, 8, 128)
        ts, tris, us, vs = [], [], [], []
        for c in range(nch):
            sl = slice(c * CH, (c + 1) * CH)
            dxc, dyc, dzc = dcol[c][0], dcol[c][1], dcol[c][2]
            # d x e2, det, inv_det: direction is per-sublane, so the
            # whole chain stays (12, 8, 1) — no 128-lane work
            px = dyc * e2z - dzc * e2y                 # (12, 8, 1)
            py = dzc * e2x - dxc * e2z
            pz = dxc * e2y - dyc * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-7, 0.0, 1.0 / det)
            tx = ch3(ox, c) - v0x                      # (12, 8, 128)
            ty = ch3(oy, c) - v0y
            tz = ch3(oz, c) - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((jnp.abs(det) >= 1e-7) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (tt > 1e-7) & (pay3 >= 0.0))
            bt2, btri2 = best_t[sl], best_tri[sl]
            bu2, bv2 = best_u[sl], best_v[sl]
            act = active[sl]
            for j in range(LEAF_TRIS):
                upd = ok[j] & (tt[j] < bt2) & act
                bt2 = jnp.where(upd, tt[j], bt2)
                btri2 = jnp.where(upd, pay3[j], btri2)
                if want_uv:
                    bu2 = jnp.where(upd, u[j], bu2)
                    bv2 = jnp.where(upd, v[j], bv2)
            ts.append(bt2)
            tris.append(btri2)
            us.append(bu2)
            vs.append(bv2)
        cat = (lambda xs: xs[0] if nch == 1
               else jnp.concatenate(xs, axis=0))
        return cat(ts), cat(tris), cat(us), cat(vs)

    def body(s):
        (sp, visits, best_t, best_tri, best_u, best_v,
         pend, pslot) = _unpack(s)
        # leaf_hbm pipelining peeks without popping (sp may be 0 on the
        # drain iteration); the plain path pops unconditionally
        top = jnp.maximum(sp - 1, 0) if leaf_hbm else sp - 1
        entry = stack_scr[top]
        if not leaf_hbm:
            sp = sp - 1
        if explicit_refs:
            level = jnp.int32(0)
            node = entry >> 1
        else:
            level = entry & ((1 << _ENC_LEVEL_BITS) - 1)
            node = entry >> _ENC_LEVEL_BITS

        active = live & (best_t > 0.0)
        if any_hit:
            active = active & (best_tri < 0.0)

        def visit_leaf():
            row = leaf_ref[pl.ds(node, 1), :]              # (1, 120)
            bt, btri, bu, bv = leaf_mt(row, active, best_t, best_tri,
                                       best_u, best_v)
            return _pack(sp, visits + 1, bt, btri, bu, bv)

        def visit_leaf_pipelined():
            """1-slot software pipeline for HBM-resident leaf rows: a
            popped leaf's row DMA starts immediately but its MT work is
            DEFERRED one scheduling step, so the copy flies behind the
            next node's compute (or the previous leaf's MT when leaves
            pop back-to-back — chop nodes push runs of them).  Two
            ping-ponged landing rows; at most ONE copy outstanding."""
            def with_pend():
                pr = jnp.maximum(pend, 0)
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(pr, 1), :],
                    leaf_scr.at[pl.ds(pslot, 1), :], leaf_sem)
                dma.wait()
                row = leaf_scr[pl.ds(pslot, 1), :]
                return leaf_mt(row, active, best_t, best_tri,
                               best_u, best_v)

            def no_pend():
                return best_t, best_tri, best_u, best_v

            bt, btri, bu, bv = jax.lax.cond(pend >= 0, with_pend,
                                            no_pend)

            def stash():
                ns = 1 - pslot
                pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(node, 1), :],
                    leaf_scr.at[pl.ds(ns, 1), :], leaf_sem).start()
                return sp - 1, node, ns

            def drained():
                return sp, jnp.int32(-1), pslot

            has_top = sp > 0
            sp2, pend2, pslot2 = jax.lax.cond(has_top, stash, drained)
            return _pack(sp2, visits + 1, bt, btri, bu, bv,
                         pend2, pslot2)

        def visit_internal():
            if explicit_refs:
                row = cb_ref[pl.ds(node, 1), :]            # (1, 64)
            else:
                lrow = jnp.int32(level_offsets[0] if level_offsets
                                 else 0)
                for j in range(1, n_levels - 1):
                    lrow = jnp.where(level == j,
                                     jnp.int32(level_offsets[j]), lrow)
                row = cb_ref[pl.ds(lrow + node, 1), :]     # (1, 48)
            tcol = row.T                                   # (W, 1)

            def col(c):                                    # (8, 1, 1)
                return tcol[c * ARITY:(c + 1) * ARITY][:, :, None]
            lox, loy, loz = col(0), col(1), col(2)
            hix, hiy, hiz = col(3), col(4), col(5)
            child_level = level + 1
            acc = None
            for c in range(nch):
                sl = slice(c * CH, (c + 1) * CH)
                ixc, iyc, izc = dcol[c][3], dcol[c][4], dcol[c][5]
                # o*inv per chunk: 3 x (1,8,128); lo/hi*inv: (8,8,1)
                oxi = ch3(ox, c) * ixc
                oyi = ch3(oy, c) * iyc
                ozi = ch3(oz, c) * izc
                t0x = lox * ixc - oxi
                t1x = hix * ixc - oxi
                t0y = loy * iyc - oyi
                t1y = hiy * iyc - oyi
                t0z = loz * izc - ozi
                t1z = hiz * izc - ozi
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z),
                                best_t[sl][None]))
                okc = (tmax >= tmin) & active[sl][None]
                acc = okc if acc is None else (acc | okc)
            # single-sync OR-reduction of the per-child hit-any bits —
            # see _traverse_kernel.visit_internal for the rationale
            kbit = jnp.int32(1) << jax.lax.broadcasted_iota(
                jnp.int32, (ARITY, 1, 1), 0)
            bits3 = jnp.where(acc, kbit, 0)          # (ARITY, CH, 128)
            want_bits = jnp.sum(jnp.max(jnp.max(bits3, axis=1), axis=1))
            new_sp = sp - 1 if leaf_hbm else sp      # pop (peeked) entry
            if explicit_refs:
                refs = [row[0, 48 + k] for k in range(ARITY)]
                ax = row[0, 48 + ARITY].astype(jnp.int32)
                fa = jnp.where(ax == 0, fx, jnp.where(ax == 1, fy, fz))
                rev = fa > 0
                for jj in range(ARITY - 1, -1, -1):
                    kk = jnp.where(rev, jnp.int32(ARITY - 1 - jj),
                                   jnp.int32(jj))
                    ref = jnp.where(rev, refs[ARITY - 1 - jj], refs[jj])
                    lf = ref < -0.5
                    idx = jnp.where(lf, -(ref + 1.0), ref).astype(
                        jnp.int32)
                    bit = (((want_bits >> kk) & 1)
                           * (ref > ABSENT_CUT).astype(jnp.int32))
                    stack_scr[new_sp] = (idx << 1) | lf.astype(jnp.int32)
                    new_sp = new_sp + bit
            else:
                for jj in range(ARITY - 1, -1, -1):
                    k = jnp.int32(jj) ^ flip
                    bit = (want_bits >> k) & 1
                    child = node * ARITY + k
                    stack_scr[new_sp] = ((child << _ENC_LEVEL_BITS)
                                         | child_level)
                    new_sp = new_sp + bit
            return _pack(new_sp, visits + 1, best_t, best_tri,
                         best_u, best_v, pend, pslot)

        if explicit_refs:
            is_leaf = (entry & 1) == 1
        else:
            is_leaf = level == leaf_level
        if leaf_hbm:
            do_internal = (sp > 0) & ~is_leaf
            return jax.lax.cond(do_internal, visit_internal,
                                visit_leaf_pipelined)
        return jax.lax.cond(is_leaf, visit_leaf, visit_internal)

    init = _pack(jnp.int32(1), jnp.int32(0), t_cap, neg1, zero, zero,
                 jnp.int32(-1), jnp.int32(0))
    fin = jax.lax.while_loop(cond, body, init)
    (sp, visits, best_t, best_tri, best_u, best_v,
     pend, pslot) = _unpack(fin)
    if leaf_hbm:
        # pair any in-flight prefetch's semaphore before the kernel ends
        # (early any_hit / visit-bound exits can leave one outstanding)
        def _drain():
            pltpu.make_async_copy(
                leaf_ref.at[pl.ds(jnp.maximum(pend, 0), 1), :],
                leaf_scr.at[pl.ds(pslot, 1), :], leaf_sem).wait()

        jax.lax.cond(pend >= 0, _drain, lambda: None)

    out_ref[0, 0:sub] = best_t
    out_ref[0, sub:2 * sub] = best_tri
    out_ref[0, 2 * sub:3 * sub] = (best_tri >= 0.0).astype(jnp.float32)
    out_ref[0, 3 * sub:4 * sub] = (jnp.full((sub, 128), 1.0)
                                   * visits.astype(jnp.float32))
    if want_uv:
        out_ref[0, 4 * sub:5 * sub] = best_u
        out_ref[0, 5 * sub:6 * sub] = best_v


def traverse_pallas_gdir(bvh: Bvh, origins, group_dirs, t_max,
                         any_hit: bool = False,
                         max_visits: int | None = None,
                         packet: int = PACKET, live=None,
                         interpret: bool = False, want_uv: bool = False,
                         leaf_hbm: bool = False):
    """Grouped-direction packet traversal: ray i's direction is
    group_dirs[i // 128] — every 128 consecutive rays share one
    direction (see _traverse_kernel_gdir).  Same return contract as
    traverse_pallas."""
    n = origins.shape[0]
    sub = packet // _LANE
    nch = sub // 8
    n_pad = -(-n // packet) * packet
    p = n_pad // packet
    n_grp = n_pad // GDIR_GROUP
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(p, sub, _LANE)

    if live is None:
        live = jnp.ones((n,), jnp.float32)
    else:
        live = jnp.asarray(live, jnp.float32)
    packed = jnp.concatenate([
        comp(origins[:, 0]), comp(origins[:, 1]), comp(origins[:, 2]),
        comp(t_max), comp(live),
    ], axis=1)                                            # (P, 40, 128)

    # per-chunk direction table: row = [dx0..7 dy0..7 dz0..7 ix.. iy.. iz..]
    gd = jnp.asarray(group_dirs, jnp.float32)
    if gd.shape[0] != n_grp:
        gd = jnp.pad(gd, ((0, n_grp - gd.shape[0]), (0, 0)))
    eps = 1e-12
    sd = jnp.where(jnp.abs(gd) < eps, jnp.where(gd < 0, -eps, eps), gd)
    inv = 1.0 / sd
    dg = sd.reshape(p, nch, 8, 3).transpose(0, 1, 3, 2)
    ig = inv.reshape(p, nch, 8, 3).transpose(0, 1, 3, 2)
    # lane-pad each 48-value dir row to 128 so the (1, nch, 128) block
    # satisfies Mosaic's lane divisibility (see the kernel's dcol note)
    table = jnp.concatenate([dg.reshape(p, nch, 24),
                             ig.reshape(p, nch, 24)],
                            axis=-1)                      # (P, nch, 48)
    table = jnp.pad(table, ((0, 0), (0, 0), (0, _LANE - 48)))

    explicit = hasattr(bvh, 'node_rows')
    leaf = bvh.leaf_rows
    if leaf_hbm:
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1])))
    cb = _node_array(bvh)
    if max_visits is None:
        max_visits = int(cb.shape[0]) + int(leaf.shape[0])
    if leaf_hbm:
        # the 1-slot leaf pipeline spends an extra (cheap) scheduling
        # iteration per leaf stash
        max_visits = 2 * max_visits + 2

    rows = 6 if want_uv else 4
    kernel = functools.partial(
        _traverse_kernel_gdir,
        n_levels=2 if explicit else bvh.num_levels,
        level_offsets=(0,) if explicit else tuple(bvh.level_offset),
        any_hit=any_hit,
        max_visits=max_visits, sub=sub, want_uv=want_uv,
        leaf_hbm=leaf_hbm, explicit_refs=explicit)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 5 * sub, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if leaf_hbm
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * sub, _LANE),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, rows * sub, _LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32),
                        # 2 ping-ponged leaf-row landing slots (the
                        # leaf_hbm 1-slot DMA pipeline)
                        pltpu.VMEM((2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(packed, table, cb, leaf)

    def flat(i):
        return out[:, i * sub:(i + 1) * sub, :].reshape(-1)[:n]

    t = flat(0)
    tri = flat(1).astype(jnp.int32)
    hit = flat(2) > 0.0
    zero = jnp.zeros((n,), jnp.float32)
    return dict(hit=hit, t=jnp.where(hit, t, t_max[:n]), tri=tri,
                u=flat(4) if want_uv else zero,
                v=flat(5) if want_uv else zero,
                steps=flat(3).astype(jnp.int32))


def traverse_pallas(bvh: Bvh, origins, directions, t_max,
                    any_hit: bool = False, max_visits: int | None = None,
                    packet: int = PACKET, live=None,
                    interpret: bool = False, want_uv: bool = False,
                    prefilter: bool = True, leaf_hbm: bool = False):
    """Packet traversal; same contract as bvh.traverse.

    Rays are packed `packet` (default 4096) per packet in order — callers
    get the best performance when consecutive rays are coherent (image
    tiles; probe rays grouped into cones).
    want_uv=False skips barycentric tracking (no frame consumer reads
    u/v from RT results; u/v return as zeros).
    prefilter is accepted for CLI compatibility but ignored: the batched
    3D child test made the scalar packet-interval prefilter (and its 8
    per-child lax.conds) a net loss.
    Returns dict(hit (N,) bool, t, tri (i32), u, v, steps).
    """
    n = origins.shape[0]
    sub = packet // _LANE
    n_pad = -(-n // packet) * packet
    p = n_pad // packet
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(p, sub, _LANE)

    # optional per-ray mask: dead rays cost nothing (their packets skip
    # subtrees no live ray wants; fully dead packets exit immediately)
    if live is None:
        live = jnp.ones((n,), jnp.float32)
    else:
        live = jnp.asarray(live, jnp.float32)
    packed = jnp.concatenate([
        comp(origins[:, 0]), comp(origins[:, 1]), comp(origins[:, 2]),
        comp(directions[:, 0]), comp(directions[:, 1]),
        comp(directions[:, 2]),
        comp(t_max), comp(live),
    ], axis=1)                                            # (P, 64, 128)

    explicit = hasattr(bvh, 'node_rows')
    leaf = bvh.leaf_rows
    if leaf_hbm:
        # Mosaic DMA slices must be lane-aligned (128); pad row width
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1])))
    cb = _node_array(bvh)
    if max_visits is None:
        # exact bound: every internal node + every leaf group once
        max_visits = int(cb.shape[0]) + int(leaf.shape[0])
    if leaf_hbm:
        # the 1-slot leaf pipeline spends an extra (cheap) scheduling
        # iteration per leaf stash
        max_visits = 2 * max_visits + 2

    rows = 6 if want_uv else 4
    kernel = functools.partial(
        _traverse_kernel,
        n_levels=2 if explicit else bvh.num_levels,
        level_offsets=(0,) if explicit else tuple(bvh.level_offset),
        any_hit=any_hit,
        max_visits=max_visits, sub=sub, want_uv=want_uv,
        leaf_hbm=leaf_hbm, explicit_refs=explicit)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 8 * sub, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if leaf_hbm
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * sub, _LANE),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, rows * sub, _LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32),
                        # 2 ping-ponged leaf-row landing slots (the
                        # leaf_hbm 1-slot DMA pipeline)
                        pltpu.VMEM((2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(packed, cb, leaf)

    def flat(i):
        return out[:, i * sub:(i + 1) * sub, :].reshape(-1)[:n]

    t = flat(0)
    tri = flat(1).astype(jnp.int32)
    hit = flat(2) > 0.0
    zero = jnp.zeros((n,), jnp.float32)
    return dict(hit=hit, t=jnp.where(hit, t, t_max[:n]), tri=tri,
                u=flat(4) if want_uv else zero,
                v=flat(5) if want_uv else zero,
                steps=flat(3).astype(jnp.int32))


def _entry_nodes_complete(bvh: Bvh, max_entries: int = 128):
    """Deepest complete-tree level with <= max_entries nodes ->
    (boxes (E, 6) f32 [lo.xyz hi.xyz], seeds (E,) i32, level).

    Entry boxes come from the PARENT rows one level up (component-major:
    row[c*8+k] = component c of child k).  Prefix-truncated padding
    children carry sealed far-point boxes and are never selected."""
    offs = list(bvh.level_offset) + [bvh.child_boxes.shape[0]]
    leaf_level = bvh.num_levels - 1
    best = None
    for lvl in range(1, leaf_level):             # internal entries only
        if (offs[lvl] - offs[lvl - 1]) * ARITY <= max_entries:
            best = lvl
    if best is None:
        return None
    lvl = best
    rows = bvh.child_boxes[offs[lvl - 1]:offs[lvl]]
    n_par = rows.shape[0]
    b = rows.reshape(n_par, 6, ARITY).transpose(0, 2, 1)
    boxes = b.reshape(n_par * ARITY, 6)
    ids = jnp.arange(n_par * ARITY, dtype=jnp.int32)
    seeds = (ids << _ENC_LEVEL_BITS) | lvl
    return boxes, seeds, lvl


def traverse_binned(bvh: Bvh, origins, directions, t_max,
                    any_hit: bool = False, live=None, rounds: int = 2,
                    packet: int = 1024, max_entries: int = 128,
                    interpret: bool = False):
    """Binned two-phase packet traversal (exact; closest or any hit).

    The single-packet kernel walks the UNION of its rays' paths — on
    divergent sets (DDGI probe rays) ~97% of the per-visit work is
    lockstep waste.  This is the raster's answer applied to RT:

    1. Phase A slab-tests every ray against the ~max_entries ENTRY
       subtree boxes in one vectorized XLA pass (no tree walk).
    2. Each round bins the still-active rays by their NEAREST unvisited
       entry (capacity-padded packet groups, like the raster's chunk
       lists) and runs the packet kernel SEEDED at that entry — a
       packet only ever walks one subtree, with rays that chose it, so
       visit unions collapse to the bin's locality; best_t from earlier
       rounds rides in as t_cap, and a ray whose hit precedes every
       unvisited entry interval drops out (near-to-far exactness).
    3. Rays still unfinished after `rounds` take one root-seeded
       live-masked pass, so the result is EXACT for any `rounds`.

    Returns the traverse_pallas dict (u/v zeros; steps = rounds used).
    """
    n = origins.shape[0]
    ent = _entry_nodes_complete(bvh, max_entries)
    if ent is None:
        return traverse_pallas(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               interpret=interpret)
    boxes, seeds, _lvl = ent
    e_n = boxes.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    live_b = (jnp.ones((n,), bool) if live is None
              else jnp.asarray(live) > 0)

    # phase A: entry intervals (same eps handling as the kernel)
    eps = 1e-12
    d = directions
    sd = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    inv = 1.0 / sd
    t0 = (boxes[None, :, 0:3] - origins[:, None]) * inv[:, None]
    t1 = (boxes[None, :, 3:6] - origins[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
    tf = jnp.maximum(t0, t1).min(-1)
    ok = (tf >= tn) & live_b[:, None] & (tn <= t_max[:, None]) \
        & (tn < 1e30)
    tmins = jnp.where(ok, tn, jnp.inf)                    # (N, E)

    sub = packet // _LANE
    cap_slots = (-(-n // packet) + e_n) * packet
    cap_p = cap_slots // packet
    ids = jnp.arange(n, dtype=jnp.int32)
    e_ar = jnp.arange(e_n, dtype=jnp.int32)

    best_t = t_max
    best_tri = jnp.full((n,), -1, jnp.int32)

    leaf = bvh.leaf_rows
    leaf_hbm = not fits_vmem(bvh)
    if leaf_hbm:
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1])))
    cb = bvh.child_boxes
    max_visits = int(cb.shape[0]) + int(leaf.shape[0])
    if leaf_hbm:
        max_visits = 2 * max_visits + 2
    kernel = functools.partial(
        _traverse_kernel, n_levels=bvh.num_levels,
        level_offsets=tuple(bvh.level_offset), any_hit=any_hit,
        max_visits=max_visits, sub=sub, want_uv=False,
        leaf_hbm=leaf_hbm, explicit_refs=False, seeded=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap_p,),
        in_specs=[
            pl.BlockSpec((1, 8 * sub, _LANE), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if leaf_hbm
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * sub, _LANE),
                               lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32),
                        pltpu.VMEM((2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )

    for _r in range(rounds):
        remaining = tmins.min(axis=1)
        active = live_b & (remaining < best_t)
        if any_hit:
            active = active & (best_tri < 0)
        sel = jnp.argmin(tmins, axis=1).astype(jnp.int32)
        key = jnp.where(active, sel, jnp.int32(e_n))
        skey, sid = jax.lax.sort((key, ids), num_keys=1)
        bounds = jnp.searchsorted(skey, jnp.arange(e_n + 1,
                                                   dtype=jnp.int32))
        counts = bounds[1:] - bounds[:-1]                 # (E,)
        padded = -(-counts // packet) * packet
        cum = jnp.cumsum(padded)
        poff = cum - padded                               # (E,)
        pos = jnp.arange(n, dtype=jnp.int32)
        sk = jnp.minimum(skey, e_n - 1)
        slot = jnp.where(skey < e_n,
                         poff[sk] + (pos - bounds[sk]),
                         jnp.int32(cap_slots))
        # sorted-by-ray slot table (no scatter: sid is a permutation)
        _, slot_of_ray = jax.lax.sort((sid, slot), num_keys=1)
        # slot -> ray (one scatter of N unique i32)
        ray_slot = jnp.full((cap_slots,), -1, jnp.int32).at[
            jnp.minimum(slot, cap_slots - 1)].set(
                jnp.where(slot < cap_slots, sid, -1), mode='drop',
                unique_indices=True)
        # per-packet seed: packet p belongs to the entry whose padded
        # range covers slot p*packet
        sp_ = jnp.arange(cap_p, dtype=jnp.int32) * packet
        e_of_p = jnp.searchsorted(cum, sp_, side='right').astype(
            jnp.int32)
        seed_p = jnp.where(e_of_p < e_n,
                           seeds[jnp.minimum(e_of_p, e_n - 1)],
                           jnp.int32(-1))

        ridx = jnp.maximum(ray_slot, 0)
        valid = (ray_slot >= 0).astype(jnp.float32)

        def comp(x):
            return x[ridx].reshape(cap_p, sub, _LANE)
        packed = jnp.concatenate([
            comp(origins[:, 0]), comp(origins[:, 1]),
            comp(origins[:, 2]),
            comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
            comp(best_t), valid.reshape(cap_p, sub, _LANE),
        ], axis=1)

        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cap_p, 4 * sub, _LANE),
                                           jnp.float32),
            interpret=interpret,
        )(seed_p, packed, cb, leaf)

        sl_ok = slot_of_ray < cap_slots
        sl = jnp.minimum(slot_of_ray, cap_slots - 1)
        o_flat_t = out[:, 0:sub].reshape(-1)
        o_flat_i = out[:, sub:2 * sub].reshape(-1)
        t_r = o_flat_t[sl]
        tri_r = o_flat_i[sl].astype(jnp.int32)
        upd = sl_ok & (tri_r >= 0) & (t_r < best_t)
        best_t = jnp.where(upd, t_r, best_t)
        best_tri = jnp.where(upd, tri_r, best_tri)
        tmins = jnp.where(active[:, None] & (e_ar[None] == sel[:, None]),
                          jnp.inf, tmins)

    # exactness fallback: any ray whose unvisited entries could still
    # beat its best hit takes one root-seeded live-masked pass
    rem = live_b & (tmins.min(axis=1) < best_t)
    if any_hit:
        rem = rem & (best_tri < 0)
    res = traverse_pallas(bvh, origins, directions, best_t,
                          any_hit=any_hit,
                          live=rem.astype(jnp.float32),
                          interpret=interpret)
    upd = rem & res['hit'] & (res['t'] < best_t)
    best_t = jnp.where(upd, res['t'], best_t)
    best_tri = jnp.where(upd, res['tri'], best_tri)

    hit = best_tri >= 0
    zero = jnp.zeros((n,), jnp.float32)
    return dict(hit=hit, t=jnp.where(hit, best_t, t_max), tri=best_tri,
                u=zero, v=zero, steps=jnp.zeros((n,), jnp.int32))
