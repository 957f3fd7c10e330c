"""Pallas TPU packet traversal for the 8-ary BVH (ops/bvh.py).

The XLA lockstep traversal (bvh.traverse) pays two row gathers per ray per
step — every ray fetches an 80-float leaf row AND a 48-float child-box row
each iteration whether it needs them or not, and the while-loop runs until
the SLOWEST ray finishes (measured 0.17 Mrays/s at round 1).  This kernel
reshapes the problem for the TPU the classic way: RAY PACKETS.

* A packet is 1024 rays laid out as (8, 128) vregs — one full VPU tile per
  vector op.  The whole packet walks the tree together with ONE shared
  scalar DFS stack (SMEM), so there are NO per-ray gathers at all: node
  data is read once per visit and broadcast to all lanes via (1, 1)
  vector-register splats.
* Internal nodes: the 8 child slab tests are evaluated for all 1024 rays
  (~20 VPU ops per child); children any ray intersects are pushed
  near-to-far by the packet's dominant direction octant (morton child
  order makes k XOR flipmask a front-to-back order).
* Leaves: LEAF_TRIS Moller-Trumbore tests for the whole packet,
  closest-hit update against per-ray best_t (which also tightens
  subsequent slab tests).
* `any_hit` packets terminate once every live ray has a hit.

Packets win when rays are coherent: shadow rays (shared sun direction,
tile-local origins — shadowmask.hlsl parity) and DDGI probe rays grouped
DIRECTION-major (grid-adjacent probe origins, shared direction; see
ddgi.trace_probe_block) both are.  Incoherent sets degrade toward the
union of per-ray traversals, never worse than visiting every node once.

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
#                               (measured best on v5e: 10.3 Mrays/s vs
#                               9.2 @2048 / 10.0 @8192, sun rays over the
#                               bench scene)
_LANE = 128
STACK_CAP = 160               # DFS stack bound: (levels-1)*7+1, levels<=12
_ENC_LEVEL_BITS = 4           # stack entry = (index << 4) | level


def _row_bytes(n_rows: int) -> int:
    # Mosaic pads VMEM arrays to (8, 128) f32 tiles: any row narrower
    # than 128 lanes still occupies 128 lanes physically
    return -(-n_rows // 8) * 8 * 128 * 4


def fits_vmem(bvh: Bvh, budget_bytes: int = 13 * 2**20) -> bool:
    """True if this BVH's node data fits the kernel's VMEM staging budget
    (REAL lane-padded bytes, ~16 MB/core minus packet/scratch room)."""
    return (_row_bytes(bvh.child_boxes.shape[0])
            + _row_bytes(bvh.leaf_rows.shape[0])) <= budget_bytes


def boxes_fit_vmem(bvh: Bvh, budget_bytes: int = 12 * 2**20) -> bool:
    """True if at least the internal child boxes fit VMEM — the big-scene
    mode: boxes staged in VMEM, leaf rows stay HBM-resident and stream in
    per leaf visit with an async DMA (one 512B padded row per visit).
    Internal boxes are a small fraction of the tree bytes (prefix-
    truncated levels), so this covers Bistro-scale scenes the all-VMEM
    kernel cannot stage."""
    return _row_bytes(bvh.child_boxes.shape[0]) <= budget_bytes


def traverse_auto(bvh: Bvh, origins, directions, t_max,
                  any_hit: bool = False, max_steps: int = 128,
                  live=None, interpret: bool = False, sp_mesh=None):
    """Dispatch: packet kernel on TPU when the tree fits VMEM, else the
    XLA lockstep traversal (also the CPU/test path).  Same contract as
    bvh.traverse; `live` optionally masks rays off (they report miss).

    sp_mesh=(Mesh, axis): rays are embarrassingly parallel — shard the
    packet stream over the mesh axis with a REPLICATED tree (the
    multi-chip RT path; the reference is single-GPU so this is new
    TPU-native capability).
    """
    import jax
    if sp_mesh is not None and sp_mesh[0].shape[sp_mesh[1]] > 1:
        return _traverse_sharded(bvh, origins, directions, t_max,
                                 any_hit=any_hit, max_steps=max_steps,
                                 live=live, interpret=interpret,
                                 sp_mesh=sp_mesh)
    from toyrenderer_tpu.ops.bvh import traverse as traverse_xla
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    if fits_vmem(bvh) and (on_tpu or interpret):
        return traverse_pallas(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               interpret=interpret)
    if boxes_fit_vmem(bvh) and on_tpu:
        # Sponza-scale: leaf rows stream from HBM per visit
        return traverse_pallas(bvh, origins, directions, t_max,
                               any_hit=any_hit, live=live,
                               leaf_hbm=True)
    if live is not None:
        t_max = jnp.where(jnp.asarray(live, bool),
                          jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                           (origins.shape[0],)), 0.0)
    return traverse_xla(bvh, origins, directions, t_max,
                        max_steps=max_steps, any_hit=any_hit)


def _traverse_sharded(bvh: Bvh, origins, directions, t_max,
                      any_hit: bool, max_steps: int, live, interpret,
                      sp_mesh):
    """shard_map over ray blocks: each device traverses its slice of the
    ray stream against the replicated BVH; results concatenate back.
    Bitwise-identical to the single-device path (no cross-ray math)."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh, axis = sp_mesh
    nsp = mesh.shape[axis]
    n = origins.shape[0]
    n_pad = -(-n // nsp) * nsp

    def pad(x):
        return jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1))

    origins_p = pad(origins)
    dirs_p = pad(directions)
    t_max_p = pad(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    live_p = pad(jnp.ones((n,), jnp.float32) if live is None
                 else jnp.asarray(live, jnp.float32))

    def local(bvh, o, d, tm, lv):
        return traverse_auto(bvh, o, d, tm, any_hit=any_hit,
                             max_steps=max_steps, live=lv,
                             interpret=interpret)

    res = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_rep=False)(
        bvh, origins_p, dirs_p, t_max_p, live_p)
    return {k: v[:n] for k, v in res.items()}


def _bcast(row, j):
    """Extract element j of a (1, W) node-row value as a 0-d scalar; the
    scalar-x-vector arithmetic that follows broadcasts natively.  j must
    be a static int (Mosaic has no dynamic value slicing, and composed
    two-axis vector broadcasts fail to lower)."""
    return row[0, j]


def _traverse_kernel(ray_ref,            # (1, 8*SUB, 128) packet components
                     cb_ref,             # (PR, 48) child boxes (VMEM)
                     leaf_ref,           # (NG, 80) leaf rows (VMEM)
                     out_ref,            # (1, C*SUB, 128) results
                     stack_scr,          # SMEM (STACK_CAP,) i32
                     leaf_scr,           # VMEM (1, 80) leaf-row landing
                     leaf_sem,           # DMA semaphore
                     *, n_levels: int, level_offsets: tuple,
                     any_hit: bool, max_visits: int, sub: int,
                     want_uv: bool, prefilter: bool, leaf_hbm: bool):
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

    # dominant direction octant -> near-to-far child visit order
    fx = (jnp.sum(jnp.where(live, dx, 0.0)) < 0.0).astype(jnp.int32)
    fy = (jnp.sum(jnp.where(live, dy, 0.0)) < 0.0).astype(jnp.int32)
    fz = (jnp.sum(jnp.where(live, dz, 0.0)) < 0.0).astype(jnp.int32)
    flip = (fx << 2) | (fy << 1) | fz

    if prefilter:
        # Scalar packet-interval bounds (Wald-style): when every live
        # ray agrees on a direction sign per axis (coherent packets —
        # the design case), a ~30-scalar-op interval slab test can
        # reject a child before paying the full-vector test.  Sign-fold
        # each axis so inv dir is a POSITIVE interval: o' = s*o,
        # i' = |i|, child planes swap lo/hi under s<0.
        binf = jnp.float32(3e37)

        def _axis(o, i):
            o_lo = jnp.min(jnp.where(live, o, binf))
            o_hi = jnp.max(jnp.where(live, o, -binf))
            i_lo = jnp.min(jnp.where(live, i, binf))
            i_hi = jnp.max(jnp.where(live, i, -binf))
            coh = (i_lo > 0.0) | (i_hi < 0.0)
            s = i_lo > 0.0                   # sign+ (if coherent)
            of_lo = jnp.where(s, o_lo, -o_hi)
            of_hi = jnp.where(s, o_hi, -o_lo)
            if_lo = jnp.where(s, i_lo, -i_hi)
            if_hi = jnp.where(s, i_hi, -i_lo)
            return coh, s, of_lo, of_hi, if_lo, if_hi
        cohx, sx_, oxl, oxh, ixl, ixh = _axis(ox, idx_)
        cohy, sy_, oyl, oyh, iyl, iyh = _axis(oy, idy_)
        cohz, sz_, ozl, ozh, izl, izh = _axis(oz, idz_)
        coherent = cohx & cohy & cohz

    leaf_level = n_levels - 1

    # seed: the root node (level 0 index 0)
    stack_scr[0] = jnp.int32(0 << _ENC_LEVEL_BITS | 0)

    neg1 = jnp.full((sub, 128), -1.0)
    zero = jnp.zeros((sub, 128))

    # Register-pressure note: the vector while-carry is kept MINIMAL —
    # (best_t, best_tri) only.  The hit mask is best_tri >= 0 (misses
    # carry the -1 sentinel payload; leaf tests require pay >= 0), and
    # barycentrics join the carry only when a consumer wants them.  At
    # packet=4096 every (sub, 128) carry is 4 vregs live across the
    # whole loop body; the previous 5-vector carry measurably spilled.

    def _unpack(s):
        if want_uv:
            sp, visits, t_hi, best_t, best_tri, best_u, best_v = s
        else:
            sp, visits, t_hi, best_t, best_tri = s
            best_u = best_v = zero
        return sp, visits, t_hi, best_t, best_tri, best_u, best_v

    def _pack(sp, visits, t_hi, best_t, best_tri, best_u, best_v):
        if want_uv:
            return (sp, visits, t_hi, best_t, best_tri, best_u, best_v)
        return (sp, visits, t_hi, best_t, best_tri)

    def cond(s):
        sp, visits, t_hi, best_t, best_tri = s[:5]
        go = (sp > 0) & (visits < max_visits)
        if any_hit:
            go = go & jnp.any(live & (best_tri < 0.0))
        return go

    def body(s):
        sp, visits, t_hi, best_t, best_tri, best_u, best_v = _unpack(s)
        entry = stack_scr[sp - 1]
        sp = sp - 1
        level = entry & ((1 << _ENC_LEVEL_BITS) - 1)
        node = entry >> _ENC_LEVEL_BITS

        active = live & (best_t > 0.0)
        if any_hit:
            active = active & (best_tri < 0.0)

        def visit_leaf():
            best_t2, best_tri2 = best_t, best_tri
            best_u2, best_v2 = best_u, best_v
            if leaf_hbm:
                # big-scene mode: leaf rows live in HBM; stream ONE
                # 320B row per visit (internal boxes stay VMEM)
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(node, 1), :], leaf_scr, leaf_sem)
                dma.start()
                dma.wait()
                row = leaf_scr[:, :]
            else:
                row = leaf_ref[pl.ds(node, 1), :]          # (1, 80)
            for j in range(LEAF_TRIS):
                b = j * 10
                v0x, v0y, v0z = (_bcast(row, b), _bcast(row, b + 1),
                                 _bcast(row, b + 2))
                e1x, e1y, e1z = (_bcast(row, b + 3), _bcast(row, b + 4),
                                 _bcast(row, b + 5))
                e2x, e2y, e2z = (_bcast(row, b + 6), _bcast(row, b + 7),
                                 _bcast(row, b + 8))
                pay = _bcast(row, b + 9)
                # Moller-Trumbore vs the whole packet
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) < 1e-7, 0.0, 1.0 / det)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((inv_det != 0.0) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > 1e-7) & (t < best_t2)
                      & (pay >= 0.0) & active)
                best_t2 = jnp.where(ok, t, best_t2)
                best_tri2 = jnp.where(ok, pay, best_tri2)
                if want_uv:
                    best_u2 = jnp.where(ok, u, best_u2)
                    best_v2 = jnp.where(ok, v, best_v2)
            if any_hit:
                t_hi2 = t_hi
            else:
                # tighten the scalar prefilter ceiling to the farthest
                # still-open ray
                t_hi2 = jnp.max(jnp.where(active, best_t2, 0.0))
            return _pack(sp, visits + 1, t_hi2, best_t2, best_tri2,
                         best_u2, best_v2)

        def visit_internal():
            # per-level row offset of the PREFIX-TRUNCATED box storage
            # (static table -> scalar select chain; level is dynamic)
            lrow = jnp.int32(level_offsets[0] if level_offsets else 0)
            for j in range(1, n_levels - 1):
                lrow = jnp.where(level == j,
                                 jnp.int32(level_offsets[j]), lrow)
            row = cb_ref[pl.ds(lrow + node, 1), :]         # (1, 48)
            child_level = level + 1
            # pass 1 (static unroll): slab-test all 8 children, collect a
            # scalar hit bitmask (static lane slices only — Mosaic has no
            # dynamic value slicing)
            want_bits = jnp.int32(0)
            for k in range(ARITY):
                kb = k * 6

                def vec_test(kb=kb):
                    t0x = _bcast(row, kb) * idx_ - oxi
                    t1x = _bcast(row, kb + 3) * idx_ - oxi
                    t0y = _bcast(row, kb + 1) * idy_ - oyi
                    t1y = _bcast(row, kb + 4) * idy_ - oyi
                    t0z = _bcast(row, kb + 2) * idz_ - ozi
                    t1z = _bcast(row, kb + 5) * idz_ - ozi
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), best_t))
                    return jnp.any((tmax >= tmin) & active)

                if prefilter:
                    # scalar interval reject (conservative: only prunes)
                    lox, hix = _bcast(row, kb), _bcast(row, kb + 3)
                    loy, hiy = _bcast(row, kb + 1), _bcast(row, kb + 4)
                    loz, hiz = _bcast(row, kb + 2), _bcast(row, kb + 5)

                    def ent_ext(s, lo, hi, ol, oh, il, ih):
                        lof = jnp.where(s, lo, -hi)
                        hif = jnp.where(s, hi, -lo)
                        al = lof - oh
                        ent = al * jnp.where(al >= 0.0, il, ih)
                        bh = hif - ol
                        ext = bh * jnp.where(bh >= 0.0, ih, il)
                        return ent, ext
                    ex_, xx_ = ent_ext(sx_, lox, hix, oxl, oxh, ixl, ixh)
                    ey_, xy_ = ent_ext(sy_, loy, hiy, oyl, oyh, iyl, iyh)
                    ez_, xz_ = ent_ext(sz_, loz, hiz, ozl, ozh, izl, izh)
                    ent = jnp.maximum(jnp.maximum(ex_, ey_),
                                      jnp.maximum(ez_, 0.0))
                    ext = jnp.minimum(jnp.minimum(xx_, xy_),
                                      jnp.minimum(xz_, t_hi))
                    maybe = (~coherent) | (ent <= ext)
                    # yield i32, not i1: Mosaic rejects scalar-bool
                    # scf.if results
                    want = jax.lax.cond(
                        maybe,
                        lambda: vec_test().astype(jnp.int32),
                        lambda: jnp.int32(0))
                else:
                    want = vec_test().astype(jnp.int32)
                want_bits = want_bits | (want << k)
            # pass 2 (scalar): push far-to-near by the packet's dominant
            # octant (morton child order makes k ^ flip front-to-back),
            # so the nearest child pops first
            new_sp = sp
            for jj in range(ARITY - 1, -1, -1):
                k = jnp.int32(jj) ^ flip
                bit = (want_bits >> k) & 1
                child = node * ARITY + k
                stack_scr[new_sp] = ((child << _ENC_LEVEL_BITS)
                                     | child_level)
                new_sp = new_sp + bit
            return _pack(new_sp, visits + 1, t_hi, best_t, best_tri,
                         best_u, best_v)

        is_leaf = level == leaf_level
        return jax.lax.cond(is_leaf, visit_leaf, visit_internal)

    t_hi0 = jnp.max(jnp.where(live, t_cap, 0.0))
    init = _pack(jnp.int32(1), jnp.int32(0), t_hi0, t_cap, neg1,
                 zero, zero)
    fin = jax.lax.while_loop(cond, body, init)
    (sp, visits, t_hi, best_t, best_tri, best_u, best_v) = _unpack(fin)

    out_ref[0, 0:sub] = best_t
    out_ref[0, sub:2 * sub] = best_tri
    out_ref[0, 2 * sub:3 * sub] = (best_tri >= 0.0).astype(jnp.float32)
    out_ref[0, 3 * sub:4 * sub] = (jnp.full((sub, 128), 1.0)
                                   * visits.astype(jnp.float32))
    if want_uv:
        out_ref[0, 4 * sub:5 * sub] = best_u
        out_ref[0, 5 * sub:6 * sub] = best_v


def traverse_pallas(bvh: Bvh, origins, directions, t_max,
                    any_hit: bool = False, max_visits: int | None = None,
                    packet: int = PACKET, live=None,
                    interpret: bool = False, want_uv: bool = False,
                    prefilter: bool = True, leaf_hbm: bool = False):
    """Packet traversal; same contract as bvh.traverse.

    Rays are packed `packet` (default 4096) per packet in order — callers
    get the best performance when consecutive rays are coherent (image
    tiles; probe rays grouped by direction).
    want_uv=False skips barycentric tracking (no frame consumer reads
    u/v from RT results; u/v return as zeros).
    prefilter enables the scalar packet-interval child reject.
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

    leaf = bvh.leaf_rows
    if leaf_hbm:
        # Mosaic DMA slices must be lane-aligned (128); pad row width
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1])))
    cb = bvh.child_boxes
    if max_visits is None:
        # exact bound: every internal node + every leaf group once
        max_visits = int(cb.shape[0]) + int(leaf.shape[0])

    rows = 6 if want_uv else 4
    kernel = functools.partial(
        _traverse_kernel, n_levels=bvh.num_levels,
        level_offsets=tuple(bvh.level_offset), any_hit=any_hit,
        max_visits=max_visits, sub=sub, want_uv=want_uv,
        prefilter=prefilter, leaf_hbm=leaf_hbm)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 8 * sub, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if leaf_hbm
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * sub, _LANE),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, rows * sub, _LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32),
                        pltpu.VMEM((1, 128), jnp.float32),
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
