"""Pair-MXU ray traversal: block-pair chunk traversal with the dense
Moller-Trumbore phase as ONE MXU matmul per pair inside a Pallas kernel.

Why this exists (the round-3 traversal story, measured on v5e):
  * packet kernels (ops/bvh_pallas.py) pay ~1 us of scalar sync + cond
    per tree-node VISIT and, on divergent rays, lockstep union waste;
  * the pure-XLA block-pair scheme (ops/rt_chunks.py) has the right
    cost shape (work scales with real block-chunk overlaps) but its
    (P, block, tris) dense-MT megafusion both crashes the XLA:TPU
    fusion emitter (kSublaneGather CHECK) and compiles pathologically.

The fix is the raster fill kernel's bounded-amplification pattern
(ops/raster_pallas.py): compact the work into a (block, chunk) pair
list in XLA, then let a Pallas kernel with SCALAR-PREFETCHED pair
indices stream the dense work, one pair per grid step.

The kernel trick: Moller-Trumbore is a bank of rank<=16 BILINEAR forms.
With ray features  f = [1, o, d, o (x) d]  (16 wide) and per-triangle
coefficient vectors, using det[a,b,c] = a . (b x c):

  det   = e1 . (d x e2)             -> coeff (e2 x e1) on d
  u_num = (o - v0) . (d x e2)       -> crossmat(e2) on o(x)d, (v0 x e2) on d
  v_num = d . ((o - v0) x e1)       -> -crossmat(e1) on o(x)d, -(v0 x e1) on d
  t_num = (o - v0) . (e1 x e2)      -> (e1 x e2) on o, -v0.(e1 x e2) on 1
  pay   = payload                   -> payload on 1 (a broadcast slab)

so ALL of det/u_num/v_num/t_num/payload for (128 rays x S tris) is one
(128, 16) @ (16, 5*S) MXU matmul; u = u_num/det etc. and the closest-
hit fold are a short VPU epilogue.  Consecutive pairs of the same ray
block accumulate in-VMEM through Pallas output revisiting (the pair
list is block-major sorted), so per-ray results leave the kernel
already folded — no XLA segment reduction afterwards.

Same contract as bvh.traverse / traverse_auto (u/v reported zero — no
frame consumer reads RT barycentrics).  Exact at any pair capacity:
overflowed blocks complete through the packet dispatcher.

Reference parity: DXR RayQuery consumers
source/shaders/giprobetrace.hlsl:23-148 (closest hit) and
shadowmask.hlsl:65-145 (any hit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toyrenderer_tpu.ops.bvh import LEAF_TRIS

CHUNK_ROWS = 8                  # leaf rows per chunk
CHUNK_TRIS = CHUNK_ROWS * LEAF_TRIS     # 96
SLAB = 128                      # lane width per output slab (tris, padded)
NSLAB = 4                       # det | u_num | v_num | t_num
NFEAT = 16                      # [1, o(3), d(3), o(x)d(9)]
BLOCK = 128                     # rays per compaction block (fixed: f rows)


def _cross(a, b):
    return jnp.stack([a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
                      a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
                      a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]],
                     axis=-1)


def _crossmat(w):
    """(..., 3) -> (..., 9) row-major crossmat[i, j] = sum_k eps_ijk w_k
    (so sum_ij a_i b_j crossmat[i,j] = det[a, b, w] = a . (b x w))."""
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack([z, w[..., 2], -w[..., 1],
                      -w[..., 2], z, w[..., 0],
                      w[..., 1], -w[..., 0], z], axis=-1)


def mt_tables(bvh):
    """(boxes (C, 6) f32, feat (C + 1, NFEAT, NSLAB*SLAB) f32,
    pays ((C + 1) * SLAB,) f32) from any tree flavor carrying
    `leaf_rows` (only the LEAF ORDER matters; morton or median order
    makes CHUNK_ROWS-row runs spatially tight).  Rebuild alongside the
    moved-gated refit — coefficients are world-space.

    feat[c, :, s*SLAB + t] is slab s's 16 coefficients for chunk c's
    triangle t; padding slots are all-zero (det == 0 kills them).  The
    extra LAST row is an all-zero sentinel chunk: group-padding slots
    index it and contribute nothing.  Payloads stay OUT of the matmul
    (bf16-rounded tri ids would corrupt): the kernel reports the
    winning ORDINAL chunk*SLAB + lane and `pays` resolves it to the
    real payload post-kernel (-1 in padding slots)."""
    leaf = bvh.leaf_rows                              # (Ng, 120)
    ng = leaf.shape[0]
    c = -(-ng // CHUNK_ROWS)
    pad = c * CHUNK_ROWS - ng
    if pad:
        pad_row = jnp.zeros((pad, leaf.shape[1]), leaf.dtype)
        pad_row = pad_row.at[:, 9 * LEAF_TRIS:10 * LEAF_TRIS].set(-1.0)
        leaf = jnp.concatenate([leaf, pad_row], axis=0)
    g = leaf[:, :10 * LEAF_TRIS].reshape(c, CHUNK_ROWS, 10, LEAF_TRIS)

    v0 = g[:, :, 0:3].transpose(0, 1, 3, 2).reshape(c, CHUNK_TRIS, 3)
    e1 = g[:, :, 3:6].transpose(0, 1, 3, 2).reshape(c, CHUNK_TRIS, 3)
    e2 = g[:, :, 6:9].transpose(0, 1, 3, 2).reshape(c, CHUNK_TRIS, 3)
    pay = g[:, :, 9].reshape(c, CHUNK_TRIS)
    ok = (pay >= 0.0)[..., None]

    # chunk AABBs (padding slots excluded)
    p1 = v0 + e1
    p2 = v0 + e2
    big = jnp.float32(3e37)
    lo = jnp.where(ok, jnp.minimum(jnp.minimum(v0, p1), p2), big)
    hi = jnp.where(ok, jnp.maximum(jnp.maximum(v0, p1), p2), -big)
    boxes = jnp.concatenate([lo.min(1), hi.max(1)], axis=-1)

    zero1 = jnp.zeros((c, CHUNK_TRIS, 1))
    zero3 = jnp.zeros((c, CHUNK_TRIS, 3))
    zero9 = jnp.zeros((c, CHUNK_TRIS, 9))
    e1xe2 = _cross(e1, e2)
    f_det = jnp.concatenate(
        [zero1, zero3, _cross(e2, e1), zero9], -1)
    f_u = jnp.concatenate(
        [zero1, zero3, _cross(v0, e2), _crossmat(e2)], -1)
    f_v = jnp.concatenate(
        [zero1, zero3, -_cross(v0, e1), -_crossmat(e1)], -1)
    f_t = jnp.concatenate(
        [-jnp.sum(v0 * e1xe2, -1, keepdims=True), e1xe2, zero3,
         zero9], -1)
    feat = jnp.stack([f_det, f_u, f_v, f_t], axis=1)  # (C,4,T,16)
    feat = jnp.where(ok[:, None], feat, 0.0)
    if SLAB != CHUNK_TRIS:
        feat = jnp.pad(feat, ((0, 0), (0, 0),
                              (0, SLAB - CHUNK_TRIS), (0, 0)))
    # (C, 4, SLAB, 16) -> (C, 16, 4, SLAB) -> (C, 16, 4*SLAB)
    feat = feat.transpose(0, 3, 1, 2).reshape(c, NFEAT, NSLAB * SLAB)
    feat = jnp.concatenate(
        [feat, jnp.zeros((1, NFEAT, NSLAB * SLAB), feat.dtype)], axis=0)
    pays = jnp.pad(pay, ((0, 0), (0, SLAB - CHUNK_TRIS)),
                   constant_values=-1.0)
    pays = jnp.concatenate(
        [pays, jnp.full((1, SLAB), -1.0, pays.dtype)], axis=0)
    return boxes, feat, pays.reshape(-1)


def _make_pairs_kernel(g, precision):
    """Kernel over GROUPS of g pairs: one ray block (all g pairs share
    it) and g scalar-prefetched feat blocks per grid step — the fixed
    per-step cost (semaphores + index-map scalar work, measured
    ~3.4 us) amortizes over g chunks."""

    def kernel(gblk_ref, gchk_ref, rays_ref, *refs):
        feat_refs, out_ref = refs[:-1], refs[-1]
        i = pl.program_id(0)
        r = rays_ref[0]                               # (BLOCK, 8)
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
        cap, lv = r[:, 6:7], r[:, 7:8]
        one = jnp.ones_like(ox)
        f = jnp.concatenate(
            [one, ox, oy, oz, dx, dy, dz,
             ox * dx, ox * dy, ox * dz,
             oy * dx, oy * dy, oy * dz,
             oz * dx, oz * dy, oz * dz], axis=1)      # (BLOCK, 16)
        bt = jnp.full_like(cap, jnp.inf)
        bp = jnp.full_like(cap, jnp.inf)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK, SLAB), 1).astype(jnp.float32)
        if precision == 'high':
            # manual bf16x3 split (Mosaic has no HIGH lowering): the
            # MXU's single-pass f32 path rounds inputs to bf16 and
            # Moller-Trumbore's bilinear forms live on knife edges
            # (measured 1.2% hit flips at default precision); HIGHEST
            # (6-pass) costs 2x over this for nothing.
            f_hi = f.astype(jnp.bfloat16)
            f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        for j in range(g):
            m = feat_refs[j][0]                       # (16, 4*SLAB)
            if precision == 'high':
                m_hi = m.astype(jnp.bfloat16)
                m_lo = (m - m_hi.astype(jnp.float32)).astype(
                    jnp.bfloat16)
                prods = (jnp.dot(f_hi, m_hi,
                                 preferred_element_type=jnp.float32)
                         + (jnp.dot(f_hi, m_lo,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(f_lo, m_hi,
                                      preferred_element_type=jnp.float32)))
            else:
                prods = jnp.dot(f, m,
                                preferred_element_type=jnp.float32,
                                precision=precision)
            det = prods[:, 0:SLAB]
            u_n = prods[:, SLAB:2 * SLAB]
            v_n = prods[:, 2 * SLAB:3 * SLAB]
            t_n = prods[:, 3 * SLAB:4 * SLAB]

            inv_det = jnp.where(jnp.abs(det) < 1e-7, 0.0, 1.0 / det)
            u = u_n * inv_det
            v = v_n * inv_det
            tt = t_n * inv_det
            okt = ((inv_det != 0.0) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (tt > 1e-7) & (tt < cap)
                   & (lv > 0.0))
            tt = jnp.where(okt, tt, jnp.inf)
            btj = tt.min(axis=1, keepdims=True)       # (BLOCK, 1)
            # winner ORDINAL chunk*SLAB + lane (payload resolves
            # post-kernel: bf16-rounded ids would corrupt)
            ordinal = gchk_ref[i * g + j].astype(jnp.float32) * SLAB
            bpj = jnp.where(tt <= btj, ordinal + lane,
                            jnp.inf).min(axis=1, keepdims=True)
            take = btj < bt
            bp = jnp.where(take, bpj, bp)
            bt = jnp.where(take, btj, bt)

        # fold into the block's accumulator (same output block is
        # revisited by consecutive groups; fresh blocks start at +inf)
        p_cur = gblk_ref[i]
        p_prev = gblk_ref[jnp.maximum(i - 1, 0)]
        fresh = (i == 0) | (p_cur != p_prev)
        prev_t = jnp.where(fresh, jnp.inf, out_ref[0, :, 0:1])
        prev_p = jnp.where(fresh, jnp.inf, out_ref[0, :, 1:2])
        take = bt < prev_t
        out_ref[0, :, 0:1] = jnp.where(take, bt, prev_t)
        out_ref[0, :, 1:2] = jnp.where(take, bp, prev_p)

    return kernel


def traverse_pairs(bvh, origins, directions, t_max, any_hit: bool = False,
                   live=None, pair_factor: int = 64, tables=None,
                   group: int = 16, precision: str = 'high',
                   fallback: bool = True, interpret: bool = False):
    """Block-pair MXU traversal; contract of bvh.traverse (u/v zeros,
    steps = the ray's block's chunk-pair count).  `tables`: optional
    precomputed mt_tables(bvh), cached with the refit.  any_hit runs
    the same closest-hit math (no early-out exists in dense mode).

    Box phase and pair compaction are plain XLA at block rate; the
    dense MT + fold is the Pallas kernel above, `group` pairs of one
    ray block per grid step (each block's pair run padded to a
    multiple of `group` with sentinel chunks).  Blocks whose pair
    lists spill past `pair_factor * B` complete through the packet
    dispatcher (exact at any capacity)."""
    n = origins.shape[0]
    block = BLOCK
    boxes, feat, pays = mt_tables(bvh) if tables is None else tables
    prec = {'default': jax.lax.Precision.DEFAULT,
            'high': 'high',
            'highest': jax.lax.Precision.HIGHEST}[precision]
    c = boxes.shape[0]
    n_pad = -(-n // block) * block
    b = n_pad // block
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    live_b = (jnp.ones((n,), bool) if live is None
              else jnp.asarray(live) > 0)

    def pad(x, fill=0.0):
        return (x if n_pad == n else
                jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1),
                        constant_values=fill))

    o_p = pad(origins)
    d_p = pad(directions)
    cap_p = pad(t_max)
    lv_p = pad(live_b)

    eps = 1e-12
    sd = jnp.where(jnp.abs(d_p) < eps,
                   jnp.where(d_p < 0, -eps, eps), d_p)
    inv = 1.0 / sd

    # box phase: (N, C) slab tests reduce to (B, C) block overlap
    # bits.  Per-AXIS 2D chains — a (N, C, 3) broadcast puts the
    # 3-vector on the minor axis and runs ~30x slower on TPU.
    tn = jnp.zeros((n_pad, c), jnp.float32)
    tf = jnp.full((n_pad, c), jnp.inf, jnp.float32)
    for k in range(3):
        t0k = (boxes[None, :, k] - o_p[:, k:k + 1]) * inv[:, k:k + 1]
        t1k = (boxes[None, :, 3 + k] - o_p[:, k:k + 1]) * inv[:, k:k + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0k, t1k))
        tf = jnp.minimum(tf, jnp.maximum(t0k, t1k))
    ok = (tf >= tn) & (tn <= cap_p[:, None]) & lv_p[:, None]
    ok_b = ok.reshape(b, block, c).any(axis=1)        # (B, C)

    # pair expansion at block rate: SORT-based compaction (ascending
    # flat indices keep block-major order; jnp.nonzero and scatters
    # measured 31 + 25 ms on-device — TPU compaction is a sort)
    g = group
    pcap = max(-(-pair_factor * b // 1024) * 1024, 1024)
    sent = jnp.int32(b * c)
    keys = jnp.where(ok_b.reshape(-1),
                     jnp.arange(b * c, dtype=jnp.int32), sent)
    pidx = jax.lax.sort(keys)[:pcap]
    valid_p = pidx < sent
    pchk = jnp.where(valid_p, pidx % c, 0).astype(jnp.int32)
    counts = ok_b.sum(axis=1).astype(jnp.int32)       # (B,)
    ends = jnp.cumsum(counts)
    starts = ends - counts

    # group construction, all GATHERS (scatters serialize on TPU):
    # each block's pair run pads to a multiple of g with sentinel
    # chunks (feat row c, all-zero); groups stay block-major so
    # output revisiting still folds in-VMEM
    gi = -(-counts // g)                              # groups per block
    gends = jnp.cumsum(gi)
    gbase = gends - gi                                # (B,) first group
    gcap = pcap // g + b
    q = jnp.arange(gcap, dtype=jnp.int32)
    gblk = jnp.searchsorted(gends, q, side='right').astype(jnp.int32)
    gblk = jnp.minimum(gblk, b)                       # pad groups
    gblk_c = jnp.minimum(gblk, b - 1)
    r0 = (q - jnp.take(gbase, gblk_c)) * g            # group's 1st rank
    p0 = jnp.take(starts, gblk_c) + r0
    rr = r0[:, None] + jnp.arange(g, dtype=jnp.int32)[None]
    pp = p0[:, None] + jnp.arange(g, dtype=jnp.int32)[None]
    ok_s = ((gblk < b)[:, None] & (rr < jnp.take(counts, gblk_c)[:, None])
            & (pp < pcap))
    gchk = jnp.where(ok_s, jnp.take(pchk, jnp.minimum(pp, pcap - 1)),
                     c).reshape(-1)
    overflow_b = (ends > pcap) | (gends > gcap)

    # ray block table: rays on SUBLANES so features form matmul rows;
    # one spare block (index b) absorbs padding groups
    rays = jnp.concatenate(
        [o_p, d_p, cap_p[:, None],
         lv_p.astype(jnp.float32)[:, None]], axis=1)  # (n_pad, 8)
    rays = rays.reshape(b, block, 8)
    rays = jnp.concatenate(
        [rays, jnp.zeros((1, block, 8), rays.dtype)], axis=0)

    def feat_spec(j):
        return pl.BlockSpec((1, NFEAT, NSLAB * SLAB),
                            lambda i, gb, gc: (gc[i * g + j], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec((1, block, 8),
                         lambda i, gb, gc: (gb[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [feat_spec(j) for j in range(g)],
        out_specs=pl.BlockSpec((1, block, 2),
                               lambda i, gb, gc: (gb[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_pairs_kernel(g, prec),
        out_shape=jax.ShapeDtypeStruct((b + 1, block, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(gblk, gchk, rays, *([feat] * g))

    visited = counts > 0                              # else row is junk
    best_t = jnp.where(visited[:, None], out[:b, :, 0], jnp.inf)
    best_ord = out[:b, :, 1]
    best_t = best_t.reshape(-1)[:n]
    best_ord = best_ord.reshape(-1)[:n]
    hit = jnp.isfinite(best_t) & live_b
    ordi = jnp.where(hit, best_ord, 0.0).astype(jnp.int32)
    best_pay = jnp.where(hit, jnp.take(pays, ordi), -1.0)
    steps = jnp.repeat(counts, block)[:n]

    res = dict(hit=hit, t=jnp.where(hit, best_t, t_max),
               tri=best_pay.astype(jnp.int32),
               u=jnp.zeros((n,), jnp.float32),
               v=jnp.zeros((n,), jnp.float32),
               steps=steps.astype(jnp.int32))
    if not fallback:
        return res

    from toyrenderer_tpu.ops.bvh_pallas import traverse_auto
    need = jnp.repeat(overflow_b, block)[:n] & live_b
    fb = traverse_auto(bvh, origins, directions, t_max,
                       any_hit=any_hit,
                       live=need.astype(jnp.float32),
                       interpret=interpret)
    use = need
    return dict(hit=jnp.where(use, fb['hit'], res['hit']),
                t=jnp.where(use, fb['t'], res['t']),
                tri=jnp.where(use, fb['tri'], res['tri']),
                u=res['u'], v=res['v'],
                steps=jnp.where(use, fb['steps'], res['steps']))
