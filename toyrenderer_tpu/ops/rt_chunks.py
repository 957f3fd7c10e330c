"""Chunked block-pair traversal: ray tracing as dense batched MT.

The packet kernels (ops/bvh_pallas.py) hit a per-VISIT wall (~1 us of
scalar sync + cond per tree node) and, on divergent rays, lockstep
waste: a DDGI probe packet walks the UNION of its rays' paths.
Measured on the real courtyard probe workload (tools/rtsim.py +
on-device A/Bs): the per-RAY exact work is tiny — mean 2.4 chunk-AABB
overlaps per ray on the LOD4 GI tree (83% of probe rays are sky misses
that clip almost nothing) — while 1024-ray packets pay 77+ chunk
visits each.

This module drops the tree walk entirely — no stack, no scalar state,
pure XLA:

1. CHUNKS: the frozen tree's leaf rows, taken CHUNK_ROWS consecutive
   rows at a time (96 triangles) — morton/median order makes runs
   spatially tight.  One (C, 960) f32 table holds every chunk's
   triangles component-major; one (C, 6) table holds chunk AABBs.
   C is small (~hundreds): gathers from TINY tables are cheap on TPU
   (the atlas-sampling lesson), so chunk rows fetch with plain takes.
2. BOX PHASE (VPU): every ray slab-tests every chunk AABB — (N, C)
   fused elementwise work — and the overlap matrix reduces to RAY
   BLOCKS of `block` consecutive rays: (B, C), B = N/block.
3. PAIR EXPANSION at BLOCK rate: `jnp.nonzero` compacts (B, C) —
   thousands of entries, not N x C — into a capacity-bounded
   (block, chunk) pair list (the raster's bounded-amplification
   contract applied to RT).
4. DENSE MT: each pair tests ALL `block` rays against ALL 96 chunk
   triangles in fused elementwise XLA — (P, block, 96) VPU work at
   ~100% density, zero per-visit control flow.
5. FOLD: per-pair per-ray closest hits segment-min back to rays
   (pairs are block-major sorted — no scatter).
6. OVERFLOW: blocks whose pairs spill past the capacity re-run
   live-masked through the packet kernel (~never on real workloads),
   so the result is EXACT at any capacity.

Design history (all measured on the courtyard probe phase, v5e):
top-k + one-hot MXU fetch at ray rate paid k x (N, C) one-hot
materializations per round and round-level lockstep (35-180 ms);
pair-exact `nonzero` over the (N x C) ray-rate matrix paid a ~19M
element compaction (180 ms).  Block-rate compaction + dense MT keeps
every moving part at block or pair rate.  The residual lockstep waste
(a ray pays for its 127 block-mates' chunks) is bounded by block
spatial locality — probe blocks are 128 morton-adjacent probes sharing
one cone direction.

Works identically on CPU/TPU (fully testable without hardware), shards
over ray axes with replicated tables, and has no VMEM capacity cliff.
Reference parity: DXR RayQuery consumers
source/shaders/giprobetrace.hlsl:23-148 (closest hit) and
shadowmask.hlsl:65-145 (any hit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from toyrenderer_tpu.ops.bvh import LEAF_TRIS

CHUNK_ROWS = 8                  # leaf rows per chunk
CHUNK_TRIS = CHUNK_ROWS * LEAF_TRIS


def chunk_table(bvh):
    """(boxes (C, 6) f32, data (C, 10 * CHUNK_TRIS) f32) chunk tables
    from any tree flavor carrying `leaf_rows` (complete or SAH — only
    the LEAF ORDER matters).  Runs in-jit (cheap reductions); callers
    cache it alongside the moved-gated refit.

    data rows are component-major over the chunk's triangles:
    [v0x*96 | v0y*96 | ... | e2z*96 | pay*96]; padding slots carry
    payload -1 (never hit).
    """
    leaf = bvh.leaf_rows                              # (Ng, 120)
    ng = leaf.shape[0]
    c = -(-ng // CHUNK_ROWS)
    pad = c * CHUNK_ROWS - ng
    if pad:
        pad_row = jnp.zeros((pad, leaf.shape[1]), leaf.dtype)
        # payload component (col block 9) = -1 marks dead slots
        pad_row = pad_row.at[:, 9 * LEAF_TRIS:10 * LEAF_TRIS].set(-1.0)
        leaf = jnp.concatenate([leaf, pad_row], axis=0)
    g = leaf[:, :10 * LEAF_TRIS].reshape(c, CHUNK_ROWS, 10, LEAF_TRIS)
    data = g.transpose(0, 2, 1, 3).reshape(c, 10 * CHUNK_TRIS)

    v0 = g[:, :, 0:3].transpose(0, 1, 3, 2)           # (C, 8, 12, 3)
    e1 = g[:, :, 3:6].transpose(0, 1, 3, 2)
    e2 = g[:, :, 6:9].transpose(0, 1, 3, 2)
    ok = (g[:, :, 9] >= 0.0)[..., None]               # (C, 8, 12, 1)
    p1 = v0 + e1
    p2 = v0 + e2
    big = jnp.float32(3e37)
    lo = jnp.where(ok, jnp.minimum(jnp.minimum(v0, p1), p2), big)
    hi = jnp.where(ok, jnp.maximum(jnp.maximum(v0, p1), p2), -big)
    boxes = jnp.concatenate([lo.reshape(c, -1, 3).min(1),
                             hi.reshape(c, -1, 3).max(1)], axis=-1)
    return boxes, data


def traverse_chunks(bvh, origins, directions, t_max,
                    any_hit: bool = False, live=None, block: int = 128,
                    pair_factor: int = 64, tables=None,
                    fallback: bool = True, interpret: bool = False):
    """Block-pair dense traversal; same contract as bvh.traverse /
    traverse_pallas: dict(hit, t, tri, u, v, steps) — u/v zeros
    (no frame consumer reads RT barycentrics), steps = the ray's
    block's chunk-pair count.

    tables: optional precomputed chunk_table(bvh) (cache with the
    refit).  block: rays per compaction block — callers get the best
    locality when consecutive rays are coherent (DDGI dir-major order:
    128 grid-adjacent probes share each direction).  pair_factor:
    pair capacity as a multiple of the BLOCK count; overflowed blocks
    complete through the packet kernel when `fallback` (exact at any
    capacity).
    """
    n = origins.shape[0]
    boxes, data = chunk_table(bvh) if tables is None else tables
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

    # box phase: (N, C) overlap, reduced to (B, C) block rate; the
    # (N, C, 3) intermediates fuse into the elementwise chain
    t0 = (boxes[None, :, 0:3] - o_p[:, None]) * inv[:, None]
    t1 = (boxes[None, :, 3:6] - o_p[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
    tf = jnp.maximum(t0, t1).min(-1)
    ok = (tf >= tn) & (tn <= cap_p[:, None]) & lv_p[:, None]
    ok_b = ok.reshape(b, block, c).any(axis=1)        # (B, C)

    # pair expansion at block rate (block-major order)
    pcap = max(-(-pair_factor * b // 1024) * 1024, 1024)
    (pidx,) = jnp.nonzero(ok_b.reshape(-1), size=pcap,
                          fill_value=b * c)
    valid_p = pidx < b * c
    pidx_s = jnp.where(valid_p, pidx, 0)
    pblk = pidx_s // c                                # (P,)
    pchk = pidx_s % c

    counts = ok_b.sum(axis=1)                         # (B,)
    ends = jnp.cumsum(counts)
    overflow_b = ends > pcap                          # block spilled

    # dense MT: every pair tests all `block` rays x all 96 tris
    rows = jnp.take(data, pchk, axis=0)               # (P, 960)
    m = rows.reshape(pcap, 10, 1, CHUNK_TRIS)
    v0x, v0y, v0z = m[:, 0], m[:, 1], m[:, 2]
    e1x, e1y, e1z = m[:, 3], m[:, 4], m[:, 5]
    e2x, e2y, e2z = m[:, 6], m[:, 7], m[:, 8]
    pay = m[:, 9]                                     # (P, 1, 96)

    ob = jnp.take(o_p.reshape(b, block, 3), pblk, axis=0)
    db = jnp.take(d_p.reshape(b, block, 3), pblk, axis=0)
    cb = jnp.take(cap_p.reshape(b, block), pblk, axis=0)[..., None]
    ox, oy, oz = (ob[..., 0:1], ob[..., 1:2], ob[..., 2:3])
    dx, dy, dz = (db[..., 0:1], db[..., 1:2], db[..., 2:3])

    px = dy * e2z - dz * e2y                          # (P, block, 96)
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
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    okt = ((inv_det != 0.0) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (tt > 1e-7) & (pay >= 0.0)
           & (tt < cb) & valid_p[:, None, None])
    tt = jnp.where(okt, tt, jnp.inf)
    j = jnp.argmin(tt, axis=-1)                       # (P, block)
    t_pair = jnp.take_along_axis(tt, j[..., None], -1)[..., 0]
    p_pair = jnp.take_along_axis(
        jnp.broadcast_to(pay, tt.shape), j[..., None], -1)[..., 0]

    # fold pairs -> rays (pair list is block-major sorted)
    seg = jnp.where(valid_p, pblk, b)
    best_t = jax.ops.segment_min(t_pair, seg, num_segments=b + 1,
                                 indices_are_sorted=True)[:b]
    # winning payload: re-select where the pair's t equals the fold
    bt_of_pair = jnp.take(
        jnp.concatenate([best_t, jnp.full((1, block), jnp.inf)]),
        seg, axis=0)
    p_sel = jnp.where((t_pair <= bt_of_pair) & jnp.isfinite(t_pair),
                      p_pair, jnp.inf)
    best_pay = jax.ops.segment_min(p_sel, seg, num_segments=b + 1,
                                   indices_are_sorted=True)[:b]

    best_t = best_t.reshape(-1)[:n]
    best_pay = best_pay.reshape(-1)[:n]
    # dense MT tests every ray of a live block — mask dead rays' hits
    hit = jnp.isfinite(best_t) & live_b
    best_pay = jnp.where(hit, best_pay, -1.0)
    steps = jnp.repeat(counts, block)[:n]

    res = dict(hit=hit, t=jnp.where(hit, best_t, t_max),
               tri=best_pay.astype(jnp.int32),
               u=jnp.zeros((n,), jnp.float32),
               v=jnp.zeros((n,), jnp.float32),
               steps=steps.astype(jnp.int32))
    if not fallback:
        return res

    # exactness at any capacity: rays of overflowed blocks re-run
    # through the packet/lockstep dispatcher, live-masked
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
