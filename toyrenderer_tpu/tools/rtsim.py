"""Worklist-traversal simulator: measures, on the REAL courtyard DDGI
probe workload, the cost model of a CHUNKED ray traversal that replaces
the per-node tree walk with a precomputed near-to-far chunk list.

Motivation (ROADMAP round-3 part-5): the packet kernel's wall is
per-VISIT overhead (~1 us of scalar sync + cond per tree node) — not
vector flops.  A "chunk" is a run of k consecutive leaf rows of the
frozen complete tree (morton/median order makes runs spatially tight),
so a traversal that intersects rays against CHUNK AABBs and then
Moller-Trumbore-tests whole chunks needs no stack, no per-node sync —
its cost is (#packet-chunk visits) x (dense MT of k*12 tris vs the
packet).  This tool computes, exactly, on CPU:

  * visits/packet for the worklist scheme (near-to-far with early-out)
    at several packet sizes and chunk sizes;
  * per-ray exact pair counts (the lower bound a ray-chunk PAIR scheme
    with sort-based binning would pay);
  * projected Mrays/s under a measured-cost model (MT vector cost from
    the existing kernel's leaf rate; per-visit overhead ~0.15 us since
    the worklist needs no per-node scalar round trip).

Run:  python -m toyrenderer_tpu.tools.rtsim [--gi-tris 30000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gi-tris', type=int,
                    default=int(os.environ.get('TR_GI_TRIS', '100000')))
    ap.add_argument('--phases', type=int, default=4)
    ap.add_argument('--packets', type=int, nargs='+',
                    default=[1024, 4096])
    ap.add_argument('--chunk-rows', type=int, nargs='+',
                    default=[4, 8, 16])
    ap.add_argument('--scene', default='courtyard')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from toyrenderer_tpu.ops import geometry as G
    from toyrenderer_tpu.ops.bvh import (LEAF_TRIS, build_rt_static,
                                         refit_bvh)
    from toyrenderer_tpu.ops.ddgi import (_cone_block, _cone_order,
                                          _fibonacci_sphere,
                                          volume_from_aabb)
    from toyrenderer_tpu.ops.geometry import (rt_lod_pairs,
                                              static_meshlet_pairs)
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.scene.scenebuild import _world_matrices_host

    root = os.path.join(os.path.dirname(__file__), '..', '..')
    path = os.path.join(root, 'resources', f'{args.scene}.glb')
    scene_host = load_scene(path)

    mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
    has_mask = len(mk_i) > 0
    os.environ['TR_GI_TRIS'] = str(args.gi_tris)
    g_pi, g_pm, lod = rt_lod_pairs(
        scene_host, 'not_mask' if has_mask else 'all',
        budget_tris=args.gi_tris)
    rts = build_rt_static(scene_host, g_pi, g_pm,
                          mask_pair_inst=mk_i, mask_pair_meshlet=mk_m)
    nw = _world_matrices_host(
        scene_host.node_parent, scene_host.node_translation,
        scene_host.node_rotation, scene_host.node_scale)
    inst_world = jnp.asarray(nw[np.asarray(scene_host.inst_node)])
    bvh = refit_bvh(rts, inst_world)
    n_leaf = int(bvh.leaf_rows.shape[0])
    print(f'[sim] GI LOD{lod}: {n_leaf} leaf rows '
          f'({n_leaf * LEAF_TRIS} tri slots), '
          f'{bvh.num_levels} levels', file=sys.stderr)

    # ---- probe-phase ray population (gdir order), frame-0 rotation ----
    vol = volume_from_aabb(scene_host.world_aabb[0],
                           scene_host.world_aabb[1])
    pos = np.asarray(vol.probe_positions())
    p_all = pos.shape[0]
    r = vol.rays_per_probe
    pb = -(-p_all // args.phases)
    pos = pos[:pb]                      # phase-0 block
    dirs = _fibonacci_sphere(r)
    # gdir layout: 32 cone dirs x 128 morton probes per block
    order = _cone_order(r)
    dirs = dirs[order]
    brick = 128
    pb_pad = -(-pb // brick) * brick
    pos = np.pad(pos, [(0, pb_pad - pb), (0, 0)])
    live = np.zeros(pb_pad, bool)
    live[:pb] = True
    origins = np.tile(pos, (r, 1))
    d_all = np.repeat(dirs, pb_pad, axis=0)
    live_all = np.tile(live, r)
    o_b = np.asarray(_cone_block(jnp.asarray(origins), r, pb_pad,
                                 brick, 32))
    d_b = np.asarray(_cone_block(jnp.asarray(d_all), r, pb_pad,
                                 brick, 32))
    lv_b = np.asarray(_cone_block(jnp.asarray(live_all), r, pb_pad,
                                  brick, 32))
    n = o_b.shape[0]
    t_max = float(vol.max_ray_distance)
    print(f'[sim] {pb} probes x {r} rays = {n} rays '
          f'(padded from {pb_pad * r})', file=sys.stderr)

    # ---- leaf-row boxes from the triangles directly ----
    lr = np.asarray(bvh.leaf_rows)                # (Ng, 120)
    g = lr.reshape(n_leaf, 10, LEAF_TRIS)
    v0 = g[:, 0:3].transpose(0, 2, 1)             # (Ng, 12, 3)
    e1 = g[:, 3:6].transpose(0, 2, 1)
    e2 = g[:, 6:9].transpose(0, 2, 1)
    pay = g[:, 9].transpose(0, 1)                 # (Ng, 12)
    ok_t = pay >= 0
    p1 = v0 + e1
    p2 = v0 + e2
    big = 1e30
    lo_t = np.where(ok_t[..., None], np.minimum(np.minimum(v0, p1), p2),
                    big)
    hi_t = np.where(ok_t[..., None], np.maximum(np.maximum(v0, p1), p2),
                    -big)
    leaf_lo = lo_t.min(1)                         # (Ng, 3)
    leaf_hi = hi_t.max(1)

    # ---- exact per-(ray, leaf-row) min-t via chunked MT on CPU jax ----
    t0 = time.time()
    o_j = jnp.asarray(o_b)
    d_j = jnp.asarray(d_b)

    @jax.jit
    def mt_rows(v0r, e1r, e2r, okr):
        # (B, 12, 3) rows vs all rays -> (N, B) min-t
        pv = jnp.cross(d_j[:, None, None, :], e2r[None])
        det = jnp.sum(e1r[None] * pv, -1)
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-7, jnp.inf, det)
        tv = o_j[:, None, None, :] - v0r[None]
        u = jnp.sum(tv * pv, -1) * inv
        qv = jnp.cross(tv, e1r[None])
        v = jnp.sum(d_j[:, None, None, :] * qv, -1) * inv
        t = jnp.sum(e2r[None] * qv, -1) * inv
        hit = ((u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-7)
               & okr[None] & (t < t_max))
        return jnp.where(hit, t, jnp.inf).min(-1)  # (N, B)

    B = 16
    n_blk = -(-n_leaf // B)
    row_t = np.empty((n, n_blk * B), np.float32)
    for b in range(n_blk):
        s = slice(b * B, (b + 1) * B)
        v0b = jnp.asarray(np.pad(v0[s], [(0, b * B + B - min(n_leaf,
                          b * B + B)), (0, 0), (0, 0)]))
        e1b = jnp.asarray(np.pad(e1[s], [(0, v0b.shape[0] - v0[s].shape[0]), (0, 0), (0, 0)]))
        e2b = jnp.asarray(np.pad(e2[s], [(0, v0b.shape[0] - v0[s].shape[0]), (0, 0), (0, 0)]))
        okb = jnp.asarray(np.pad(ok_t[s], [(0, v0b.shape[0] - v0[s].shape[0]), (0, 0)]))
        row_t[:, b * B:(b + 1) * B] = np.asarray(
            mt_rows(v0b, e1b, e2b, okb))
    row_t = row_t[:, :n_leaf]
    row_t[~lv_b] = np.inf
    print(f'[sim] exact row hits in {time.time() - t0:.1f}s',
          file=sys.stderr)

    true_t = row_t.min(1)                        # (N,) exact closest hit
    hit_frac = float(np.isfinite(true_t[lv_b]).mean())
    print(f'[sim] hit fraction {hit_frac:.3f} (sky-miss '
          f'{1 - hit_frac:.3f})', file=sys.stderr)

    eps = 1e-12
    sd = np.where(np.abs(d_b) < eps, np.where(d_b < 0, -eps, eps), d_b)
    inv = (1.0 / sd).astype(np.float32)

    for rows_pc in args.chunk_rows:
        C = -(-n_leaf // rows_pc)
        clo = np.full((C, 3), big, np.float32)
        chi = np.full((C, 3), -big, np.float32)
        for k in range(rows_pc):
            idx = np.arange(C) * rows_pc + k
            m = idx < n_leaf
            clo[m] = np.minimum(clo[m], leaf_lo[idx[m]])
            chi[m] = np.maximum(chi[m], leaf_hi[idx[m]])
        # ray-vs-chunk tmin (N, C)
        t0s = (clo[None] - o_b[:, None]) * inv[:, None]
        t1s = (chi[None] - o_b[:, None]) * inv[:, None]
        tn = np.maximum(np.minimum(t0s, t1s).max(-1), 0.0)
        tf = np.maximum(t0s, t1s).min(-1)
        okb = (tf >= tn) & (tn <= t_max) & lv_b[:, None]
        tmins = np.where(okb, tn, np.inf).astype(np.float32)

        # exact chunk min-t per ray
        ct = row_t[:, :C * rows_pc].reshape(
            n, C, -1) if C * rows_pc <= row_t.shape[1] else None
        if ct is None:
            pad = np.full((n, C * rows_pc - row_t.shape[1]), np.inf,
                          np.float32)
            ct = np.concatenate([row_t, pad], 1).reshape(n, C, rows_pc)
        chunk_t = ct.min(-1)                      # (N, C)

        # per-ray ideal pair count: chunks with tmin < final best t
        bt = np.where(np.isfinite(true_t), true_t, t_max)
        pairs = (tmins <= bt[:, None] + 1e-6).sum(1)
        print(f'[chunk {rows_pc} rows = {rows_pc * LEAF_TRIS} tris] '
              f'C={C}  pairs/ray mean {pairs[lv_b].mean():.2f} '
              f'p95 {np.percentile(pairs[lv_b], 95):.0f} '
              f'max {pairs.max()}')

        for packet in args.packets:
            npk = n // packet
            visits = np.zeros(npk, np.int32)
            for p in range(npk):
                s = slice(p * packet, (p + 1) * packet)
                tm = tmins[s]                     # (packet, C)
                et = chunk_t[s]
                order_c = np.argsort(tm.min(0))
                best = np.full(packet, t_max, np.float32)
                vis = 0
                unvis = np.ones(C, bool)
                for e in order_c:
                    # packet-level early-out: no ray's remaining work
                    if not (np.where(unvis[None, :], tm, np.inf).min(1)
                            < best).any():
                        break
                    if not np.isfinite(tm[:, e]).any():
                        break
                    vis += 1
                    unvis[e] = False
                    upd = et[:, e] < best
                    best[upd] = et[upd, e]
                visits[p] = vis
            v_tot = int(visits.sum())
            # cost model: MT of rows_pc*12 tris vs packet rays at the
            # measured leaf rate (~0.18 us per 12-tri row per 1024
            # rays), + 0.2 us fixed per chunk visit (DMA-pipelined
            # fetch + amortized early-out sync)
            mt_us = 0.18 * rows_pc * (packet / 1024)
            est_ms = v_tot * (mt_us + 0.2) / 1e3
            n_live = int(lv_b.sum())
            print(f'    packet {packet}: visits/packet mean '
                  f'{visits.mean():.1f} p95 '
                  f'{np.percentile(visits, 95):.0f}  total {v_tot}  '
                  f'est {est_ms:.2f} ms -> '
                  f'{n_live / est_ms / 1e3:.1f} Mrays/s')


if __name__ == '__main__':
    main()
