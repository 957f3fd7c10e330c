"""Content-scaled raster capacities (bounded-amplification sizing).

The reference sizes its meshlet-amplification buffers from scene totals at
load time (BasePassRenderers.cpp:52-104: MeshletAmplificationData sized
from the scene's instance/meshlet counts); the TPU build's equivalents are
the per-tile K list, the big-triangle list and the global pair budget.
Round 4 proved constants don't scale: plaza (3.9M tris) silently dropped
13k triangles because far courtyards concentrate >4k LOD-floor triangles
in single 16x128 tiles while the courtyard-sized K=2048 cap held.

`measure_raster_capacities` runs the REAL phase-1 cull+LOD+bin subgraph
once on the CPU backend (one ~20 s host-side jit, no TPU compile) and
returns capacities with headroom, rounded for the kernel's 128-slot
one-hot blocks.  The capacities are static per (scene, camera) topology —
exactly the quantities the reference derives host-side at PostSceneLoad.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def measure_raster_capacities(scene_host, settings, view_matrices,
                              pair_inst, pair_meshlet,
                              margin: float = 1.3,
                              cache_path: str | None = None) -> dict:
    """Suggested dict(max_tris_per_tile, max_big_tris) for this content.

    Runs instance cull + LOD select + meshlet cull + triangle setup +
    span-classed pair binning (phase 1, no HZB — conservative: occlusion
    only removes pairs) on the CPU backend and sizes the caps at
    `margin` x the measured maxima, rounded up to 128 (the one-hot fetch
    block) with the defaults as floors only when measurement fails.
    """
    from toyrenderer_tpu.engine.frame import default_frame_inputs
    from toyrenderer_tpu.ops import culling as cull_mod
    from toyrenderer_tpu.ops import geometry as geo_mod
    from toyrenderer_tpu.ops import raster as raster_mod

    cfg = settings.raster_config()
    w, h = settings.width, settings.height

    # sidecar cache: the probe is one ~10 s CPU jit on a good day but
    # XLA:CPU compile time is high-variance (a 400 s outlier was
    # measured inside a budgeted bench); capacities are static per
    # (content, view, resolution), so measure once per content change
    key = None
    if cache_path is not None:
        key = dict(v=2, n=int(len(pair_inst)), w=w, h=h,
                   lod=float(settings.lod_error_px),
                   cam=[round(float(x), 4) for x in np.asarray(
                       view_matrices['view_proj']).reshape(-1)[:4]],
                   margin=margin)
        try:
            with open(cache_path) as f:
                saved = json.load(f)
            if saved.get('key') == key:
                return saved['caps']
        except Exception:       # noqa: BLE001 — missing/stale: re-measure
            pass

    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        scene = scene_host.to_device()
        fi = default_frame_inputs(scene_host, view_matrices)
        pi = jnp.asarray(np.asarray(pair_inst))
        pm = jnp.asarray(np.asarray(pair_meshlet))

        @jax.jit
        def probe(scene, fi, pi, pm):
            world = geo_mod.node_world_matrices(
                scene, fi['node_translation'], fi['node_rotation'],
                fi['node_scale'])
            iw, _ = geo_mod.instance_transforms(scene, world)
            cull = cull_mod.cull_instances(
                scene, iw, fi['cull_frustum_planes'], fi['cull_cam_pos'],
                fi['proj_scale_px'], w, h, hzb=None,
                error_threshold_px=settings.lod_error_px,
                forced_lod=settings.forced_lod)
            pi1, pm1, pv1, _ = cull_mod.build_pairs(
                scene, cull['visible'], cull['lod'], pi.shape[0])
            pv1 = cull_mod.cull_meshlets(
                scene, pi1, pm1, pv1, iw, fi['cull_frustum_planes'],
                fi['cull_cam_pos'], w, h,
                cone_cull=settings.enable_cone_culling)
            g = geo_mod.meshlet_clip_triangles(
                scene, iw, fi['view_proj'], pi1, pm1, pv1)
            setup = raster_mod.setup_triangles(g, cfg)
            # unclamped per-tile counts + big-class count (the list is
            # clamped at cfg.max_big_tris — add its own drop counter back
            # so the TRUE requirement is measured)
            _, _, counts, big_list, drop = raster_mod._sort_pairs(setup,
                                                                  cfg)
            n_big = (jnp.sum((big_list >= 0).astype(jnp.int32))
                     + drop.get('drop_big', 0))
            total = jnp.sum(jnp.minimum(counts, cfg.max_tris_per_tile))
            return jnp.max(counts), n_big, total

        max_k, n_big, total = probe(scene, fi, pi, pm)
        max_k = int(np.asarray(max_k))
        n_big = int(np.asarray(n_big))
        total = int(np.asarray(total))

    def _round128(v, floor):
        return max(-(-int(v * margin) // 128) * 128, floor)

    caps = dict(
        max_tris_per_tile=_round128(max_k, 512),
        max_big_tris=_round128(n_big, 512),
        # global chunk-grid budget: without it the grid sizes to the
        # full triangle-stream length and ~60% of grid steps are
        # padding replays (~1.4 us each — measured ~9 ms of the
        # courtyard fill).  2x headroom over the no-occlusion phase-1
        # total; the frame reports drop_pair_budget if ever exceeded.
        pair_capacity=_round128(total * 1.55, 4096),   # * margin(1.3)
        measured_pairs=total,
        measured_max_tile=max_k, measured_big=n_big)
    if cache_path is not None:
        try:
            with open(cache_path, 'w') as f:
                json.dump(dict(key=key, caps=caps), f)
        except Exception:       # noqa: BLE001 — read-only fs: skip
            pass
    return caps
