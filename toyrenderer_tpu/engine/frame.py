"""The frame pipeline: one jitted function per (settings, scene topology).

This replaces the reference's RenderGraph + per-pass command lists
(source/RenderGraph.cpp, source/Scene.cpp:488-521): XLA schedules the pass
DAG, fuses elementwise stages and reuses buffers; pass toggles are STATIC
settings so disabled passes never enter the traced graph (the analogue of
`IRenderer::Setup` returning false).  All cross-frame state (previous
transforms, exposure, TAA history, HZB) lives in an explicit `carry` pytree
— the analogue of every `m_FrameCounter % 2` double buffer in the reference.

Pass order parity (Scene.cpp:495-513): Clear (implicit) -> UpdateInstance
Consts -> [GI] -> GBuffer (cull+raster+resolve) -> [AO] -> [ShadowMask] ->
DeferredLighting (+Sky) -> [Bloom] -> [AdaptLuminance] -> [TAA] ->
PostProcess.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from toyrenderer_tpu.ops import bloom as bloom_mod
from toyrenderer_tpu.ops import bvh as bvh_mod
from toyrenderer_tpu.ops import culling as cull_mod
from toyrenderer_tpu.ops import ddgi as ddgi_mod
from toyrenderer_tpu.ops import denoise as denoise_mod
from toyrenderer_tpu.ops import restir as restir_mod
from toyrenderer_tpu.ops import shadows as shadows_mod
from toyrenderer_tpu.ops import sky as sky_mod
from toyrenderer_tpu.ops import exposure as exposure_mod
from toyrenderer_tpu.ops import geometry as geo_mod
from toyrenderer_tpu.ops import hzb as hzb_mod
from toyrenderer_tpu.ops import raster as raster_mod
from toyrenderer_tpu.ops import taa as taa_mod
from toyrenderer_tpu.ops.gbuffer import pack_resolve_records, resolve_gbuffer
from toyrenderer_tpu.ops.lighting import deferred_lighting, debug_view
from toyrenderer_tpu.ops.postprocess import compose_final
from toyrenderer_tpu.ops.raster import RasterConfig


@dataclass(frozen=True)
class RenderSettings:
    """Static (trace-time) render configuration.

    The runtime-tweakable equivalents in the reference are imgui-mutated
    Scene booleans read by each renderer's Setup (Scene.h:106-135); here a
    change triggers a (cached) retrace.
    """
    width: int = 1920
    height: int = 1080
    # pass toggles
    enable_shadows: bool = False          # denoised sun shadows
    shadow_technique: str = 'rt'          # 'rt' (BVH rays, the
    #   reference's shipped technique: inline-RT + denoise is its ONLY
    #   sun-shadow path, shadowmask.hlsl:65-145) | 'map' (raster sun
    #   depth map — this framework's cheaper alternative; kept because
    #   the 2048^2 raster is camera-independent and cacheable).  Half-
    #   res rays (shadow_ray_scale) price rt at ~16 ms/frame @1080p.
    shadow_map_resolution: int = 1024
    shadow_max_steps: int = 96            # BVH traversal budget per ray
    shadow_ray_scale: int = 2             # RT shadow rays at
    #   1/scale res + depth-aware denoise upsample: the reference traces
    #   full-res rays because RT cores make 2M rays ~free
    #   (shadowmask.hlsl:65-145) and leans on NRD SIGMA to clean 1 spp;
    #   on TPU the same denoise investment buys a 4x ray cut instead
    #   (measured ~43 ms of in-frame sun rays at 1080p full res).
    #   1 = full-res reference shape.
    shadow_checkerboard: bool = True      # trace only the alternating
    #   checkerboard half of the (already half-res) ray grid each frame;
    #   untraced cells fill from horizontal traced neighbours and the
    #   temporal accumulator recovers full sampling on static content
    #   (NRD-style; the reference's SIGMA denoiser absorbs 1-spp noise
    #   the same way).  Another ~2x ray cut on the ~16 ms rt bucket.
    enable_ao: bool = False               # GTAO
    ao_radius: float = 1.5                # world-space AO radius
    ao_half_res: bool = True              # GTAO horizons at half res +
    #   depth-aware full-res blur (4x cheaper; XeGTAO-class quality
    #   after TAA)
    enable_gi: bool = False               # DDGI probe GI
    gi_max_steps: int = 64                # probe-ray traversal budget
    gi_convergence_skip: bool = True      # skip the whole GI update once
    #   probe variability settles (GIRenderer.cpp:466-470 parity:
    #   `if (bIsConverged) return;`); shading keeps sampling the frozen
    #   probe field.  Sun changes reset the counter (the reference
    #   leaves converged probes stale there — its own TODO).
    gi_variability_threshold: float = 0.002   # STD-DEV of the last-16
    #   raw variability samples (m_VariabilityStdDevThreshold,
    #   GIRenderer.cpp:211) — converged = stopped improving, not small
    gi_min_var_samples: int = 16          # kMinimumVariabilitySamples
    gi_update_phases: int = 1             # probes update in P/N blocks
    gi_update_mode: str = 'interval'      # 'interval' = trace the FULL
    #   volume every Nth frame (N = gi_update_phases); 'phases' = 1/N of
    #   the probes every frame.  Same rays per cycle either way, but a
    #   probe-ray dispatch has ~10+ ms of fixed cost on TPU (divergent
    #   packets visit most of the tree no matter how few rays ride
    #   along: 5.7k rays measured ~16 ms = 0.37 Mrays/s effective, round
    #   4), so batching the cycle into ONE dispatch amortizes that fixed
    #   cost N-fold.  The reference updates the whole volume per frame
    #   because dispatch cost is ~free on RT cores (GIRenderer.cpp
    #   450-577); 'interval' is the TPU-shaped version of the same
    #   budget.
    gi_sample_scale: int = 2              # probe-sampling downscale when
    #                                       gi_half_res (2 = half res)
    peel_merge_frac: float = 0.0          # masked-peel compact merge:
    #   fraction of screen 2x2 quads budgeted for masked coverage; ALL
    #   peel layers resolve + texture at compact rate in one pass and
    #   only the nearest alpha-passing fragment expands back (one
    #   full-res gather).  Overflow quads drop their fragments —
    #   bounded amplification.  0 (default) = dense full-screen resolve
    #   per layer (exact reference semantics at any coverage)
    pack_gbuffer: bool = False            # True = the packed 4xu32
    #   GBuffer (reference parity) is the ONLY inter-pass medium;
    #   False (default) also emits float shading planes so the fused
    #   jit skips the pack/unpack round trip (~9.6 ms at 1080p)
    cache_sun_map: bool = True            # sun map re-renders only when
    #   the sun or an instance transform changes (it is camera-
    #   independent); the reference re-rasterizes every frame
    gi_vis_scale: int = 2                 # EXTRA downscale of the per-
    #   corner Chebyshev visibility factor inside the probe sampler (the
    #   8 distance gathers are the measured sampling whale); relative to
    #   the sampling res, 1 = off.  Bounded by tests/test_quality.py
    gi_half_res: bool = True              # sample probe irradiance at
    #   half res + expand (16 gathers/pixel otherwise)
    gi_sun_technique: str = 'auto'        # probe-hit direct-sun
    #   visibility: 'map' = one sun-shadow-map tap (no second traversal),
    #   'rt' = any-hit shadow ray (giprobetrace.hlsl parity),
    #   'auto' = map when the frame's shadow technique is the map
    show_gi_probes: bool = False          # probe visualization overlay
    enable_transparency: bool = False     # forward blend (reference: stub)
    oit_layers: int = 1                   # depth-peeled OIT layers for
    #   the blend set (1 = nearest-layer only)
    enable_alpha_test: bool = True        # alpha-masked cutout set
    alpha_layers: int = 2                 # depth-peel layers for the
    #   masked set: the nearest PASSING cutout fragment wins, so stacked
    #   foliage shows through front-layer holes (basepass.hlsl
    #   ALPHA_MASK_MODE discard semantics, done the TPU way)
    enable_restir: bool = False           # ReSTIR DI (off: reference parity)
    restir_candidates: int = 8
    restir_spatial_taps: int = 4          # RTXDI spatial-resampling taps
    restir_spatial_radius: float = 16.0   # px
    restir_max_lights: int = 256
    enable_bloom: bool = False
    enable_auto_exposure: bool = False
    enable_taa: bool = False
    enable_textures: bool = True          # material texture sampling
    texture_quad_taps: bool = True        # one atlas tap per 2x2 quad at
    #   +1 mip (4x fewer latency-bound gathers); False = exact per-pixel
    texture_aniso: int = 1                # software anisotropic taps along
    #   the major UV-gradient axis (reference: MaxAnisotropy sampler);
    #   > 1 uses the per-pixel sampler (disables quad_taps)
    enable_culling: bool = False          # 2-phase GPU-driven culling
    enable_cone_culling: bool = True
    lod_error_px: float = 2.0             # screen-error LOD threshold
    #  (grid-cluster LOD errors are conservative upper bounds; ~2px with
    #   TAA matches the reference's quadric-simplify quality visually)
    forced_lod: int = -1                  # Scene.h:128-132 debug parity
    late_capacity_frac: float = 0.25      # late-phase pair budget
    debug_mode: int = 0                   # lighting.DEBUG_*
    # raster tuning
    max_tris_per_tile: int = 2048  # K: per-tile list capacity.  Honest
    #   LODs (round 4) put up to ~2.1k real triangles in the hottest
    #   mid-distance floor tiles of the courtyard at 1080p; at 512 the
    #   sorted tail dropped and whole late-id slabs vanished
    #   (meshlet-shaped raster holes).  Runtime cost tracks REAL counts
    #   (count-bounded group loop + count-blocked one-hot fetch), so a
    #   bigger cap costs VMEM scratch (K x 48 f32 = 384 KiB), not time
    #   on cool tiles.
    raster_chunk: int = 32     # pair records per fill grid step.
    #   With the count-bounded group loop (raster_rows fori), VPU cost
    #   tracks real pairs at any chunk size; what remains is the
    #   XLA-side comb gather + stream DMA, which pad per-tile to the
    #   chunk.  Measured in the real culled courtyard frame at 1080p
    #   (v5e, count-bounded kernel): 32 -> 192.8 ms deferred,
    #   64 -> 202.8, 128 -> 210.4, 256 -> 234.5
    max_big_tris: int = 2048   # near-camera triangles span > the 4x2
    #   slot grid and route to the big list; the honest-LOD courtyard
    #   view produces ~1.6k of them (at 256 the overflow dropped ~1.3k
    #   CLOSE-UP triangles).  Per-tile cost is bighit-gated and
    #   count-blocked.
    tile_batch: int = 32
    tile_h: int = 16                      # fill-tile height (8 = native
    #   VPU vreg rows: half the per-pair edge-eval cost, ~40% more pairs)
    tile_w: int = 128                     # fill-tile width (lane multiple).
    #   (8, 256) keeps the 2048-px tile area of (16, 128) — same binned
    #   pair count — while HALVING the resolve epilogue's one-hot matmul
    #   issues (one per row per 128-slot block); pair bin_slots_y=8,
    #   bin_slots_x=1 preserves the 64x256-px slot-grid footprint
    bin_slots_y: int = 8                  # static per-triangle slot grid
    bin_slots_x: int = 2
    #   8x2 tiles = 128x256 px: honest LODs put ~1.6k near-camera
    #   triangles above the old 4x2 grid and the brute-force big path is
    #   O(bighit_tiles x B) — measured 57 ms/frame at B=1579.  At 8x2
    #   only ~145 genuinely screen-dominant tris remain big; the span-
    #   classed expansion keeps the sort small (only the 'rest' class
    #   pays the full 16-slot grid).
    bin_split: bool = True                # span-classed slot expansion
    #   (1x1-span tris bin with 1 slot, 2x1 with 2 — the global bin
    #   sort shrinks ~3x; see RasterConfig.bin_split)
    pair_capacity: int | None = None      # global (tile, tri) pair budget
    #   for the streamed fill (None = triangle count); bounds the chunk
    #   grid and the scalar-prefetch SMEM footprint
    use_bruteforce_raster: bool = False   # tiny scenes / tests
    use_pallas_fill: bool | None = None   # None = auto (TPU yes, CPU no)
    # lighting / post
    manual_exposure: float = 1.0
    sky_model: str = 'hosek'              # 'hosek' | 'preetham'
    sky_turbidity: float = 2.5
    ambient_factor: float = 0.03
    bloom_mips: int = 6
    bloom_strength: float = 0.04

    def raster_config(self) -> RasterConfig:
        return RasterConfig(
            width=self.width, height=self.height,
            max_tris_per_tile=self.max_tris_per_tile,
            chunk=self.raster_chunk, max_big_tris=self.max_big_tris,
            tile_batch=self.tile_batch, tile_h=self.tile_h,
            tile_w=self.tile_w, bin_slots_y=self.bin_slots_y,
            bin_slots_x=self.bin_slots_x, bin_split=self.bin_split,
            pair_capacity=self.pair_capacity)


# The carry is a plain dict pytree so later milestones can add entries
# (HZB, TAA history, exposure, DDGI probes) without type churn.
FrameCarry = dict


def init_carry(scene, settings: RenderSettings, ddgi_volume=None,
               rt_static=None, rt_static_gi=None, pair_inst=None,
               pair_meshlet=None, rt_pair_inst=None, rt_pair_meshlet=None,
               gi_pair_inst=None, gi_pair_meshlet=None,
               mask_pair_inst=None, mask_pair_meshlet=None) -> FrameCarry:
    """Initial cross-frame state (device arrays).

    Passing the frame's rt_static / rt_static_gi (+ the same pair
    streams render_frame will get) enables the REFIT CACHES: zero-filled
    pytrees matching the refit outputs exactly, so the frame re-refits
    trees and rebuilds GI shade records only when an instance transform
    changes (frame 0 always builds).  Without them the frame refits
    every frame (still correct).
    """
    n_inst = scene.inst_node.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                           (n_inst, 4, 4))
    carry = dict(
        prev_inst_world=eye,
        prev_depth=jnp.zeros((settings.height, settings.width), jnp.float32),
        exposure=jnp.asarray(settings.manual_exposure, jnp.float32),
        frame_index=jnp.asarray(0, jnp.int32),
    )
    if settings.enable_taa:
        carry['taa_history'] = jnp.zeros(
            (settings.height, settings.width, 3), jnp.float32)
        carry['taa_valid'] = jnp.asarray(0.0, jnp.float32)
    if settings.enable_culling:
        from toyrenderer_tpu.ops.hzb import init_hzb
        carry['hzb'] = init_hzb(settings.width, settings.height)
    if settings.enable_shadows:
        carry['shadow_history'] = jnp.ones(
            (settings.height, settings.width), jnp.float32)
        carry['shadow_valid'] = jnp.asarray(0.0, jnp.float32)
    uses_sun_map = (
        (settings.enable_shadows and settings.shadow_technique == 'map')
        or (settings.enable_gi and settings.gi_sun_technique in
            ('map', 'auto')
            and not (settings.enable_shadows
                     and settings.shadow_technique == 'rt')))
    if settings.cache_sun_map and uses_sun_map:
        s = settings.shadow_map_resolution
        carry['sun_map_depth'] = jnp.zeros((s, s), jnp.float32)
        carry['sun_map_dropped'] = jnp.asarray(0, jnp.int32)
        carry['prev_sun_view_proj'] = jnp.zeros((4, 4), jnp.float32)
    if settings.enable_gi:
        from toyrenderer_tpu.ops.ddgi import init_probes
        assert ddgi_volume is not None, "enable_gi requires a ddgi_volume"
        carry.update(init_probes(ddgi_volume))
    if settings.enable_restir:
        hw = (settings.height, settings.width)
        carry['restir_reservoir'] = dict(
            li=jnp.zeros(hw, jnp.int32), r1=jnp.zeros(hw),
            r2=jnp.zeros(hw), w=jnp.zeros(hw), m=jnp.zeros(hw))

    # refit caches (see docstring)
    needs_rays = (settings.enable_shadows
                  and settings.shadow_technique == 'rt')
    gi_own_tree = settings.enable_gi and rt_static_gi is not None
    needs_rt = (needs_rays or settings.enable_restir
                or (settings.enable_gi and not gi_own_tree))
    if ((needs_rt and rt_static is not None) or gi_own_tree):
        from toyrenderer_tpu.ops import bvh as bvh_mod
        from toyrenderer_tpu.ops import ddgi as ddgi_mod
        _, _, g_pi, g_pm = _rt_streams(
            rt_static, rt_static_gi, pair_inst, pair_meshlet,
            rt_pair_inst, rt_pair_meshlet, gi_pair_inst, gi_pair_meshlet,
            mask_pair_inst, mask_pair_meshlet, gi_own_tree)

        def _zeros_of(fn, *a):
            sh = jax.eval_shape(fn, *a)
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), sh)

        if needs_rt and rt_static is not None:
            carry['rt_bvh_cache'] = _zeros_of(
                lambda w: _refit_tree(rt_static, w), eye)
            if (settings.enable_gi and not gi_own_tree
                    and ddgi_mod._gi_pairs_enabled()
                    and not ddgi_mod._gi_chunks_enabled()):
                # shared-tree pair-MXU mode: cache the Moller-Trumbore
                # tables too, else traverse_pairs rebuilds them inline
                # every frame (twice: probe + shadow trace) even when
                # the scene is static
                from toyrenderer_tpu.ops.rt_pairs import mt_tables
                carry['gi_mt_cache'] = _zeros_of(
                    lambda w: mt_tables(_refit_tree(rt_static, w)), eye)
        if gi_own_tree:
            def _gi_shapes(w):
                gi_bvh = _refit_tree(rt_static_gi, w)
                gv0, gv1, gv2, _u = bvh_mod.world_triangles(
                    scene, w, jnp.asarray(g_pi), jnp.asarray(g_pm))
                shade = ddgi_mod.build_shade_records(
                    scene, jnp.asarray(g_pi), jnp.asarray(g_pm),
                    gv0, gv1, gv2)
                return gi_bvh, shade
            b, s_ = _zeros_of(_gi_shapes, eye)
            carry['gi_bvh_cache'] = b
            carry['gi_shade_cache'] = s_
            if (ddgi_mod._gi_pairs_enabled()
                    and not ddgi_mod._gi_chunks_enabled()):
                from toyrenderer_tpu.ops.rt_pairs import mt_tables
                carry['gi_mt_cache'] = _zeros_of(
                    lambda bb: mt_tables(bb), b)
    return carry


def _raster_with_records(scene, geo, cfg, use_pallas, inst_world,
                         inst_adj, prev_inst_world, prev_vp,
                         init_depth=None,
                         init_tri_id=None, init_rec=None,
                         emit_base: int = 0, padded_io: bool = False,
                         sp_mesh=None, peel_depth=None):
    """setup + bin + fill, producing per-pixel resolve data.

    Pallas path: the fused fill+resolve kernel fetches records via one-hot
    MXU matmuls (no per-pixel gather) and resolves them to the interpolant
    stack in-kernel.  Returns (setup, records, depth, tri_id,
    interp-or-None); `records` is the (T, 64) raw array (the CPU resolve
    gathers it), interp the (INTERP_C, H, W) fused channel-first
    interpolant output (-> resolve_gbuffer).  padded_io keeps images
    padded to the tile grid across multi-phase fills.
    """
    setup = raster_mod.setup_triangles(geo, cfg)
    records = pack_resolve_records(setup, scene, inst_world, inst_adj,
                                   prev_inst_world, prev_vp)
    if use_pallas:
        if sp_mesh is not None:
            # single-frame multi-chip raster: tile rows shard over 'sp'
            from toyrenderer_tpu.parallel.sp_raster import raster_frame_sp
            mesh, axis = sp_mesh
            depth, tid, interp, stats = raster_frame_sp(
                setup, records, cfg, mesh, axis,
                init_depth=init_depth, init_tri_id=init_tri_id,
                init_rec=init_rec, emit_base=emit_base,
                padded_io=padded_io,
                interpret=jax.default_backend() not in ('tpu', 'axon'))
            return setup, records, depth, tid, interp, stats
        from toyrenderer_tpu.ops.raster_pallas import (
            _stream_layout, fill_resolve_stream)
        bins = raster_mod.bin_pairs_stream(setup, cfg)
        # pair-budget telemetry: cfg.pair_capacity bounds the chunk grid
        # (content-measured now); report what the budget clips with the
        # EXACT accounting the kernel runs under (XLA CSEs the repeat)
        acc = _stream_layout(
            setup, bins, cfg, None,
            min(cfg.chunk, cfg.max_tris_per_tile, cfg.max_big_tris))
        bins = dict(bins, drop=dict(
            bins['drop'],
            drop_pair_budget=jnp.sum(acc['counts_clamped']
                                     - acc['counts_eff'])))
        depth, tid, interp = fill_resolve_stream(
            setup, records, bins, cfg,
            init_depth=init_depth, init_tri_id=init_tri_id,
            init_rec=init_rec, emit_base=emit_base, padded_io=padded_io,
            peel_depth=peel_depth,
            interpret=jax.default_backend() not in ('tpu', 'axon'))
        stats = _raster_stats(setup, bins)
        return setup, records, depth, tid, interp, stats
    table, counts, big, drop = raster_mod.bin_triangles(setup, cfg)
    depth, tid = raster_mod.fill_visibility(
        setup, table, big, cfg, init_depth=init_depth,
        init_tri_id=init_tri_id, emit_base=emit_base,
        peel_depth=peel_depth)
    stats = _raster_stats(
        setup, dict(counts=counts, big_list=big, drop=drop))
    return setup, records, depth, tid, None, stats


def _raster_stats(setup, bins):
    """Pipeline-statistics counters per base-pass set (the reference
    surfaces AS/MS/PS invocation counts, BasePassRenderers.cpp:178-221):
    setup-surviving triangles, binned (tile, tri) pairs, big triangles,
    and — round 4 — SILENT-DROP telemetry: every bounded-amplification
    path reports its overflow (class caps, per-tile K, big list), so a
    capacity outgrown by content shows up in stats instead of as
    unexplained holes."""
    out = dict(
        tris=jnp.sum(setup['valid'].astype(jnp.int32)),
        binned_pairs=jnp.sum(bins['counts']),
        big_tris=jnp.sum((bins['big_list'] >= 0).astype(jnp.int32)))
    drop = bins.get('drop')
    if drop:
        out['dropped'] = sum(drop.values())
        out.update(drop)
    return out


def _refit_tree(rt_s, inst_world):
    """Per-frame refit of a frozen topology (BLAS-cache analogue)."""
    if hasattr(rt_s, 'depth_ranges'):
        # adaptive SAH topology (explicit child refs): Pallas-only
        # traversal — callers select it on TPU backends
        from toyrenderer_tpu.ops.bvh_sah import refit_sah
        return refit_sah(rt_s, inst_world)
    return bvh_mod.refit_bvh(rt_s, inst_world)


def _rt_streams(rt_static, rt_static_gi, pair_inst, pair_meshlet,
                rt_pair_inst, rt_pair_meshlet, gi_pair_inst,
                gi_pair_meshlet, mask_pair_inst, mask_pair_meshlet,
                gi_own_tree):
    """Assemble the RT / GI pair streams.

    rt_static is built WITH the alpha-masked set appended (coverage-kept
    cutout tris occlude — shadowmask.hlsl any-hit alpha parity): the
    payload indexes the CONCATENATED pair stream, so shade records /
    world triangles must span it too.  The explicit rt_pair_* override
    lets the RT topology use a DIFFERENT pair list than the raster
    (e.g. reduced-LOD geometry on Bistro-scale scenes); payloads index
    that stream.  Shared by render_frame and init_carry (refit-cache
    shape derivation must match the frame's streams exactly).
    """
    base_pi = rt_pair_inst if rt_pair_inst is not None else pair_inst
    base_pm = (rt_pair_meshlet if rt_pair_meshlet is not None
               else pair_meshlet)
    rt_pi, rt_pm = base_pi, base_pm
    if (rt_static is not None
            and getattr(rt_static, 'n_mask_pairs', 0) > 0
            and mask_pair_inst is not None):
        nm = rt_static.n_mask_pairs
        rt_pi = jnp.concatenate([base_pi, mask_pair_inst[:nm]])
        rt_pm = jnp.concatenate([base_pm, mask_pair_meshlet[:nm]])
    g_pi = gi_pair_inst if gi_pair_inst is not None else base_pi
    g_pm = gi_pair_meshlet if gi_pair_meshlet is not None else base_pm
    if (gi_own_tree
            and getattr(rt_static_gi, 'n_mask_pairs', 0) > 0
            and mask_pair_inst is not None):
        nm = rt_static_gi.n_mask_pairs
        g_pi = jnp.concatenate([g_pi, mask_pair_inst[:nm]])
        g_pm = jnp.concatenate([g_pm, mask_pair_meshlet[:nm]])
    return rt_pi, rt_pm, g_pi, g_pm


def render_frame(scene, pair_inst, pair_meshlet, frame_inputs: dict,
                 carry: FrameCarry, settings: RenderSettings,
                 ddgi_volume=None, trans_pair_inst=None,
                 trans_pair_meshlet=None, mask_pair_inst=None,
                 mask_pair_meshlet=None, sp_mesh=None, rt_static=None,
                 rt_pair_inst=None, rt_pair_meshlet=None,
                 rt_static_gi=None, gi_pair_inst=None,
                 gi_pair_meshlet=None):
    """One frame.  jit with static settings via `make_render_fn`.

    frame_inputs (all jnp arrays, dynamic):
      view_proj, view_proj_nojitter, prev_view_proj_nojitter,
      inv_view_proj, cam_pos — from View.matrices()
      node_translation/rotation/scale — animated local TRS (defaults:
        scene rest pose)
      sun_direction (3,), sun_color (3,), sun_intensity ()
    Returns (image_u8 (H, W, 3), new_carry, aux dict).
    """
    cfg = settings.raster_config()

    # -- UpdateInstanceConsts ------------------------------------------------
    world = geo_mod.node_world_matrices(
        scene, frame_inputs['node_translation'],
        frame_inputs['node_rotation'], frame_inputs['node_scale'])
    inst_world, inst_adj = geo_mod.instance_transforms(scene, world)
    prev_inst_world = carry['prev_inst_world']

    use_pallas = settings.use_pallas_fill
    if use_pallas is None:
        # axon is the tunneled-TPU platform name in this environment
        use_pallas = jax.default_backend() in ('tpu', 'axon')

    prev_vp = frame_inputs['prev_view_proj_nojitter']

    # -- Geometry + raster (GBuffer pass) -------------------------------------
    if settings.enable_culling and not settings.use_bruteforce_raster:
        records, depth, tri_id, cull_aux, new_hzb = _gbuffer_two_phase(
            scene, inst_world, inst_adj, prev_inst_world, frame_inputs,
            carry, pair_inst, pair_meshlet, cfg, settings, use_pallas,
            sp_mesh=sp_mesh)
    else:
        geo = geo_mod.meshlet_clip_triangles(
            scene, inst_world, frame_inputs['view_proj'],
            pair_inst, pair_meshlet)
        if settings.use_bruteforce_raster:
            setup, depth, tri_id = raster_mod.rasterize_bruteforce(geo, cfg)
            records = pack_resolve_records(
                setup, scene, inst_world, inst_adj, prev_inst_world,
                prev_vp)
        else:
            (_, recs_t, depth, tri_id, interp,
             rstats) = _raster_with_records(
                scene, geo, cfg, use_pallas, inst_world, inst_adj,
                prev_inst_world, prev_vp, sp_mesh=sp_mesh)
            records = interp if interp is not None else recs_t
        cull_aux = {} if settings.use_bruteforce_raster else dict(
            **{f'raster_{k}': v for k, v in rstats.items()})
        new_hzb = None

    atlas = None
    if settings.enable_textures and scene.num_textures > 0:
        atlas = scene.atlas_dict()
        # virtual-texture residency overrides from the streaming manager
        streamed = False
        for k in ('tex_texels', 'tex_desc', 'tex_min_mip',
                  'tex_tile_table'):
            if k in frame_inputs:
                atlas = dict(atlas, **{k: frame_inputs[k]})
                streamed = True
        if streamed and atlas.get('_analytic'):
            # streaming rewrites desc rows (residency redirection):
            # keep the desc-gather path; records stay encoded ('_enc')
            atlas = dict(atlas, _analytic=False)
    gb = resolve_gbuffer(records, depth, tri_id, frame_inputs['jitter'],
                         cfg, atlas=atlas,
                         num_textures=scene.num_textures,
                         quad_taps=settings.texture_quad_taps,
                         aniso=settings.texture_aniso,
                           emit_planes=not settings.pack_gbuffer)

    # -- Alpha-masked set (second base-pass set, basepass.hlsl
    #    ALPHA_MASK_MODE parity): depth-peeled `alpha_layers` times,
    #    nearest→farther; per pixel the FIRST layer whose alpha passes
    #    the cutoff wins — so a fragment behind a front cutout's holes
    #    shows through, matching the reference's in-raster discard
    #    (next-closest fragment wins).  Layers beyond the budget drop
    #    (bounded work, like every amplification path here) --------------
    if (settings.enable_alpha_test and mask_pair_inst is not None
            and mask_pair_inst.shape[0] > 0):
        geo_m = geo_mod.meshlet_clip_triangles(
            scene, inst_world, frame_inputs['view_proj'],
            mask_pair_inst, mask_pair_meshlet)
        chosen = jnp.zeros_like(depth, dtype=bool)
        peel = None
        # setup/records/bins are layer-invariant (only the peel bound
        # changes) — hoist them so each extra layer costs one FILL, not
        # a re-sort of the masked pair stream
        setup_m = records_m = bins_m = table_m = big_m = None
        if sp_mesh is None:
            setup_m = raster_mod.setup_triangles(geo_m, cfg)
            records_m = pack_resolve_records(
                setup_m, scene, inst_world, inst_adj, prev_inst_world,
                prev_vp)
            if use_pallas:
                bins_m = raster_mod.bin_pairs_stream(setup_m, cfg)
            else:
                table_m, _, big_m, _ = raster_mod.bin_triangles(setup_m,
                                                                cfg)
        h0_, w0_ = depth.shape
        n_layers = max(settings.alpha_layers, 1)
        # live merge channels: with float shading planes the packed
        # gbuffer0-3 are never consumed (unpack_gbuffer prefers planes)
        # and uv only feeds debug views — pruning them matters on the
        # compact-merge path, where dead lanes of the ONE fused
        # un-compaction gather can't be DCE'd by XLA
        if settings.pack_gbuffer:
            merge_scalar = ['gbuffer0', 'gbuffer1', 'gbuffer2',
                            'gbuffer3']
            merge_vec = ['motion']
        else:
            merge_scalar = ['rough_f', 'metal_f']
            merge_vec = ['motion', 'albedo_f', 'normal_f', 'emissive_f']
        if settings.debug_mode != 0:
            merge_vec.append('uv')
        merge_chan = set(merge_scalar) | set(merge_vec)
        # fast path: ALL layers resolve + texture at COMPACT rate in one
        # pass (ops/gbuffer.masked_peel_merge_compact) — masked geometry
        # covers a small screen fraction, so the dense per-layer resolve
        # below pays ~2 full-screen texture passes of pure waste.  With
        # Pallas, ONE lean L-layer peel fill (insertion cascade in VMEM,
        # occluder-seeded, no in-kernel resolve) replaces L full fused
        # fills whose interpolant epilogues would be dead work.
        merge_fast = (sp_mesh is None and records_m is not None
                      and settings.peel_merge_frac > 0
                      and h0_ % 2 == 0 and w0_ % 2 == 0)
        if merge_fast:
            if use_pallas:
                from toyrenderer_tpu.ops.raster_pallas import (
                    fill_peel_stream)
                depth_l, tid_l = fill_peel_stream(
                    setup_m, bins_m, cfg, layers=n_layers,
                    occluder_depth=depth,
                    interpret=jax.default_backend() not in
                    ('tpu', 'axon'))
            else:
                dl, tl = [], []
                for _layer in range(n_layers):
                    depth_m, tid_m = raster_mod.fill_visibility(
                        setup_m, table_m, big_m, cfg, peel_depth=peel)
                    # occluder mask (the Pallas peel seeds layers with
                    # the opaque depth in-kernel instead)
                    dl.append(depth_m)
                    tl.append(jnp.where(depth_m > depth, tid_m, -1))
                    peel = depth_m
                depth_l = jnp.stack(dl)
                tid_l = jnp.stack(tl)
            from toyrenderer_tpu.ops.gbuffer import (
                masked_peel_merge_compact)
            cap_q = max(int((h0_ // 2) * (w0_ // 2)
                            * settings.peel_merge_frac), 256)
            gb_m = masked_peel_merge_compact(
                records_m, depth_l, tid_l, frame_inputs['jitter'],
                cfg, cap_q, atlas=atlas,
                num_textures=scene.num_textures,
                quad_taps=settings.texture_quad_taps,
                aniso=settings.texture_aniso,
                emit_planes=not settings.pack_gbuffer,
                channels=merge_chan)
            passes = gb_m['passes']
            for k in merge_scalar:
                if k in gb and k in gb_m:
                    gb[k] = jnp.where(passes, gb_m[k], gb[k])
            for k in merge_vec:
                if k in gb and k in gb_m:
                    gb[k] = jnp.where(passes[..., None], gb_m[k], gb[k])
            depth = jnp.where(passes, gb_m['depth'], depth)
            tri_id = jnp.where(passes, gb_m['tri_id'], tri_id)
        else:
            for _layer in range(n_layers):
                if sp_mesh is not None:
                    (_, recs_m, depth_m, tid_m, interp_m,
                     _) = _raster_with_records(
                        scene, geo_m, cfg, use_pallas, inst_world,
                        inst_adj, prev_inst_world, prev_vp,
                        sp_mesh=sp_mesh, peel_depth=peel)
                    rec_m = interp_m if interp_m is not None else recs_m
                elif use_pallas:
                    from toyrenderer_tpu.ops.raster_pallas import (
                        fill_resolve_stream)
                    depth_m, tid_m, rec_m = fill_resolve_stream(
                        setup_m, records_m, bins_m, cfg, peel_depth=peel,
                        interpret=jax.default_backend() not in ('tpu',
                                                                'axon'))
                else:
                    depth_m, tid_m = raster_mod.fill_visibility(
                        setup_m, table_m, big_m, cfg, peel_depth=peel)
                    rec_m = records_m
                gb_m = resolve_gbuffer(
                    rec_m, depth_m, tid_m,
                    frame_inputs['jitter'], cfg,
                    atlas=atlas,
                    num_textures=scene.num_textures,
                    quad_taps=settings.texture_quad_taps,
                    aniso=settings.texture_aniso,
                    emit_planes=not settings.pack_gbuffer)
                passes = ((gb_m['alpha'] >= gb_m['alpha_cutoff'])
                          & (depth_m > depth) & (depth_m > 0.0) & ~chosen)
                for k in merge_scalar:
                    if k in gb and k in gb_m:
                        gb[k] = jnp.where(passes, gb_m[k], gb[k])
                for k in merge_vec:
                    if k in gb and k in gb_m:
                        gb[k] = jnp.where(passes[..., None], gb_m[k],
                                          gb[k])
                depth = jnp.where(passes, depth_m, depth)
                tri_id = jnp.where(passes, tid_m, tri_id)  # ids index
                # the MASKED setup for those pixels; aux-only (shading
                # reads the gbuffer)
                chosen = chosen | passes
                peel = depth_m
        gb['depth'] = depth

    # -- Sky radiance closure (Hosek-Wilkie default, SkyRenderer.cpp
    #    parity; Preetham fallback) — shared by deferred lighting, DDGI
    #    probe misses and forward transparency ------------------------------
    to_light_sky = -frame_inputs['sun_direction']
    if settings.sky_model == 'hosek' and 'sky_params' in frame_inputs:
        sky_fn = lambda d: sky_mod.sky_radiance_hosek(  # noqa: E731
            d, to_light_sky, frame_inputs['sky_params'],
            sun_intensity=frame_inputs['sun_intensity'])
    else:
        sky_fn = lambda d: sky_mod.sky_radiance(  # noqa: E731
            d, to_light_sky, turbidity=settings.sky_turbidity,
            sun_intensity=frame_inputs['sun_intensity'])

    # -- RT acceleration structure (shared by shadows + DDGI) -------------------
    # the RT scene uses the FULL pair list — off-screen geometry still
    # casts shadows / bounces light (culling only affects the raster pass).
    # With rt_static (the BLAS-cache analogue, built once at scene load)
    # the frame only REFITS: transform + AABB re-reduction, no sort —
    # Visual.cpp:509-542 / Scene.cpp:411-466 parity.
    bvh = None
    needs_rays = (settings.enable_shadows
                  and settings.shadow_technique == 'rt')
    # a dedicated GI tree (rt_static_gi, usually LOD-reduced + SAH — the
    # measured probe-ray winner) decouples DDGI from the shadow tree, so
    # the main tree is only needed for rt shadows / ReSTIR
    gi_own_tree = settings.enable_gi and rt_static_gi is not None
    needs_rt = (needs_rays or settings.enable_restir
                or (settings.enable_gi and not gi_own_tree))
    needs_wp = (needs_rt or settings.enable_shadows
                or settings.enable_gi)
    # pair-order world triangles feed DDGI shade records / ReSTIR lights
    needs_tris = (settings.enable_restir
                  or (settings.enable_gi and not gi_own_tree))
    # stream assembly shared with init_carry's refit-cache shapes
    rt_pi, rt_pm, g_pi, g_pm = _rt_streams(
        rt_static, rt_static_gi, pair_inst, pair_meshlet, rt_pair_inst,
        rt_pair_meshlet, gi_pair_inst, gi_pair_meshlet, mask_pair_inst,
        mask_pair_meshlet, gi_own_tree)
    # refit caching: a static scene re-refits nothing — the per-frame
    # transform + AABB reduction (~2-10 ms at real tree sizes) runs only
    # when an instance matrix changed (Scene.cpp:411-466 rebuilds the
    # TLAS every frame because that's nearly free on RT cores)
    rt_carry = {}
    scene_moved = None
    if needs_rt or settings.enable_gi:
        scene_moved = (jnp.any(inst_world != prev_inst_world)
                       | (carry['frame_index'] == 0))
    if needs_rt:
        if rt_static is not None:
            if 'rt_bvh_cache' in carry:
                bvh = jax.lax.cond(
                    scene_moved,
                    lambda _: _refit_tree(rt_static, inst_world),
                    lambda _: carry['rt_bvh_cache'], 0)
                rt_carry['rt_bvh_cache'] = bvh
            else:
                bvh = _refit_tree(rt_static, inst_world)
            if needs_tris:
                tv0, tv1, tv2, tvalid = bvh_mod.world_triangles(
                    scene, inst_world, rt_pi, rt_pm)
        else:
            tv0, tv1, tv2, tvalid = bvh_mod.world_triangles(
                scene, inst_world, rt_pi, rt_pm)
            bvh = bvh_mod.build_bvh(tv0, tv1, tv2, tvalid)

    from toyrenderer_tpu.ops.gbuffer import unpack_gbuffer
    from toyrenderer_tpu.ops.lighting import world_pos_from_depth
    m_gb = (unpack_gbuffer(gb)
            if (needs_wp or settings.enable_ao) else None)
    wp = (world_pos_from_depth(depth, frame_inputs['inv_view_proj'],
                               settings.width, settings.height)
          if needs_wp else None)

    # -- Sun shadow map (shared by the ShadowMask pass and the DDGI
    #    probe-hit direct-sun taps) ------------------------------------------
    gi_sun_map = settings.enable_gi and (
        settings.gi_sun_technique == 'map'
        or (settings.gi_sun_technique == 'auto' and not needs_rays))
    sm_quads = None
    sun_vis_fn = None
    sm_dropped = None
    shadow_carry = {}
    if ((settings.enable_shadows and settings.shadow_technique == 'map')
            or gi_sun_map):
        from toyrenderer_tpu.ops import shadowmap as sm_mod
        sm_cfg = sm_mod.shadow_map_config(
            settings.shadow_map_resolution)
        # masked cutout casters: the rt pair stream + its coverage keep
        # (rt_pi == pair_inst when no masked set / no rt_static)
        sm_keep = (rt_static.pair_keep
                   if (rt_static is not None
                       and getattr(rt_static, 'n_mask_pairs', 0) > 0
                       and mask_pair_inst is not None) else None)
        # the sun map depends only on the light + world transforms —
        # NOT the camera — so it lives in the carry and re-renders only
        # when the sun moves or any instance transform changes (the
        # reference re-rasterizes per frame because that's nearly free
        # on a GPU; here the 2048^2 raster is a measured ~60-80 ms of
        # the all-on frame, and sun/scene are static in the common case)
        sun_vp = frame_inputs['sun_view_proj']
        if settings.cache_sun_map and 'sun_map_depth' in carry:
            moved = jnp.any(sun_vp != carry['prev_sun_view_proj'])
            moved = moved | jnp.any(inst_world != prev_inst_world)
            moved = moved | (carry['frame_index'] == 0)

            def _render(_):
                return sm_mod.render_shadow_map(
                    scene, inst_world, rt_pi, rt_pm, sun_vp, sm_cfg,
                    use_pallas, tri_keep=sm_keep)

            sm_depth, sm_dropped = jax.lax.cond(
                moved, _render,
                lambda _: (carry['sun_map_depth'],
                           carry.get('sun_map_dropped',
                                     jnp.asarray(0, jnp.int32))),
                operand=None)
            shadow_carry['sun_map_depth'] = sm_depth
            shadow_carry['sun_map_dropped'] = sm_dropped
            shadow_carry['prev_sun_view_proj'] = sun_vp
        else:
            sm_depth, sm_dropped = sm_mod.render_shadow_map(
                scene, inst_world, rt_pi, rt_pm, sun_vp, sm_cfg,
                use_pallas, tri_keep=sm_keep)
        sm_quads = sm_mod.quad_expand_map(sm_depth)
        if gi_sun_map:
            sun_vis_fn = lambda pts: sm_mod.sample_shadow_map_points(  # noqa: E731
                sm_quads, settings.shadow_map_resolution,
                frame_inputs['sun_view_proj'], pts)

    # -- ShadowMask (denoised; technique: rasterized sun depth map by
    #    default — the TPU-native path — or BVH ray traced) -----------------
    shadow_mask = None
    if settings.enable_shadows:
        if settings.shadow_technique == 'map':
            from toyrenderer_tpu.ops import shadowmap as sm_mod
            raw = sm_mod.sample_shadow_map(
                sm_quads, settings.shadow_map_resolution,
                frame_inputs['sun_view_proj'], wp, m_gb['normal'],
                -frame_inputs['sun_direction'], depth > 0.0,
                carry['frame_index'])
        else:
            sc = max(settings.shadow_ray_scale, 1)
            if sc > 1 and settings.height % sc == 0 \
                    and settings.width % sc == 0 \
                    and (sc & (sc - 1)) == 0:
                # half-res shadow rays + upsample: pick the NEAREST
                # (reverse-Z max) depth of each quad as the ray origin
                # surface, reconstruct its world position analytically,
                # and mean the quad normals for the bias direction.  The
                # full-res temporal accumulate + depth-aware blur
                # (denoise_shadow) then absorbs the quad quantization
                # like it absorbs the 1-spp cone noise.
                def _pool_max(x):
                    return jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (sc, sc), (sc, sc),
                        'VALID')

                def _pool_mean3(x):
                    return jax.lax.reduce_window(
                        x, 0.0, jax.lax.add, (sc, sc, 1), (sc, sc, 1),
                        'VALID') * (1.0 / (sc * sc))
                d_h = _pool_max(depth)
                wp_h = world_pos_from_depth(
                    d_h, frame_inputs['inv_view_proj'],
                    settings.width // sc, settings.height // sc)
                from toyrenderer_tpu.mathlib.transforms import normalize
                n_h = normalize(_pool_mean3(m_gb['normal']))
                if settings.shadow_checkerboard \
                        and (settings.width // sc) % 2 == 0:
                    # alternating checkerboard: trace half the half-res
                    # grid, fill the rest from in-row neighbours; the
                    # full-res temporal accumulate recovers the other
                    # half next frame (see ops/shadows.py helpers)
                    par = (carry['frame_index'] % 2).astype(jnp.int32)
                    d_c, wp_c, n_c = shadows_mod.checkerboard_pack(
                        (d_h, wp_h, n_h), par)
                    raw_c = shadows_mod.trace_shadow_mask(
                        bvh, wp_c, n_c, d_c > 0.0,
                        -frame_inputs['sun_direction'],
                        carry['frame_index'],
                        max_steps=settings.shadow_max_steps,
                        sp_mesh=sp_mesh)
                    raw_h = shadows_mod.checkerboard_unpack(raw_c, par)
                else:
                    raw_h = shadows_mod.trace_shadow_mask(
                        bvh, wp_h, n_h, d_h > 0.0,
                        -frame_inputs['sun_direction'],
                        carry['frame_index'],
                        max_steps=settings.shadow_max_steps,
                        sp_mesh=sp_mesh)
                from toyrenderer_tpu.ops.texture import _quad_expand_ch
                raw = raw_h[..., None]
                for _ in range(sc.bit_length() - 1):   # log2(sc) doublings
                    raw = _quad_expand_ch(raw)
                raw = raw[..., 0]
            else:
                raw = shadows_mod.trace_shadow_mask(
                    bvh, wp, m_gb['normal'], depth > 0.0,
                    -frame_inputs['sun_direction'], carry['frame_index'],
                    max_steps=settings.shadow_max_steps, sp_mesh=sp_mesh)
        shadow_mask, shadow_hist = denoise_mod.denoise_shadow(
            raw, gb['motion'], carry['shadow_history'],
            carry['shadow_valid'], depth, carry['prev_depth'])
        shadow_carry.update(
            shadow_history=shadow_hist,
            shadow_valid=jnp.asarray(1.0, jnp.float32))

    # -- GI (DDGI probe trace + update + per-pixel sampling) --------------------
    gi_irradiance = None
    gi_carry = {}
    if settings.enable_gi:
        assert ddgi_volume is not None, "enable_gi requires a ddgi_volume"
        to_light = -frame_inputs['sun_direction']
        # convergence skip (GIRenderer.cpp:466-470 parity — the reference
        # early-returns the WHOLE GI render once probe variability
        # settles): refit + shade records + probe trace + blend +
        # lifecycle all sit under one lax.cond, so a converged volume
        # costs zero ray/BVH work and shading samples the frozen field.
        # A sun change resets the sample counter and resumes updates
        # (the reference leaves converged probes stale there).
        sun_sig = jnp.concatenate([
            jnp.asarray(frame_inputs['sun_direction'],
                        jnp.float32).reshape(-1)[:3],
            jnp.asarray(frame_inputs['sun_color'],
                        jnp.float32).reshape(-1)[:3],
            jnp.asarray(frame_inputs['sun_intensity'],
                        jnp.float32).reshape(-1)[:1]])
        sun_changed = jnp.any(
            jnp.abs(sun_sig - carry['ddgi_sun_sig']) > 1e-6)
        var_samples = jnp.where(sun_changed, 0.0,
                                carry['ddgi_var_samples'])
        # reference convergence test (GIRenderer.cpp:162-179): std-dev
        # of the last kMinimumVariabilitySamples raw variability values
        # under the threshold — "the estimate stopped improving".  The
        # raw level itself floors at ray-jitter noise and would never
        # cross a small absolute threshold.
        ring = carry['ddgi_var_ring']
        n_valid = jnp.minimum(var_samples,
                              float(ddgi_mod.VAR_WINDOW))
        vmask = (jnp.arange(ddgi_mod.VAR_WINDOW, dtype=jnp.float32)
                 < n_valid)
        nn = jnp.maximum(n_valid, 1.0)
        ring_mean = jnp.sum(jnp.where(vmask, ring, 0.0)) / nn
        ring_std = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.where(vmask, (ring - ring_mean) ** 2, 0.0)) / nn,
            0.0))
        gi_converged = ((var_samples
                         > float(settings.gi_min_var_samples))
                        & (ring_std < settings.gi_variability_threshold))
        if not settings.gi_convergence_skip:
            gi_converged = jnp.asarray(False)
        _GI_KEYS = ('ddgi_irradiance', 'ddgi_distance', 'ddgi_offset',
                    'ddgi_state', 'ddgi_variability', 'ddgi_var_ring',
                    'ddgi_var_accum')
        # phased updates converge per CYCLE: the ring gets one sample
        # per full pass over the volume (update_probe_block cycle_end)
        gi_phases = max(settings.gi_update_phases, 1)
        gi_cycle_end = (carry['frame_index'] % gi_phases
                        ) == (gi_phases - 1)
        # interval mode: ONE full-volume dispatch per cycle instead of a
        # 1/N block per frame — non-update frames hold the carry through
        # the same cond that implements the convergence skip
        gi_interval = (settings.gi_update_mode == 'interval'
                       and gi_phases > 1)

        # pair-MXU probe traversal: its Moller-Trumbore coefficient
        # tables are world-space, so they rebuild alongside the
        # moved-gated refit and ride the same carry cache.  emit only
        # when the carry can hold them (else the cond branches would
        # disagree); without a cache traverse_pairs rebuilds inline.
        gi_pairs = (ddgi_mod._gi_pairs_enabled()
                    and not ddgi_mod._gi_chunks_enabled())
        emit_mt = gi_pairs and ('gi_bvh_cache' not in carry
                                or 'gi_mt_cache' in carry)

        def _gi_build(_):
            # dedicated GI topology: probe rays are diffuse-frequency,
            # so they trace a (usually LOD-reduced, SAH-flavored) tree
            # built over its own pair stream — the TPU-first trade the
            # reference's shared TLAS doesn't make.  Shade records
            # must span the GI stream (payloads index it).
            gi_bvh = _refit_tree(rt_static_gi, inst_world)
            gv0, gv1, gv2, _u = bvh_mod.world_triangles(
                scene, inst_world, g_pi, g_pm)
            shade = ddgi_mod.build_shade_records(
                scene, g_pi, g_pm, gv0, gv1, gv2)
            if emit_mt:
                from toyrenderer_tpu.ops.rt_pairs import mt_tables
                return gi_bvh, shade, mt_tables(gi_bvh)
            return gi_bvh, shade, ()

        def _gi_update(_):
            gi_mt = None
            if gi_own_tree:
                if 'gi_bvh_cache' in carry:
                    gi_bvh, shade_rec, gi_mt = jax.lax.cond(
                        scene_moved, _gi_build,
                        lambda _: (carry['gi_bvh_cache'],
                                   carry['gi_shade_cache'],
                                   carry['gi_mt_cache'] if emit_mt
                                   else ()), 0)
                else:
                    gi_bvh, shade_rec, gi_mt = _gi_build(0)
            else:
                gi_bvh = bvh
                shade_rec = ddgi_mod.build_shade_records(
                    scene, rt_pi, rt_pm, tv0, tv1, tv2)
                if gi_pairs:
                    from toyrenderer_tpu.ops.rt_pairs import mt_tables
                    if 'gi_mt_cache' in carry:
                        gi_mt = jax.lax.cond(
                            scene_moved, lambda _: mt_tables(bvh),
                            lambda _: carry['gi_mt_cache'], 0)
                    else:
                        gi_mt = mt_tables(bvh)
            # structural emptiness test: leaf truthiness of a cond-output
            # pytree would raise under jit if the tables ever become a
            # bare array
            gi_mt = None if (gi_mt is None or gi_mt == ()) else gi_mt
            # block-phased trace with the full probe lifecycle:
            # relocation, classification (inactive probes are ray-masked
            # to zero cost) and variability convergence
            # (GIRenderer.cpp:450-577, 158-190)
            trace_phases = 1 if gi_interval else settings.gi_update_phases
            (radiance, ray_dist, ray_dirs, blk,
             lifecycle) = ddgi_mod.trace_probe_block(
                ddgi_volume, gi_bvh, shade_rec, carry['ddgi_irradiance'],
                to_light, frame_inputs['sun_color'],
                frame_inputs['sun_intensity'], carry['frame_index'],
                sky_fn, trace_phases,
                max_steps=settings.gi_max_steps,
                probe_offset=carry['ddgi_offset'],
                probe_state=carry['ddgi_state'], sun_vis_fn=sun_vis_fn,
                sp_mesh=sp_mesh, pair_tables=gi_mt)
            gic = ddgi_mod.update_probe_block(
                ddgi_volume,
                # ring cursor must follow the sun-reset sample count
                dict(carry, ddgi_var_samples=var_samples),
                radiance, ray_dist, ray_dirs, blk,
                first_frame=(carry['frame_index']
                             < settings.gi_update_phases),
                lifecycle=lifecycle,
                cycle_end=(jnp.asarray(True) if gi_interval
                           else gi_cycle_end),
                num_phases=trace_phases)
            out = {k: gic[k] for k in _GI_KEYS}
            if gi_own_tree and 'gi_bvh_cache' in carry:
                out['gi_bvh_cache'] = gi_bvh
                out['gi_shade_cache'] = shade_rec
            if emit_mt and 'gi_mt_cache' in carry:
                out['gi_mt_cache'] = gi_mt
            return out

        def _gi_hold(_):
            keys = list(_GI_KEYS)
            if gi_own_tree and 'gi_bvh_cache' in carry:
                keys += ['gi_bvh_cache', 'gi_shade_cache']
            if emit_mt and 'gi_mt_cache' in carry:
                keys += ['gi_mt_cache']
            return {k: carry[k] for k in keys}

        gi_skip = gi_converged
        if gi_interval:
            gi_skip = gi_skip | jnp.logical_not(gi_cycle_end)
        gi_carry = jax.lax.cond(gi_skip, _gi_hold, _gi_update, 0)
        gi_carry['ddgi_var_samples'] = jnp.where(
            gi_converged, var_samples,
            var_samples + gi_cycle_end.astype(jnp.float32))
        gi_carry['ddgi_sun_sig'] = sun_sig
        # per-pixel probe sampling is ~24 latency-bound gathers/pixel
        # (8 probes x irradiance+visibility+offset); irradiance is
        # low-frequency (probe spacing >> pixels), so sample at
        # 1/gi_sample_scale res and expand (~scale^2 cheaper — the
        # reference's probe-texture taps are hardware filtered, this is
        # our equivalent trade)
        sc = max(settings.gi_sample_scale, 1) if settings.gi_half_res \
            else 1
        if (sc > 1 and settings.height % sc == 0
                and settings.width % sc == 0):
            def _pool(x):
                return jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (sc, sc, 1), (sc, sc, 1),
                    'VALID') * (1.0 / (sc * sc))
            from toyrenderer_tpu.mathlib.transforms import normalize
            gi_h = ddgi_mod.sample_irradiance_visibility(
                ddgi_volume, gi_carry['ddgi_irradiance'],
                gi_carry['ddgi_distance'], _pool(wp),
                normalize(_pool(m_gb['normal'])),
                probe_offset=gi_carry['ddgi_offset'],
                vis_pool=max(settings.gi_vis_scale, 1))
            gi_irradiance = jnp.repeat(jnp.repeat(gi_h, sc, 0), sc, 1)
            # bilinear-equivalent smoothing of the nearest expansion:
            # irradiance is low-frequency, but the raw sc x sc blocks
            # beat against the probe grid as a lattice of bright dots
            # (the round-4 Cornell golden's wall speckles — root-caused
            # to THIS expansion, not the probe field; gi_sample_scale=1
            # renders clean).  Two separable [1 2 1]/4 taps cost ~nothing
            # next to the 24 gathers/pixel the half-res path saves.
            for ax in (0, 1):
                lo = jnp.concatenate(
                    [jnp.take(gi_irradiance, jnp.asarray([0]), axis=ax),
                     jnp.moveaxis(jnp.moveaxis(
                         gi_irradiance, ax, 0)[:-1], 0, ax)], axis=ax)
                hi = jnp.concatenate(
                    [jnp.moveaxis(jnp.moveaxis(
                        gi_irradiance, ax, 0)[1:], 0, ax),
                     jnp.take(gi_irradiance, jnp.asarray([-1]),
                              axis=ax)], axis=ax)
                gi_irradiance = (0.25 * lo + 0.5 * gi_irradiance
                                 + 0.25 * hi)
        else:
            gi_irradiance = ddgi_mod.sample_irradiance_visibility(
                ddgi_volume, gi_carry['ddgi_irradiance'],
                gi_carry['ddgi_distance'], wp, m_gb['normal'],
                probe_offset=gi_carry['ddgi_offset'],
                vis_pool=max(settings.gi_vis_scale, 1))
        gi_irradiance = jnp.where((depth > 0)[..., None],
                                  gi_irradiance, 0.0)

    # -- ReSTIR DI (implemented, off by default — reference parity: the
    #    renderer is registered but unscheduled, ReSTIRRenderer.cpp) --------
    restir_light = None
    restir_carry = {}
    if settings.enable_restir:
        lights = restir_mod.collect_emissive_lights(
            scene, rt_pi, rt_pm, tv0, tv1, tv2,
            max_lights=settings.restir_max_lights)
        restir_light, reservoir = restir_mod.restir_di(
            bvh, lights, wp, m_gb['normal'], m_gb['albedo'], depth > 0.0,
            carry['frame_index'],
            prev_reservoir=carry.get('restir_reservoir'),
            motion=gb['motion'],
            num_candidates=settings.restir_candidates,
            num_spatial=settings.restir_spatial_taps,
            spatial_radius=settings.restir_spatial_radius)
        restir_carry['restir_reservoir'] = reservoir

    # -- AmbientOcclusion (GTAO) -------------------------------------------------
    ao = None
    if settings.enable_ao:
        from toyrenderer_tpu.ops.gtao import gtao as gtao_fn
        if (settings.ao_half_res and settings.height % 2 == 0
                and settings.width % 2 == 0):
            # AO horizons at half res (NDC reconstruction is
            # resolution-independent): reverse-Z max pool keeps the
            # NEAREST surface per quad; the full-res depth-aware blur
            # restores edges
            from toyrenderer_tpu.mathlib.transforms import normalize
            d_h = jax.lax.reduce_window(depth, -jnp.inf, jax.lax.max,
                                        (2, 2), (2, 2), 'VALID')
            n_h = normalize(jax.lax.reduce_window(
                m_gb['normal'], 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
                'VALID') * 0.25)
            ao_h = gtao_fn(d_h, n_h, frame_inputs['cam_pos'],
                           frame_inputs['inv_view_proj'],
                           carry['frame_index'],
                           radius=settings.ao_radius)
            # broadcast+reshape, NOT jnp.repeat: 2D-plane repeats pay a
            # lane-dim relayout (~5 ms at 1080p; see ops/texture.py
            # _quad_expand_ch notes), the broadcast form ~0.4 ms
            hh, wh = ao_h.shape
            ao = jnp.broadcast_to(ao_h[:, None, :, None],
                                  (hh, 2, wh, 2)).reshape(2 * hh, 2 * wh)
        else:
            ao = gtao_fn(depth, m_gb['normal'],
                         frame_inputs['cam_pos'],
                         frame_inputs['inv_view_proj'],
                         carry['frame_index'],
                         radius=settings.ao_radius)
        ao = denoise_mod.depth_aware_blur(ao, depth, radius=2)

    # -- Deferred lighting + sky ----------------------------------------------
    hdr = deferred_lighting(
        gb, frame_inputs['cam_pos'], frame_inputs['inv_view_proj'],
        frame_inputs['sun_direction'], frame_inputs['sun_color'],
        frame_inputs['sun_intensity'], shadow_mask=shadow_mask, ao=ao,
        gi_irradiance=gi_irradiance,
        sky_turbidity=settings.sky_turbidity,
        ambient_factor=settings.ambient_factor, sky_fn=sky_fn)
    if restir_light is not None:
        hdr = hdr + jnp.where((depth > 0)[..., None], restir_light, 0.0)

    # -- TransparentForward (the reference stubs this pass out — Setup
    #    returns false, BasePassRenderers.cpp:729 — here implemented with
    #    DEPTH-PEELED order-independent transparency: oit_layers extracts
    #    successive depth layers of the blend set, composited back to
    #    front, so stacked glass sorts correctly) -------------------------
    if (settings.enable_transparency and trans_pair_inst is not None
            and trans_pair_inst.shape[0] > 0):
        geo_t = geo_mod.meshlet_clip_triangles(
            scene, inst_world, frame_inputs['view_proj'],
            trans_pair_inst, trans_pair_meshlet)
        layers = []
        peel = None
        # layer-invariant setup/records/bins hoisted (see the masked
        # peel loop above)
        setup_t = records_t = bins_t = table_t = big_t = None
        if sp_mesh is None:
            setup_t = raster_mod.setup_triangles(geo_t, cfg)
            records_t = pack_resolve_records(
                setup_t, scene, inst_world, inst_adj, prev_inst_world,
                prev_vp)
            if use_pallas:
                bins_t = raster_mod.bin_pairs_stream(setup_t, cfg)
            else:
                table_t, _, big_t, _ = raster_mod.bin_triangles(setup_t,
                                                                cfg)
        for _layer in range(max(settings.oit_layers, 1)):
            if sp_mesh is not None:
                (_, recs_t2, depth_t, tid_t, interp_t,
                 _) = _raster_with_records(
                    scene, geo_t, cfg, use_pallas, inst_world, inst_adj,
                    prev_inst_world, prev_vp, sp_mesh=sp_mesh,
                    peel_depth=peel)
                rec_t = interp_t if interp_t is not None else recs_t2
            elif use_pallas:
                from toyrenderer_tpu.ops.raster_pallas import (
                    fill_resolve_stream)
                depth_t, tid_t, rec_t = fill_resolve_stream(
                    setup_t, records_t, bins_t, cfg, peel_depth=peel)
            else:
                depth_t, tid_t = raster_mod.fill_visibility(
                    setup_t, table_t, big_t, cfg, peel_depth=peel)
                rec_t = records_t
            gb_t = resolve_gbuffer(rec_t, depth_t, tid_t,
                                   frame_inputs['jitter'], cfg,
                                   atlas=atlas,
                                   num_textures=scene.num_textures,
                                   aniso=settings.texture_aniso,
                           emit_planes=not settings.pack_gbuffer)
            hdr_t = deferred_lighting(
                gb_t, frame_inputs['cam_pos'],
                frame_inputs['inv_view_proj'],
                frame_inputs['sun_direction'], frame_inputs['sun_color'],
                frame_inputs['sun_intensity'],
                gi_irradiance=gi_irradiance,
                sky_turbidity=settings.sky_turbidity,
                ambient_factor=settings.ambient_factor, sky_fn=sky_fn)
            alpha_t = gb_t['alpha']
            layers.append((depth_t, hdr_t, alpha_t))
            peel = depth_t
        for depth_t, hdr_t, alpha_t in reversed(layers):
            front = (depth_t > depth) & (depth_t > 0.0)
            blend = jnp.where(front, alpha_t, 0.0)[..., None]
            hdr = hdr * (1.0 - blend) + hdr_t * blend
    if settings.show_gi_probes and settings.enable_gi:
        hdr = ddgi_mod.visualize_probes(
            hdr, depth, ddgi_volume, gi_carry['ddgi_irradiance'],
            frame_inputs['view_proj_nojitter'], frame_inputs['cam_pos'],
            probe_offset=gi_carry['ddgi_offset'])

    # -- HDR post chain ---------------------------------------------------------
    new_carry = dict(
        prev_inst_world=inst_world,
        prev_depth=depth,
        frame_index=carry['frame_index'] + 1,
    )
    if settings.enable_culling:
        new_carry['hzb'] = new_hzb
    new_carry.update(rt_carry)
    new_carry.update(shadow_carry)
    new_carry.update(gi_carry)
    new_carry.update(restir_carry)
    aux = dict(depth=depth, tri_id=tri_id, motion=gb['motion'], hdr=hdr,
               resolved_pixels=jnp.sum((tri_id >= 0).astype(jnp.int32)),
               **cull_aux)
    if settings.enable_gi:
        aux['ddgi_variability'] = gi_carry['ddgi_variability']
        aux['ddgi_active_probes'] = jnp.sum(gi_carry['ddgi_state'])
        aux['ddgi_converged'] = gi_converged
    if shadow_mask is not None:
        aux['shadow'] = shadow_mask
    if sm_dropped is not None:
        # shadow-map bin overflow = silent light leaks; summed into the
        # bench 'dropped' telemetry like every bounded-amplification path
        aux['shadow_map_dropped'] = sm_dropped
    if ao is not None:
        aux['ao'] = ao
    if 'tex_feedback' in gb:
        aux['tex_feedback'] = gb['tex_feedback']
    if 'vt_tile_feedback' in gb:
        aux['vt_tile_feedback'] = gb['vt_tile_feedback']

    # Bloom (from the lighting output, pre-TAA: Scene.cpp pass order)
    bloom_tex = None
    if settings.enable_bloom:
        bloom_tex = bloom_mod.bloom(hdr, num_mips=settings.bloom_mips)
        aux['bloom'] = bloom_tex

    # AdaptLuminance: exposure carried across frames, no readback.
    # Frame 0 snaps straight to the target (scene-load adaptation).
    if settings.enable_auto_exposure:
        exposure, exp_aux = exposure_mod.adapt_exposure(
            hdr, carry['exposure'])
        exposure = jnp.where(carry['frame_index'] == 0,
                             exp_aux['target_exposure'], exposure)
        aux.update(exp_aux)
    else:
        exposure = carry['exposure']
    new_carry['exposure'] = exposure

    # TAA (history blend on HDR before tonemap, like the reference's
    # DLAA-style full-res path)
    aa = hdr
    if settings.enable_taa:
        aa, new_history = taa_mod.taa_resolve(
            hdr, gb['motion'], carry['taa_history'], carry['taa_valid'])
        new_carry['taa_history'] = new_history
        new_carry['taa_valid'] = jnp.asarray(1.0, jnp.float32)

    if settings.debug_mode != 0:
        extras = dict(motion=gb['motion'], uv=gb['uv'],
                      tex_desired_mip=gb.get('tex_desired_mip'),
                      shadow=shadow_mask, ao=ao, tri_id=tri_id)
        extras = {k: v for k, v in extras.items() if v is not None}
        dbg = debug_view(gb, settings.debug_mode, extras=extras)
        image = jnp.clip(dbg * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    else:
        image = compose_final(aa, exposure=exposure, bloom=bloom_tex,
                              bloom_strength=settings.bloom_strength)
    return image, new_carry, aux


def _gbuffer_two_phase(scene, inst_world, inst_adj, prev_inst_world,
                       frame_inputs, carry, pair_inst, pair_meshlet, cfg,
                       settings, use_pallas, sp_mesh=None):
    """GPU-driven 2-phase occlusion-culled GBuffer pass.

    Phase 1 (early): instances that pass frustum AND were visible against
    the PREVIOUS frame's HZB (tested with previous transforms,
    gpuculling.hlsl:143-146) render first.  An HZB is built from that
    depth.  Phase 2 (late): the early-occluded candidates re-test against
    the fresh HZB with current transforms; newly visible ones render on
    top.  The final HZB feeds next frame's early phase via the carry.
    """
    planes = frame_inputs['cull_frustum_planes']
    cam = frame_inputs['cull_cam_pos']
    psc = frame_inputs['proj_scale_px']
    w, h = settings.width, settings.height
    cap1 = pair_inst.shape[0]
    cap2 = max(int(cap1 * settings.late_capacity_frac), 64)

    # EARLY: cull vs prev HZB / prev transforms
    cull1 = cull_mod.cull_instances(
        scene, inst_world, planes, cam, psc, w, h,
        hzb=carry['hzb'],
        hzb_view_proj=frame_inputs['prev_view_proj_nojitter'],
        hzb_inst_world=prev_inst_world,
        error_threshold_px=settings.lod_error_px,
        forced_lod=settings.forced_lod)
    pi1, pm1, pv1, total1 = cull_mod.build_pairs(
        scene, cull1['visible'], cull1['lod'], cap1)
    pv1 = cull_mod.cull_meshlets(
        scene, pi1, pm1, pv1, inst_world, planes, cam, w, h,
        cone_cull=settings.enable_cone_culling)
    geo1 = geo_mod.meshlet_clip_triangles(
        scene, inst_world, frame_inputs['view_proj'], pi1, pm1, pv1)
    prev_vp = frame_inputs['prev_view_proj_nojitter']
    setup1, recs1, depth1, tid1, interp1, rs1 = _raster_with_records(
        scene, geo1, cfg, use_pallas, inst_world, inst_adj,
        prev_inst_world, prev_vp, padded_io=use_pallas, sp_mesh=sp_mesh)

    if use_pallas:
        from toyrenderer_tpu.ops.raster_pallas import crop_image
        depth1_img = crop_image(depth1, cfg)
    else:
        depth1_img = depth1
    hzb_mid = hzb_mod.build_hzb(depth1_img, w, h)

    # LATE: re-test early-occluded candidates vs the fresh HZB
    cull2 = cull_mod.cull_instances(
        scene, inst_world, planes, cam, psc, w, h,
        hzb=hzb_mid,
        hzb_view_proj=frame_inputs['view_proj_nojitter'],
        hzb_inst_world=inst_world,
        error_threshold_px=settings.lod_error_px,
        forced_lod=settings.forced_lod)
    late_mask = cull1['occluded_candidate'] & cull2['visible']
    pi2, pm2, pv2, total2 = cull_mod.build_pairs(
        scene, late_mask, cull2['lod'], cap2)
    pv2 = cull_mod.cull_meshlets(
        scene, pi2, pm2, pv2, inst_world, planes, cam, w, h,
        hzb=hzb_mid, hzb_view_proj=frame_inputs['view_proj_nojitter'],
        cone_cull=settings.enable_cone_culling)
    geo2 = geo_mod.meshlet_clip_triangles(
        scene, inst_world, frame_inputs['view_proj'], pi2, pm2, pv2)
    t1 = setup1['valid'].shape[0]
    setup2, recs2, depth, tri_id, interp, rs2 = _raster_with_records(
        scene, geo2, cfg, use_pallas, inst_world, inst_adj,
        prev_inst_world, prev_vp, init_depth=depth1, init_tri_id=tid1,
        init_rec=interp1, emit_base=t1, padded_io=use_pallas,
        sp_mesh=sp_mesh)

    if interp is not None:
        from toyrenderer_tpu.ops.raster_pallas import crop_image
        records = crop_image(interp, cfg)
        depth = crop_image(depth, cfg)
        tri_id = crop_image(tri_id, cfg)
    else:
        # CPU path: per-pixel gather over the concatenated phase records
        records = jnp.concatenate([recs1, recs2], axis=0)
    new_hzb = hzb_mod.build_hzb(depth, w, h)
    cull_aux = dict(
        early_instances=jnp.sum(cull1['visible'].astype(jnp.int32)),
        late_instances=jnp.sum(late_mask.astype(jnp.int32)),
        early_pairs=total1, late_pairs=total2,
        # pair-list capacity overflow (bounded amplification drops)
        early_pair_dropped=jnp.maximum(total1 - cap1, 0),
        late_pair_dropped=jnp.maximum(total2 - cap2, 0),
        early_meshlets=jnp.sum(pv1.astype(jnp.int32)),
        late_meshlets=jnp.sum(pv2.astype(jnp.int32)),
        **{f'early_{k}': v for k, v in rs1.items()},
        **{f'late_{k}': v for k, v in rs2.items()})
    return records, depth, tri_id, cull_aux, new_hzb


# --- packed frame inputs --------------------------------------------------
#
# The per-frame dynamic inputs are ~14 tiny arrays.  Uploading them one by
# one costs one host->device transfer RPC EACH — through the remote-TPU
# tunnel that measured ~50 ms of device idle PER FRAME (the device finishes
# the previous frame before the host has finished feeding the next one).
# The fix: every small dynamic field packs into ONE flat f32 vector on the
# host (one transfer), sliced back apart INSIDE the jit (free: XLA folds
# the slices into the consumers).  Node TRS arrays stay separate (shape
# depends on the scene) but are cached device-side by object identity —
# the rest pose uploads once; animation hands in fresh arrays per frame.

_FI_PACK = (
    ('sky_params', (10, 3)),
    ('view_proj', (4, 4)),
    ('view_proj_nojitter', (4, 4)),
    ('prev_view_proj_nojitter', (4, 4)),
    ('inv_view_proj', (4, 4)),
    ('cam_pos', (3,)),
    ('cull_frustum_planes', (5, 4)),
    ('cull_cam_pos', (3,)),
    ('proj_scale_px', ()),
    ('jitter', (2,)),
    ('sun_direction', (3,)),
    ('sun_color', (3,)),
    ('sun_intensity', ()),
    ('sun_view_proj', (4, 4)),
)
_FI_NODES = ('node_translation', 'node_rotation', 'node_scale')
_FI_SIZES = [int(np.prod(s)) if s else 1 for _, s in _FI_PACK]
_FI_TOTAL = sum(_FI_SIZES)

_node_dev_cache: dict = {}


def _dev_cached(key: str, v):
    """Device array for a host array, cached by object identity (keeps a
    reference to the source so ids cannot alias after gc)."""
    import jax as _jax
    if isinstance(v, _jax.Array):
        return v
    ck = (key, id(v))
    hit = _node_dev_cache.get(ck)
    if hit is not None and hit[0] is v:
        return hit[1]
    if len(_node_dev_cache) > 64:
        _node_dev_cache.clear()
    dev = jnp.asarray(v)
    _node_dev_cache[ck] = (v, dev)
    return dev


def pack_frame_inputs(fi: dict) -> dict:
    """Host-side: collapse the small dynamic fields of a frame_inputs
    dict into one f32 vector (single transfer).  Unknown extra keys pass
    through untouched; node TRS fields use the identity cache."""
    vec = np.empty(_FI_TOTAL, np.float32)
    off = 0
    for (name, shape), size in zip(_FI_PACK, _FI_SIZES):
        v = np.asarray(fi[name], np.float32)
        vec[off:off + size] = v.reshape(-1)
        off += size
    out = {'fi_vec': jnp.asarray(vec)}
    for k in _FI_NODES:
        out[k] = _dev_cached(k, fi[k])
    known = {n for n, _ in _FI_PACK} | set(_FI_NODES)
    for k, v in fi.items():
        if k not in known:
            out[k] = v
    return out


def unpack_frame_inputs(packed: dict) -> dict:
    """Traced inverse of pack_frame_inputs (slicing is free under XLA)."""
    vec = packed['fi_vec']
    fi = {k: v for k, v in packed.items() if k != 'fi_vec'}
    off = 0
    for (name, shape), size in zip(_FI_PACK, _FI_SIZES):
        v = vec[off:off + size]
        fi[name] = v.reshape(shape) if shape else v[0]
        off += size
    return fi


def _render_frame_packed(scene, pair_inst, pair_meshlet, packed_fi,
                         carry, **kw):
    return render_frame(scene, pair_inst, pair_meshlet,
                        unpack_frame_inputs(packed_fi), carry, **kw)


class _RenderFn:
    """Callable around the jitted frame: packs legacy frame_inputs dicts
    on the way in (one transfer instead of ~17); exposes .lower() for the
    shell's AOT prewarm."""

    def __init__(self, jitted):
        self._jitted = jitted

    @staticmethod
    def _prep(frame_inputs):
        if 'fi_vec' in frame_inputs:
            return frame_inputs
        return pack_frame_inputs(frame_inputs)

    def __call__(self, scene, pair_inst, pair_meshlet, frame_inputs,
                 carry, **kw):
        return self._jitted(scene, pair_inst, pair_meshlet,
                            self._prep(frame_inputs), carry, **kw)

    def lower(self, scene, pair_inst, pair_meshlet, frame_inputs, carry,
              **kw):
        return self._jitted.lower(scene, pair_inst, pair_meshlet,
                                  self._prep(frame_inputs), carry, **kw)


@functools.lru_cache(maxsize=32)
def make_render_fn(settings: RenderSettings, ddgi_volume=None,
                   donate_carry: bool = True):
    """Jitted frame function specialized on static settings (+ optional
    static DdgiVolume when GI is enabled).

    The carry argument is DONATED by default: every cross-frame state
    array (TAA/shadow history, DDGI probe textures, HZB, exposure)
    aliases its output in place instead of being copied each frame — the
    analogue of the reference's ping-pong double buffers costing nothing.
    Callers must rebind `carry` to the returned new_carry (all tools do);
    pass donate_carry=False to keep a carry alive across calls.

    Accepts frame_inputs either as the legacy per-field dict (packed
    automatically — one host->device transfer) or pre-packed via
    pack_frame_inputs.
    """
    return _RenderFn(jax.jit(
        functools.partial(_render_frame_packed, settings=settings,
                          ddgi_volume=ddgi_volume),
        donate_argnums=(4,) if donate_carry else ()))


def default_frame_inputs(scene_host, view_matrices: dict,
                         sky_turbidity: float = 2.5) -> dict:
    """Assemble frame_inputs from host scene + View.matrices() output.

    sky_params are the Hosek-Wilkie coefficients for this frame's sun
    elevation, evaluated host-side like the reference
    (SkyRenderer.cpp:55-128 runs on the CPU each frame too).

    Values are HOST numpy arrays: make_render_fn's wrapper packs the
    small dynamic fields into one device transfer per frame (an eager
    jnp.asarray per field costs one tunnel RPC each on the remote-TPU
    backend — measured ~50 ms/frame of device idle)."""
    from toyrenderer_tpu.ops.sky import hosek_sky_params
    f32 = np.float32
    sun = np.asarray(scene_host.sun_direction, dtype=float)
    return dict(
        sky_params=np.asarray(hosek_sky_params(sky_turbidity, -sun), f32),
        view_proj=np.asarray(view_matrices['view_proj'], f32),
        view_proj_nojitter=np.asarray(
            view_matrices['view_proj_nojitter'], f32),
        prev_view_proj_nojitter=np.asarray(
            view_matrices['prev_view_proj_nojitter'], f32),
        inv_view_proj=np.asarray(view_matrices['inv_view_proj'], f32),
        cam_pos=np.asarray(view_matrices['cam_pos'], f32),
        cull_frustum_planes=np.asarray(
            view_matrices['cull_frustum_planes'], f32),
        cull_cam_pos=np.asarray(view_matrices['cull_cam_pos'], f32),
        proj_scale_px=np.asarray(view_matrices['proj_scale_px'], f32),
        jitter=np.asarray(view_matrices['jitter'], f32),
        node_translation=np.asarray(scene_host.node_translation, f32),
        node_rotation=np.asarray(scene_host.node_rotation, f32),
        node_scale=np.asarray(scene_host.node_scale, f32),
        sun_direction=np.asarray(scene_host.sun_direction, f32),
        sun_color=np.asarray(scene_host.sun_color, f32),
        sun_intensity=np.asarray(scene_host.sun_intensity, f32),
        sun_view_proj=np.asarray(_sun_view_proj(scene_host), f32),
    )


def _sun_view_proj(scene_host):
    from toyrenderer_tpu.ops.shadowmap import sun_ortho_matrix
    return sun_ortho_matrix(scene_host.world_aabb,
                            scene_host.sun_direction)
