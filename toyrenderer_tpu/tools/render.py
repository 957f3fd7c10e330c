"""Headless renderer CLI: load a glTF scene, render N frames, save PNGs.

The engine-shell equivalent (source/Engine.cpp MainLoop) for a TPU host:
no window/ImGui — frames go to PNG, per-pass stats go to stdout.  Flag
names mirror the reference's CLI options (source/Engine.cpp:17-19,
Graphic.cpp:22-25, SceneLoading.cpp:17-18) where they exist.

Usage:
  python -m toyrenderer_tpu.tools.render --scene resources/cornell.gltf \
      --displayresolution 1280x720 --frames 1 --output /tmp/out.png
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="resources/cornell.gltf")
    p.add_argument("--displayresolution", default="1280x720",
                   help="WxH render resolution")
    p.add_argument("--customscenescale", type=float, default=1.0)
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--output", default="/tmp/toyrenderer_out.png")
    p.add_argument("--debugview", type=int, default=0,
                   help="0=lit, 1=albedo, 2=normal, 6=depth, 11=meshlet ...")
    p.add_argument("--bruteforceraster", action="store_true")
    p.add_argument("--nocache", action="store_true",
                   help="bypass the scene build cache")
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--bloom", action="store_true")
    p.add_argument("--autoexposure", action="store_true")
    p.add_argument("--taa", action="store_true")
    p.add_argument("--culling", action="store_true",
                   help="2-phase GPU-driven occlusion culling + LOD")
    p.add_argument("--shadows", action="store_true",
                   help="ray-traced denoised sun shadows")
    p.add_argument("--shadowtechnique", choices=("map", "rt"),
                   default="rt", help="sun shadows: BVH rt (reference technique) | raster map")
    p.add_argument("--ao", action="store_true", help="GTAO")
    p.add_argument("--gi", action="store_true", help="DDGI probe GI")
    p.add_argument("--showprobes", action="store_true",
                   help="GI probe visualization overlay")
    p.add_argument("--restir", action="store_true", help="ReSTIR DI")
    p.add_argument("--transparency", action="store_true",
                   help="forward alpha-blend pass")
    p.add_argument("--oitlayers", type=int, default=1,
                   help="depth-peeled OIT layers for the blend set")
    p.add_argument("--giraysperprobe", type=int, default=64)
    p.add_argument("--animate", action="store_true",
                   help="play scene animations at 60 fps frame steps")
    p.add_argument("--orbit", type=float, default=0.0,
                   help="orbit the camera by this many radians/frame "
                        "(exercises TAA/motion/denoiser history)")
    p.add_argument("--aniso", type=int, default=1,
                   help="anisotropic filtering taps (1 = off; >1 uses "
                        "the per-pixel sampler instead of quad taps)")
    p.add_argument("--vtstream", choices=("off", "mip", "tile"),
                   default="off",
                   help="virtual-texture streaming: per-mip residency "
                        "or 64x64-texel tiles with spatial feedback "
                        "(TextureFeedbackManager parity)")
    p.add_argument("--vtpool", type=int, default=64,
                   help="tile-pool budget (tiles) / mip-pool budget "
                        "(x64K texel rows) for --vtstream")
    p.add_argument("--forcedlod", type=int, default=-1)
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu for software-WARP parity)")
    p.add_argument("--stats", default=None,
                   help="write per-frame stats JSON to this path")
    p.add_argument("--passtable", action="store_true",
                   help="print the per-pass device-ms table after the "
                        "run (one traced extra frame; the reference "
                        "shows this every frame, Scene.cpp:530-562)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        from toyrenderer_tpu.utils.cache import enable_compile_cache
        enable_compile_cache()
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import (
        View, RenderSettings, init_carry)
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    w, h = (int(x) for x in args.displayresolution.split("x"))

    t0 = time.time()
    if args.scene == "stress":
        # procedural sponza-class scene (the bench scene): textured
        # spheres/boxes — handy for texture/VT/culling demos without
        # shipping large assets
        from toyrenderer_tpu.scene.procedural import make_stress_scene
        scene_host = make_stress_scene(n_objects=64, sphere_res=16,
                                       textured=True)
    else:
        scene_host = load_scene(args.scene, scale=args.customscenescale,
                                use_cache=not args.nocache)
    print(f"[scene] {args.scene}: {scene_host.num_vertices} verts, "
          f"{scene_host.num_meshlets} meshlets, "
          f"{scene_host.num_instances} instances "
          f"({time.time() - t0:.2f}s)")

    scene = scene_host.to_device()
    # alpha-mode set split (reference base-pass sets)
    mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
    has_mask = mk_i.shape[0] > 0
    if has_mask and args.transparency:
        opaque_filter = 'opaque_strict'     # masked + blend split out
    elif has_mask:
        opaque_filter = 'not_mask'          # masked split out, blend inline
    elif args.transparency:
        opaque_filter = 'opaque'            # blend split out
    else:
        opaque_filter = 'all'
    pair_inst, pair_meshlet = static_meshlet_pairs(scene_host,
                                                   opaque_filter)
    pair_inst = jnp.asarray(pair_inst)
    pair_meshlet = jnp.asarray(pair_meshlet)
    mk_i = jnp.asarray(mk_i) if has_mask else None
    mk_m = jnp.asarray(mk_m) if has_mask else None
    if has_mask:
        print(f"[alpha-test] {mk_i.shape[0]} masked pairs")
    tp_i = tp_m = None
    if args.transparency:
        tp_i, tp_m = static_meshlet_pairs(scene_host, 'blend')
        tp_i, tp_m = jnp.asarray(tp_i), jnp.asarray(tp_m)
        print(f"[transparency] {tp_i.shape[0]} blend pairs")

    settings = RenderSettings(
        width=w, height=h, debug_mode=args.debugview,
        manual_exposure=args.exposure,
        enable_bloom=args.bloom,
        enable_auto_exposure=args.autoexposure,
        enable_taa=args.taa,
        enable_culling=args.culling,
        enable_shadows=args.shadows,
        shadow_technique=args.shadowtechnique,
        enable_ao=args.ao,
        enable_gi=args.gi,
        show_gi_probes=args.showprobes,
        enable_restir=args.restir,
        enable_transparency=args.transparency,
        oit_layers=args.oitlayers,
        forced_lod=args.forcedlod,
        texture_aniso=args.aniso,
        use_bruteforce_raster=args.bruteforceraster)
    ddgi_volume = None
    if args.gi:
        from toyrenderer_tpu.ops.ddgi import volume_from_aabb
        ddgi_volume = volume_from_aabb(
            scene_host.world_aabb[0], scene_host.world_aabb[1],
            rays_per_probe=args.giraysperprobe)
        print(f"[gi] probe grid {ddgi_volume.counts}, "
              f"{ddgi_volume.num_probes} probes x "
              f"{ddgi_volume.rays_per_probe} rays")
    # static RT topology (BLAS-cache analogue): built once, refit per frame
    rt_static = None
    if args.gi or args.restir or args.shadows:
        # built for 'map' shadows too: the sun-map raster consumes the
        # masked-set coverage keep (cutout casters)
        from toyrenderer_tpu.ops.bvh_sah import build_rt_static_auto
        t0 = time.time()
        rt_static = build_rt_static_auto(
            scene_host, pair_inst, pair_meshlet,
            mask_pair_inst=mk_i, mask_pair_meshlet=mk_m)
        kind = ('sah' if hasattr(rt_static, 'depth_ranges')
                else 'complete')
        print(f"[rt] static topology ({kind}): "
              f"{rt_static.payload.shape[0]} tri slots "
              f"({time.time() - t0:.2f}s)")
    # GI-dedicated topology (LOD-reduced + SAH-preferred): only worth a
    # second tree when it actually differs from the main one
    rt_static_gi = gi_pi = gi_pm = None
    if args.gi and rt_static is not None:
        from toyrenderer_tpu.ops.bvh_sah import build_rt_static_gi
        t0 = time.time()
        gi_static, g_pi, g_pm, gi_lod = build_rt_static_gi(
            scene_host, opaque_filter, mask_pair_inst=mk_i,
            mask_pair_meshlet=mk_m)
        if gi_lod > 0 or type(gi_static) is not type(rt_static):
            rt_static_gi, gi_pi, gi_pm = gi_static, g_pi, g_pm
            gkind = ('sah' if hasattr(gi_static, 'depth_ranges')
                     else 'complete')
            print(f"[rt] GI topology ({gkind}, LOD{gi_lod}): "
                  f"{gi_static.payload.shape[0]} tri slots "
                  f"({time.time() - t0:.2f}s)")
    view = View.from_scene(scene_host, w, h)
    carry = init_carry(scene, settings, ddgi_volume)
    render = make_render_fn(settings, ddgi_volume)

    # virtual-texture streaming: residency overrides ride frame_inputs
    # from frame 0 (constant shapes -> one trace); device feedback from
    # aux drives the next update (TextureFeedbackManager.cpp loop parity)
    stream_mgr = None
    stream_overrides = {}
    if args.vtstream != "off" and scene_host.num_textures > 0:
        from toyrenderer_tpu.scene.textures import TextureAtlas
        atlas_h = TextureAtlas(
            texels=scene_host.tex_texels,
            desc_offset=scene_host.tex_offset,
            desc_width=scene_host.tex_width,
            desc_height=scene_host.tex_height,
            num_mips=scene_host.tex_num_mips,
            wrap_mode=scene_host.tex_wrap,
            min_resident_mip=scene_host.tex_min_mip,
            num_textures=scene_host.num_textures)
        if args.vtstream == "mip":
            from toyrenderer_tpu.engine.streaming import (
                TextureStreamingManager)
            stream_mgr = TextureStreamingManager(
                atlas_h, pool_texels=args.vtpool << 16)
            stream_overrides = stream_mgr.update(
                np.full(scene_host.num_textures, np.inf))
        else:
            from toyrenderer_tpu.engine.streaming import (
                TileStreamingManager)
            stream_mgr = TileStreamingManager(atlas_h,
                                              pool_tiles=args.vtpool)
            stream_overrides = stream_mgr.update(
                np.full(stream_mgr.table_size, np.inf))
        print(f"[vt] {args.vtstream}-granularity streaming, "
              f"pool budget {args.vtpool}")

    player = None
    if args.animate:
        from toyrenderer_tpu.scene.animation import AnimationPlayer
        player = AnimationPlayer(scene_host.animation_data())
        print(f"[anim] {player.data.num_channels} channels, "
              f"{player.data.duration:.2f}s")

    image = None
    stats_rows = []
    for i in range(args.frames):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        fi.update(stream_overrides)
        if player is not None and player.enabled:
            t, r, s = player.evaluate(
                i / 60.0, scene_host.node_translation,
                scene_host.node_rotation, scene_host.node_scale)
            # host numpy: the render-fn wrapper uploads node arrays
            # itself (identity-cached; fresh animation arrays re-upload)
            fi['node_translation'] = np.asarray(t, np.float32)
            fi['node_rotation'] = np.asarray(r, np.float32)
            fi['node_scale'] = np.asarray(s, np.float32)
        t0 = time.time()
        image, carry, aux = render(scene, pair_inst, pair_meshlet, fi,
                                   carry, trans_pair_inst=tp_i,
                                   trans_pair_meshlet=tp_m,
                                   mask_pair_inst=mk_i,
                                   mask_pair_meshlet=mk_m,
                                   rt_static=rt_static,
                                   rt_static_gi=rt_static_gi,
                                   gi_pair_inst=gi_pi,
                                   gi_pair_meshlet=gi_pm)
        image.block_until_ready()
        dt = (time.time() - t0) * 1000
        view.advance(mats)
        if args.orbit:
            view.rotate_yaw_pitch(args.orbit, 0.0)
        label = "compile+run" if i == 0 else "frame"
        print(f"[frame {i}] {label}: {dt:.2f} ms")
        if stream_mgr is not None:
            fb_key = ('vt_tile_feedback' if args.vtstream == 'tile'
                      else 'tex_feedback')
            stream_overrides = stream_mgr.update(np.asarray(aux[fb_key]))
            if args.stats:
                print(f"[vt] {stream_mgr.stats}")
        if args.stats:
            rec = dict(frame=i, ms=round(dt, 3),
                       coverage=round(float(
                           (np.asarray(aux['tri_id']) >= 0).mean()), 4),
                       exposure=float(carry['exposure']))
            mem = getattr(jax.devices()[0], 'memory_stats',
                          lambda: None)()
            if mem:    # device memory telemetry (reference HUD VRAM row)
                rec['hbm_mb'] = round(mem.get('bytes_in_use', 0) / 2**20)
                rec['hbm_peak_mb'] = round(
                    mem.get('peak_bytes_in_use', 0) / 2**20)
            for k in ('early_instances', 'late_instances',
                      'early_meshlets', 'late_meshlets'):
                if k in aux:
                    rec[k] = int(aux[k])
            if 'tex_feedback' in aux:
                fb = np.asarray(aux['tex_feedback'])
                rec['tex_feedback_min'] = float(np.nanmin(
                    np.where(np.isfinite(fb), fb, np.nan)))
            stats_rows.append(rec)

    from PIL import Image
    img = np.asarray(image)
    Image.fromarray(img).save(args.output)
    print(f"[out] wrote {args.output} ({img.shape[1]}x{img.shape[0]})")
    npx = int(np.sum(np.asarray(aux['tri_id']) >= 0))
    print(f"[stats] covered pixels: {npx}/{w*h} "
          f"({100.0*npx/(w*h):.1f}%)")
    if args.stats:
        import json
        with open(args.stats, "w") as f:
            json.dump(stats_rows, f, indent=1)
        print(f"[stats] wrote {args.stats}")
    if args.passtable:
        # per-pass device-ms table (the reference's per-renderer HUD
        # table, Scene.cpp:530-562): one extra frame under the profiler
        import tempfile
        tdir = tempfile.mkdtemp(prefix="tr_passes_")
        import jax.profiler
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        fi.update(stream_overrides)
        with jax.profiler.trace(tdir):
            img2, carry, _ = render(scene, pair_inst, pair_meshlet, fi,
                                    carry, trans_pair_inst=tp_i,
                                    trans_pair_meshlet=tp_m,
                                    mask_pair_inst=mk_i,
                                    mask_pair_meshlet=mk_m,
                                    rt_static=rt_static,
                                    rt_static_gi=rt_static_gi,
                                    gi_pair_inst=gi_pi,
                                    gi_pair_meshlet=gi_pm)
            img2.block_until_ready()
        from toyrenderer_tpu.tools.passes import aggregate_trace
        table = aggregate_trace(tdir, 1)
        print("[passes] pass                              device ms")
        for k, v in sorted(table.items(),
                           key=lambda kv: -(kv[1] if isinstance(
                               kv[1], float) else 0)):
            if isinstance(v, float) and not k.startswith('_'):
                print(f"[passes] {k:<36} {v:9.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
