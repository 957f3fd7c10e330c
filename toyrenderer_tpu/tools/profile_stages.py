"""Per-stage timing harness (the per-renderer ms table equivalent,
Scene.cpp:530-562).  Jits each pipeline stage separately and times it on
the current device; prints a ms table.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python -m \
    toyrenderer_tpu.tools.profile_stages [--small]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, *args, n=5):
    import jax
    from toyrenderer_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) * 1000)
    return float(np.median(ts)), out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--objects", type=int, default=192)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import default_frame_inputs
    from toyrenderer_tpu.ops import geometry as G
    from toyrenderer_tpu.ops import raster as R
    from toyrenderer_tpu.ops.gbuffer import (
        pack_resolve_records, resolve_gbuffer)
    from toyrenderer_tpu.ops.lighting import deferred_lighting
    from toyrenderer_tpu.ops.postprocess import compose_final
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    if args.small:
        args.objects, args.width, args.height = 32, 448, 256

    scene_host = make_stress_scene(n_objects=args.objects, sphere_res=24)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    settings = RenderSettings(width=args.width, height=args.height,
                              manual_exposure=0.1)
    cfg = settings.raster_config()
    view = View.from_scene(scene_host, args.width, args.height)
    fi = default_frame_inputs(scene_host, view.matrices())
    carry = init_carry(scene, settings)

    print(f"device={jax.devices()[0]}  {args.width}x{args.height}  "
          f"pairs={pi.shape[0]}  tris={pi.shape[0]*96}")

    # stage 1: transforms
    f_world = jax.jit(lambda s, t, r, sc: G.node_world_matrices(s, t, r, sc))
    ms, world = _timeit(f_world, scene, fi['node_translation'],
                        fi['node_rotation'], fi['node_scale'])
    print(f"node_world_matrices   {ms:8.2f} ms")

    f_inst = jax.jit(G.instance_transforms)
    ms, (iw, iadj) = _timeit(f_inst, scene, world)
    print(f"instance_transforms   {ms:8.2f} ms")

    f_geo = jax.jit(lambda s, w, vp: G.meshlet_clip_triangles(
        s, w, vp, pi, pm))
    ms, geo = _timeit(f_geo, scene, iw, fi['view_proj'])
    print(f"meshlet_clip          {ms:8.2f} ms")

    f_setup = jax.jit(lambda g: R.setup_triangles(g, cfg))
    ms, setup = _timeit(f_setup, geo)
    print(f"setup_triangles       {ms:8.2f} ms")

    f_bin = jax.jit(lambda s: R.bin_triangles(s, cfg))
    ms, (table, counts, big) = _timeit(f_bin, setup)
    print(f"bin_triangles         {ms:8.2f} ms   "
          f"max/tile={int(np.asarray(counts).max())} "
          f"big={int((np.asarray(big) >= 0).sum())}")

    f_fill = jax.jit(lambda s, t, b: R.fill_visibility(s, t, b, cfg))
    ms, (depth, tid) = _timeit(f_fill, setup, table, big)
    print(f"fill_visibility       {ms:8.2f} ms   "
          f"coverage={float((np.asarray(tid) >= 0).mean()):.2f}")

    f_pack = jax.jit(lambda s, w_, ia, piw: pack_resolve_records(
        s, scene, w_, ia, piw, fi['prev_view_proj_nojitter']))
    ms, records = _timeit(f_pack, setup, iw, iadj, iw)
    print(f"pack_resolve_records  {ms:8.2f} ms")

    f_resolve = jax.jit(lambda r, d, t: resolve_gbuffer(
        r, d, t, fi['jitter'], cfg))
    ms, gb = _timeit(f_resolve, records, depth, tid)
    print(f"resolve_gbuffer       {ms:8.2f} ms")

    f_light = jax.jit(lambda gb: deferred_lighting(
        gb, fi['cam_pos'], fi['inv_view_proj'], fi['sun_direction'],
        fi['sun_color'], fi['sun_intensity']))
    ms, hdr = _timeit(f_light, gb)
    print(f"deferred_lighting+sky {ms:8.2f} ms")

    f_post = jax.jit(lambda h: compose_final(h, exposure=0.1))
    ms, img = _timeit(f_post, hdr)
    print(f"postprocess           {ms:8.2f} ms")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
