"""Benchmark: full-frame render at 1080p on a Sponza-class stress scene.

Prints ONE JSON line:
  {"metric": ..., "value": <median ms/frame>, "unit": "ms",
   "vs_baseline": <baseline_ms / value>}

Baseline: BASELINE.json north-star target of 30 ms/frame at 1080p on one
TPU chip (the reference publishes no numbers of its own — see BASELINE.md).
vs_baseline > 1.0 means faster than the target.

Extra diagnostic fields ride in the same JSON object (the driver only
requires the four keys above).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np

BASELINE_MS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    n_objects = int(os.environ.get("BENCH_OBJECTS", "192"))
    sphere_res = int(os.environ.get("BENCH_SPHERE_RES", "24"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))
    culling = os.environ.get("BENCH_CULLING", "1") == "1"
    textured = os.environ.get("BENCH_TEXTURED", "1") == "1"

    t0 = time.time()
    scene_host = make_stress_scene(n_objects=n_objects,
                                   sphere_res=sphere_res,
                                   textured=textured)
    build_s = time.time() - t0
    tri_count = int(scene_host.meshlet_tri_count[
        :scene_host.num_meshlets].sum())

    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    if culling:
        # in the culled path the static pair list only sets the compaction
        # CAPACITY (overflow drops, like the reference's bounded
        # amplification buffer) — LOD keeps the real count far below LOD0
        frac = float(os.environ.get("BENCH_PAIR_CAPACITY_FRAC", "0.6"))
        cap = max(int(len(pi) * frac), 256)
        pi, pm = pi[:cap], pm[:cap]
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)

    settings = RenderSettings(width=width, height=height,
                              manual_exposure=0.1,
                              enable_culling=culling)
    view = View.from_scene(scene_host, width, height)
    carry = init_carry(scene, settings)
    render = make_render_fn(settings)

    times = []
    compile_s = None
    for i in range(n_frames + 2):
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        t0 = time.time()
        image, carry, aux = render(scene, pi, pm, fi, carry)
        image.block_until_ready()
        dt = time.time() - t0
        view.advance(mats)
        if i == 0:
            compile_s = dt
        elif i >= 2:
            times.append(dt * 1000.0)

    ms = float(np.median(times))
    covered = float((np.asarray(aux['tri_id']) >= 0).mean())

    # Shadowed-frame time (default rasterized shadow-map technique) and
    # raw BVH ray throughput (BASELINE.json asks for ray metrics)
    rt = {}
    if os.environ.get("BENCH_RT", "1") == "1":
        rt_settings = RenderSettings(
            width=width, height=height, manual_exposure=0.1,
            enable_culling=culling, enable_shadows=True,
            shadow_technique='map')
        rt_render = make_render_fn(rt_settings)
        rt_carry = init_carry(scene, rt_settings)
        rt_times = []
        for i in range(4):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            t0 = time.time()
            image, rt_carry, aux2 = rt_render(scene, pi, pm, fi, rt_carry)
            image.block_until_ready()
            if i:
                rt_times.append(time.time() - t0)
            view.advance(mats)
        rt['shadowed_frame_ms'] = round(
            float(np.median(rt_times)) * 1000.0, 3)

        # raw any-hit ray throughput through the BVH (shadow-ray config)
        import jax.numpy as jnp
        from toyrenderer_tpu.ops import bvh as bvh_mod
        from toyrenderer_tpu.ops import geometry as G

        @jax.jit
        def trace_block(scene, fi):
            world = G.node_world_matrices(
                scene, fi['node_translation'], fi['node_rotation'],
                fi['node_scale'])
            iw, _ = G.instance_transforms(scene, world)
            v0, v1, v2, valid = bvh_mod.world_triangles(scene, iw, pi, pm)
            bvh = bvh_mod.build_bvh(v0, v1, v2, valid)
            n = 1 << 18
            ii = jnp.arange(n, dtype=jnp.float32)
            origins = jnp.stack([(ii % 512) / 512 * 60 - 30,
                                 jnp.zeros(n) + 0.5,
                                 (ii // 512) / 512 * 60 - 30], -1)
            dirs = jnp.broadcast_to(-fi['sun_direction'], (n, 3))
            res = bvh_mod.traverse(bvh, origins, dirs, t_max=1e4,
                                   max_steps=64, any_hit=True)
            return res['hit']
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        hit = trace_block(scene, fi)
        hit.block_until_ready()
        t0 = time.time()
        hit = trace_block(scene, fi)
        hit.block_until_ready()
        rt['rt_mrays_s'] = round((1 << 18) / (time.time() - t0) / 1e6, 2)
    pipeline = ("2-phase-culled GPU-driven deferred" if culling
                else "deferred")
    result = {
        "metric": f"ms/frame {width}x{height} {pipeline} "
                  f"(sponza-class {tri_count} tris, "
                  f"{scene_host.num_instances} instances)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
        "fps": round(1000.0 / ms, 2),
        "frames_timed": len(times),
        "min_ms": round(float(np.min(times)), 3),
        "compile_s": round(compile_s, 1),
        "scene_build_s": round(build_s, 2),
        "coverage": round(covered, 3),
        "device": str(jax.devices()[0]),
        **rt,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
