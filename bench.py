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

    # RT throughput (Mrays/s): shadow pass = 1 ray/pixel (BASELINE.json
    # asks for ray metrics alongside ms/frame)
    rt = {}
    if os.environ.get("BENCH_RT", "1") == "1":
        rt_settings = RenderSettings(
            width=width, height=height, manual_exposure=0.1,
            enable_shadows=True)
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
        rt_ms = float(np.median(rt_times)) * 1000.0
        rays = width * height
        rt['rt_frame_ms'] = round(rt_ms, 3)
        rt['shadow_mrays_s'] = round(
            rays / ((rt_ms - ms) * 1e3 + 1e-6), 2)
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
