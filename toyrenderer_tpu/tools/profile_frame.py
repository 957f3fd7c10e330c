"""In-frame per-pass attribution from a real device trace.

The reference shows a per-renderer CPU/GPU ms table in its HUD
(source/Scene.cpp:530-562, fed by NVRHI timer queries per command list,
source/RenderGraph.cpp:264-287).  The TPU frame is ONE fused XLA program,
so per-pass numbers must come from a profiler trace of the real jitted
frame, not from separately-jitted stages (which each pay ~27 ms of remote
dispatch overhead in this environment).

This tool:
  1. renders the bench scene (or any glTF) under `jax.profiler.trace`,
  2. parses the Perfetto JSON the TPU plugin writes,
  3. aggregates device-op durations by op name, maps each op to the
     Python source line XLA recorded for it,
  4. buckets source lines into passes (culling / binning / fill / resolve
     / texture / lighting / post / ...) and prints the per-pass ms table.

Usage:
  python -m toyrenderer_tpu.tools.profile_frame            # bench scene
  python -m toyrenderer_tpu.tools.profile_frame --scene x.gltf --shadows
  ... --json out.json    (machine-readable dump)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


# pass buckets: substring of the source path/function -> pass name.
# first match wins; order matters (more specific first).
PASS_BUCKETS = (
    ("culling.py", "GPUCulling"),
    ("hzb.py", "HZB"),
    ("geometry.py", "Geometry/InstanceConsts"),
    ("raster_pallas.py", "Raster fill+resolve (Pallas)"),
    ("bin_triangles", "Raster binning"),
    ("setup_triangles", "Raster setup"),
    ("raster.py", "Raster other"),
    ("gbuffer.py", "GBuffer resolve"),
    ("texture.py", "Texture sampling"),
    ("bvh.py", "RT (BVH build+traverse)"),
    ("shadowmap.py", "ShadowMap"),
    ("shadows.py", "ShadowMask (RT)"),
    ("denoise.py", "Denoise"),
    ("ddgi.py", "DDGI"),
    ("restir.py", "ReSTIR"),
    ("gtao.py", "GTAO"),
    ("lighting.py", "DeferredLighting"),
    ("sky.py", "Sky"),
    ("bloom.py", "Bloom"),
    ("exposure.py", "AdaptLuminance"),
    ("taa.py", "TAA"),
    ("postprocess.py", "PostProcess"),
    ("frame.py", "Frame glue"),
)


def aggregate_trace(trace_dir: str, n_frames: int):
    """Parse the newest profile under trace_dir; return
    (per_op list[dict], per_pass dict[str, ms]) with ms per frame."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)

    durs = collections.Counter()     # op name -> total us
    srcs = {}
    # device ops live on TPU core tracks; host python events have no
    # 'source' arg.  Keep events that look like XLA ops (have args.source
    # or are named fusion/copy/etc on a device pid).
    device_pids = set()
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = (e.get("args") or {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA" in name:
                device_pids.add(e.get("pid"))
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e or not e.get("name"):
            continue
        if e["name"].startswith("jit_"):
            continue          # module umbrella event spans all child ops
        args = e.get("args") or {}
        on_device = e.get("pid") in device_pids if device_pids else True
        if not on_device and "source" not in args:
            continue
        durs[e["name"]] += e["dur"]
        if "source" in args:
            srcs[e["name"]] = args["source"]
        elif "tf_op" in args and e["name"] not in srcs:
            srcs[e["name"]] = args["tf_op"]

    per_op = []
    for name, us in durs.most_common():
        per_op.append(dict(op=name, ms_per_frame=us / 1e3 / n_frames,
                           source=srcs.get(name, "")))

    per_pass = collections.Counter()
    for rec in per_op:
        key = rec["source"] or rec["op"]
        bucket = "other"
        for sub, pname in PASS_BUCKETS:
            if sub in key:
                bucket = pname
                break
        per_pass[bucket] += rec["ms_per_frame"]
    return per_op, dict(per_pass)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default=None,
                   help="glTF path; default = procedural bench scene")
    p.add_argument("--objects", type=int, default=192)
    p.add_argument("--displayresolution", default="1920x1080")
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--shadows", action="store_true")
    p.add_argument("--gi", action="store_true")
    p.add_argument("--ao", action="store_true")
    p.add_argument("--taa", action="store_true")
    p.add_argument("--noculling", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default="/tmp/trtpu_frame_trace")
    p.add_argument("--json", default=None)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       "..", "..", ".jax_cache"))
    import jax
    from toyrenderer_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    w, h = (int(x) for x in args.displayresolution.split("x"))
    if args.scene:
        from toyrenderer_tpu.scene import load_scene
        scene_host = load_scene(args.scene)
    else:
        from toyrenderer_tpu.scene.procedural import make_stress_scene
        scene_host = make_stress_scene(n_objects=args.objects,
                                       sphere_res=24, textured=True)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    if not args.noculling:
        cap = max(int(len(pi) * 0.6), 256)
        pi, pm = pi[:cap], pm[:cap]
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)

    vol = None
    if args.gi:
        from toyrenderer_tpu.ops import ddgi
        vol = ddgi.volume_from_aabb(scene_host.world_aabb[0],
                                    scene_host.world_aabb[1])
    settings = RenderSettings(
        width=w, height=h, manual_exposure=0.1,
        enable_culling=not args.noculling,
        enable_shadows=args.shadows, enable_gi=args.gi,
        enable_ao=args.ao, enable_taa=args.taa)
    view = View.from_scene(scene_host, w, h)
    carry = init_carry(scene, settings, vol)
    render = make_render_fn(settings, vol)

    # warm up / compile outside the trace
    fi = default_frame_inputs(scene_host, view.matrices())
    img, carry, _ = render(scene, pi, pm, fi, carry)
    jax.block_until_ready(img)

    with jax.profiler.trace(args.out):
        for _ in range(args.frames):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry)
            jax.block_until_ready(img)
            view.advance(mats)

    per_op, per_pass = aggregate_trace(args.out, args.frames)
    total = sum(p["ms_per_frame"] for p in per_op)
    print(f"\n== per-pass ms/frame ({w}x{h}, {args.frames} frames) ==")
    for name, ms in sorted(per_pass.items(), key=lambda kv: -kv[1]):
        print(f"  {name:34s} {ms:8.2f} ms  ({100*ms/max(total,1e-9):4.1f}%)")
    print(f"  {'TOTAL device':34s} {total:8.2f} ms")
    print(f"\n== top {args.top} ops ==")
    for rec in per_op[:args.top]:
        print(f"  {rec['ms_per_frame']:8.3f} ms  {rec['op'][:40]:40s} "
              f"{rec['source'][-70:]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(per_pass=per_pass, per_op=per_op,
                           total_ms=total), f, indent=1)
        print(f"[json] wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
