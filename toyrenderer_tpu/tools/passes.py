"""In-frame per-pass timing table from a REAL device trace.

The reference shows a per-renderer GPU ms table in its HUD
(source/Scene.cpp:530-562, microprofile timestamps around each pass).
Here the frame is ONE fused XLA program, so pass boundaries are recovered
from the profiler trace instead: every device op carries HLO metadata
pointing at the Python source that built it, and each pass lives in its
own ops module — so aggregating op durations by source module yields the
per-pass table without breaking the single-jit design (unlike
tools/profile_stages.py, which jits stages separately and pays ~27 ms
dispatch per stage).

Usage:
  python -m toyrenderer_tpu.tools.passes --scene resources/cornell.gltf \
      --displayresolution 448x256 --frames 4 [--json out.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re

# source module -> pass label (reference renderer names where they map)
PASS_OF_MODULE = [
    ('ops/raster_pallas', 'BasePass(fill+resolve)'),
    ('ops/raster', 'BasePass(bin)'),
    ('ops/culling', 'GPUCulling'),
    ('ops/geometry', 'UpdateInstanceConsts'),
    ('ops/gbuffer', 'GBufferResolve'),
    ('ops/texture', 'TextureSampling'),
    ('ops/hzb', 'HZB(SPD)'),
    ('ops/lighting', 'DeferredLighting'),
    ('ops/brdf', 'DeferredLighting'),
    ('ops/shadowmap', 'ShadowMask'),
    ('ops/shadows', 'ShadowMask'),
    ('ops/denoise', 'Denoise'),
    ('ops/warp_pallas', 'Denoise'),   # TAA/denoise history warp kernel
    ('ops/gtao', 'AmbientOcclusion'),
    ('ops/ddgi', 'GI(DDGI)'),
    ('ops/bvh_pallas', 'RT(traverse)'),
    ('ops/bvh', 'RT(BVH build)'),
    ('ops/sky', 'Sky'),
    ('ops/bloom', 'Bloom'),
    ('ops/exposure', 'AdaptLuminance'),
    ('ops/taa', 'TAA'),
    ('ops/postprocess', 'PostProcess'),
    ('ops/restir', 'ReSTIR'),
    ('ops/packing', 'Pack/Unpack'),
    ('engine/frame', 'FrameGlue'),
    ('parallel/', 'MultiChip'),
]

_SRC_RE = re.compile(r'toyrenderer_tpu/([\w/]+)\.py')


def _pass_of(text: str) -> str | None:
    m = _SRC_RE.search(text)
    if not m:
        return None
    mod = m.group(1)
    for prefix, label in PASS_OF_MODULE:
        if mod.startswith(prefix):
            return label
    return f'other({mod})'


def aggregate_trace(trace_dir: str, frames: int) -> dict:
    """Parse the newest xplane.pb under trace_dir; return
    {pass: ms_per_frame} from the device plane's op events."""
    from toyrenderer_tpu.utils.xplane import parse_xspace, stat_values

    pbs = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.xplane.pb')),
        key=os.path.getmtime)
    if not pbs:
        raise FileNotFoundError(f'no xplane.pb under {trace_dir}')
    with open(pbs[-1], 'rb') as f:
        planes = parse_xspace(f.read())

    dev = [p for p in planes
           if ('TPU' in p['name'] or 'GPU' in p['name']
               or '/device:' in p['name'])
           and not p['name'].startswith('/host')]
    if not dev:                      # CPU backend: host-instr plane
        dev = [p for p in planes if p['lines']]
    by_pass = collections.Counter()
    unattributed = collections.Counter()
    # per-op drill of the PASSES_DETAIL pass(es) — comma-separated list
    detail = collections.defaultdict(collections.Counter)
    detail_passes = set(
        p for p in os.environ.get('PASSES_DETAIL', '').split(',') if p)
    total_ps = 0
    for p in dev:
        emd = p['event_metadata']
        # memoize: event metadata id -> pass label
        label_of = {}
        for mid, md in emd.items():
            text = md['name'] + ' ' + ' '.join(
                str(s.get('value', '')) for s in md.get('stats', []))
            label_of[mid] = _pass_of(text)
        for line in p['lines']:
            lname = line['name'].lower()
            # XLA op lines carry per-op spans; skip step/module summary
            # lines to avoid double counting
            if 'step' in lname or 'module' in lname:
                continue
            for ev in line['events']:
                lab = label_of.get(ev['metadata_id'])
                dur = ev['duration_ps']
                total_ps += dur
                if lab:
                    by_pass[lab] += dur
                    if lab in detail_passes:
                        md = emd.get(ev['metadata_id'], {})
                        nm = md.get('name', '?')
                        detail[lab][nm[:120]] += dur
                else:
                    nm = emd.get(ev['metadata_id'], {}).get('name', '?')
                    unattributed[nm[:200]] += dur
    # device busy vs idle: union of op intervals on each device line —
    # wall-vs-attributed gaps are either overlapped async copies (fine)
    # or real dispatch stalls (not fine); this tells them apart
    busy_ps = 0
    span_ps = 0
    for p in dev:
        for line in p['lines']:
            lname = line['name'].lower()
            if 'step' in lname or 'module' in lname:
                continue
            iv = sorted((ev['offset_ps'],
                         ev['offset_ps'] + ev['duration_ps'])
                        for ev in line['events'])
            if not iv:
                continue
            merged_busy = 0
            cur_s, cur_e = iv[0]
            for s, e in iv[1:]:
                if s > cur_e:
                    merged_busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            merged_busy += cur_e - cur_s
            busy_ps += merged_busy
            span_ps += iv[-1][1] - iv[0][0]

    out = {k: v / 1e9 / frames for k, v in by_pass.items()}
    out['_busy'] = busy_ps / 1e9 / frames
    out['_span'] = span_ps / 1e9 / frames
    out['_unattributed'] = sum(unattributed.values()) / 1e9 / frames
    out['_unattributed_top'] = {
        k: round(v / 1e9 / frames, 3)
        for k, v in unattributed.most_common(8)}
    out['_total'] = total_ps / 1e9 / frames
    if detail_passes:
        out['_detail'] = {
            lab: {k: round(v / 1e9 / frames, 3)
                  for k, v in cnt.most_common(14)}
            for lab, cnt in detail.items()}
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="resources/cornell.gltf")
    p.add_argument("--displayresolution", default="448x256")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--trace-dir", default="/tmp/toyrenderer_passes")
    p.add_argument("--platform", default=None)
    p.add_argument("--json", default=None)
    p.add_argument("--shadows", action="store_true")
    p.add_argument("--full", action="store_true",
                   help="everything on: shadows + GI + AO + TAA + bloom "
                        "+ auto exposure")
    p.add_argument("--stress", action="store_true",
                   help="bench.py's procedural sponza-class scene + "
                        "2-phase culling (ignores --scene)")
    p.add_argument("--norefit", action="store_true",
                   help="A/B: rebuild the BVH per frame instead of "
                        "refitting the static topology")
    p.add_argument("--culling", action="store_true",
                   help="2-phase culling + bench.py's 0.6 pair-capacity "
                        "(the courtyard bench config)")
    p.add_argument("--peelmerge", type=float, default=0.0,
                   help="peel_merge_frac (0 = dense per-layer "
                        "resolve)")
    args = p.parse_args(argv)

    import jax

    from toyrenderer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    w, h = (int(x) for x in args.displayresolution.split("x"))
    if args.stress:
        from toyrenderer_tpu.scene.procedural import make_stress_scene
        scene_host = make_stress_scene(n_objects=192, sphere_res=24,
                                       textured=True)
    else:
        scene_host = load_scene(args.scene)
    scene = scene_host.to_device()
    mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
    has_mask = len(mk_i) > 0
    pi, pm = static_meshlet_pairs(scene_host,
                                  'not_mask' if has_mask else 'all')
    if args.stress or args.culling:
        cap = max(int(len(pi) * 0.6), 256)
        pi, pm = pi[:cap], pm[:cap]
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    mk_i = jnp.asarray(mk_i) if has_mask else None
    mk_m = jnp.asarray(mk_m) if has_mask else None
    settings = RenderSettings(width=w, height=h,
                              manual_exposure=0.1 if args.stress else 0.01,
                              enable_culling=args.stress or args.culling,
                              enable_shadows=args.shadows or args.full,
                              enable_ao=args.full, enable_gi=args.full,
                              # mirror bench.py's all-on config: probes
                              # update in 4 phased blocks per frame
                              gi_update_phases=4 if args.full else 1,
                              enable_taa=args.full,
                              enable_bloom=args.full,
                              enable_auto_exposure=args.full,
                              peel_merge_frac=args.peelmerge)
    ddgi_volume = None
    if args.full:
        from toyrenderer_tpu.ops.ddgi import volume_from_aabb
        ddgi_volume = volume_from_aabb(
            scene_host.world_aabb[0], scene_host.world_aabb[1])
    rt_static = None
    rt_static_gi = gi_pi = gi_pm = None
    if args.full and not args.norefit:
        from toyrenderer_tpu.ops.bvh_sah import (build_rt_static_auto,
                                                 build_rt_static_gi)
        rt_static = build_rt_static_auto(
            scene_host, pi, pm,
            mask_pair_inst=mk_i, mask_pair_meshlet=mk_m)
        if os.environ.get("TR_GI_TREE", "1") == "1":
            gs, gp_i, gp_m, gl = build_rt_static_gi(
                scene_host, 'not_mask' if has_mask else 'all',
                mask_pair_inst=mk_i, mask_pair_meshlet=mk_m)
            if gl > 0 or type(gs) is not type(rt_static):
                rt_static_gi, gi_pi, gi_pm = gs, gp_i, gp_m
                print(f"[rt] GI topology LOD{gl}: "
                      f"{gs.payload.shape[0]} tri slots")
    view = View.from_scene(scene_host, w, h)
    carry = init_carry(scene, settings, ddgi_volume,
                       rt_static=rt_static, rt_static_gi=rt_static_gi,
                       pair_inst=pi, pair_meshlet=pm,
                       gi_pair_inst=gi_pi, gi_pair_meshlet=gi_pm,
                       mask_pair_inst=mk_i, mask_pair_meshlet=mk_m)
    render = make_render_fn(settings, ddgi_volume)

    fi = default_frame_inputs(scene_host, view.matrices())
    img, carry, _ = render(scene, pi, pm, fi, carry, mask_pair_inst=mk_i,
                           mask_pair_meshlet=mk_m,
                           rt_static=rt_static, rt_static_gi=rt_static_gi,
                           gi_pair_inst=gi_pi,
                           gi_pair_meshlet=gi_pm)   # compile outside
    img.block_until_ready()

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.frames):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry,
                                   mask_pair_inst=mk_i,
                                   mask_pair_meshlet=mk_m,
                                   rt_static=rt_static,
                                   rt_static_gi=rt_static_gi,
                                   gi_pair_inst=gi_pi,
                                   gi_pair_meshlet=gi_pm)
            img.block_until_ready()
            view.advance(mats)

    table = aggregate_trace(args.trace_dir, args.frames)
    width = max(len(k) for k in table) + 2
    print(f"{'pass':<{width}} ms/frame")
    shown = {k: v for k, v in table.items() if not k.startswith('_')}
    for k, v in sorted(shown.items(), key=lambda kv: -kv[1]):
        print(f"{k:<{width}} {v:8.3f}")
    print(f"{'(unattributed)':<{width}} "
          f"{table['_unattributed']:8.3f}   "
          f"{table['_unattributed_top']}")
    print(f"{'TOTAL device':<{width}} {table['_total']:8.3f}")
    print(f"{'BUSY (union)':<{width}} {table['_busy']:8.3f}   "
          f"span {table['_span']:.3f}")
    if '_detail' in table:
        for lab, rows in table['_detail'].items():
            print(f"[detail {lab}]")
            for k, v in rows.items():
                print(f"   {v:8.3f}  {k}")
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(table, f, indent=1, default=str)
        print(f"[passes] wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
