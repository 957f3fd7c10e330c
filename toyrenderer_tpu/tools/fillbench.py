"""Standalone fused-fill microbenchmark on the real frame workload.

Reproduces the deferred frame's early-phase raster inputs (courtyard,
culled pair list, 1080p) and times bin_pairs_stream / pack_resolve_records
/ fill_resolve_stream in isolation with honest readback fences — the
iteration harness for fill-kernel variants (the fill is the largest
single pass in the all-on frame: 80.5 ms of 1080p courtyard device time
at chunk 32).

Usage:
  python -m toyrenderer_tpu.tools.fillbench [--chunk 32] [--scene ...]
      [--reps 3] [--width 1920 --height 1080]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="resources/courtyard.glb")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--chunk", type=int, default=0,
                   help="raster chunk override (0 = settings default)")
    p.add_argument("--tile_h", type=int, default=0)
    p.add_argument("--slots_y", type=int, default=0)
    p.add_argument("--slots_x", type=int, default=0)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--trace", action="store_true",
                   help="dump an xplane trace of one rep of each stage "
                        "and print the per-op attribution")
    args = p.parse_args(argv)

    import jax

    from toyrenderer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from toyrenderer_tpu.engine import RenderSettings, View
    from toyrenderer_tpu.engine.frame import default_frame_inputs
    from toyrenderer_tpu.ops import geometry as geo_mod
    from toyrenderer_tpu.ops import raster as raster_mod
    from toyrenderer_tpu.ops.gbuffer import pack_resolve_records
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
    from toyrenderer_tpu.scene import load_scene

    scene_host = load_scene(args.scene)
    scene = scene_host.to_device()
    mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
    has_mask = len(mk_i) > 0
    pi, pm = static_meshlet_pairs(scene_host,
                                  'not_mask' if has_mask else 'all')
    cap = max(int(len(pi) * 0.6), 256)
    pi, pm = jnp.asarray(pi[:cap]), jnp.asarray(pm[:cap])

    kw = {}
    if args.chunk:
        kw["raster_chunk"] = args.chunk
    if args.tile_h:
        kw["tile_h"] = args.tile_h
    if args.slots_y:
        kw["bin_slots_y"] = args.slots_y
    if args.slots_x:
        kw["bin_slots_x"] = args.slots_x
    st = RenderSettings(width=args.width, height=args.height, **kw)
    cfg = st.raster_config()
    view = View.from_scene(scene_host, st.width, st.height)
    fi = default_frame_inputs(scene_host, view.matrices())

    interpret = jax.default_backend() not in ('tpu', 'axon')

    @jax.jit
    def prep(scene, fi):
        world = geo_mod.node_world_matrices(
            scene, fi['node_translation'], fi['node_rotation'],
            fi['node_scale'])
        iw, ia = geo_mod.instance_transforms(scene, world)
        g = geo_mod.meshlet_clip_triangles(scene, iw, fi['view_proj'],
                                           pi, pm)
        setup = raster_mod.setup_triangles(g, cfg)
        records = pack_resolve_records(
            setup, scene, iw, ia, iw, fi['prev_view_proj_nojitter'])
        return setup, records

    @jax.jit
    def bins_of(setup):
        return raster_mod.bin_pairs_stream(setup, cfg)

    def fill_fn(setup, records, bins):
        from toyrenderer_tpu.ops.raster_pallas import fill_resolve_stream
        return fill_resolve_stream(setup, records, bins, cfg,
                                   interpret=interpret)

    fill_jit = jax.jit(fill_fn)

    def fill_only_fn(setup, bins):
        # fill-only proxy: same streamed chunk grid, 16-wide records,
        # no record stash / one-hot fetch / interpolant epilogue —
        # the fused-kernel cost minus this is the epilogue+stream-width
        from toyrenderer_tpu.ops.raster_pallas import fill_peel_stream
        return fill_peel_stream(setup, bins, cfg, layers=1,
                                interpret=interpret)

    fill_only_jit = jax.jit(fill_only_fn)

    def force(x):
        # device-side reduction fence: transferring a full leaf through
        # the axon tunnel inside the timed region costs tens of ms
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

    def bench(label, f, *a):
        out = f(*a)
        force(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = f(*a)
            force(out)
            ts.append(time.time() - t0)
        print(f"{label:<28} {min(ts)*1e3:9.2f} ms", flush=True)
        return out

    CHAIN_REPS = 8

    def bench_chain(label, fn, perturb, *a):
        """Device-chained timing: CHAIN_REPS calls inside one jitted
        fori_loop with a scalar reduction and ONE readback — per-rep
        host fences pay the tunnel's 30-50 ms RTT *with high variance*
        and drowned <20% kernel A/Bs (round-4/5 lesson)."""
        @jax.jit
        def chain(*a):
            def body(k, acc):
                out = fn(*perturb(k, a))
                leaf = jax.tree.leaves(out)[0]
                return acc + jnp.sum(leaf.astype(jnp.float32))
            return jax.lax.fori_loop(0, CHAIN_REPS, body, 0.0)
        float(np.asarray(chain(*a)))          # compile
        float(np.asarray(chain(*a)))          # settle
        ts = []
        for _ in range(max(args.reps // 2, 2)):
            t0 = time.time()
            float(np.asarray(chain(*a)))
            ts.append((time.time() - t0) / CHAIN_REPS)
        print(f"{label:<28} {min(ts)*1e3:9.2f} ms  (chained x"
              f"{CHAIN_REPS})", flush=True)

    setup, records = bench("prep(setup+records)", prep, scene, fi)
    bins = bench("bin_pairs_stream", bins_of, setup)
    if args.trace:
        import jax.profiler
        tdir = "/tmp/fillbench_trace"
        with jax.profiler.trace(tdir):
            force(prep(scene, fi))
            force(bins_of(setup))
        from toyrenderer_tpu.tools.passes import aggregate_trace
        os.environ.setdefault('PASSES_DETAIL', 'GBufferResolve')
        table = aggregate_trace(tdir, 1)
        for k, v in sorted(table.items(),
                           key=lambda kv: -(kv[1] if isinstance(kv[1],
                                                                float)
                                            else 0)):
            print(f"  {k}: {v}")
    npairs = int(np.asarray(jnp.sum(bins['counts'])))
    nbig = int(np.asarray(jnp.sum((bins['big_list'] >= 0)
                                  .astype(jnp.int32))))
    nvalid = int(np.asarray(jnp.sum(setup['valid'].astype(jnp.int32))))
    print(f"workload: {nvalid} valid tris, {npairs} binned pairs, "
          f"{nbig} big, chunk={cfg.chunk}, tiles={cfg.num_tiles}")
    def _perturb(k, a):
        # vary the edge constant per rep (last-ulp depth changes) so XLA
        # cannot CSE the chained calls into one
        s = dict(a[0], edges=a[0]['edges']
                 + (k + 1).astype(jnp.float32) * 1e-12)
        return (s,) + a[1:]

    bench_chain("fill_only (chained)",
                lambda s, b: fill_only_fn(s, b), _perturb, setup, bins)
    if os.environ.get("FILLBENCH_ONLY", "0") == "1":
        return
    bench_chain("fill_resolve (chained)",
                lambda s, r, b: fill_fn(s, r, b), _perturb,
                setup, records, bins)
    out = bench("fill_resolve_stream", fill_jit, setup, records, bins)
    depth = np.asarray(out[0])
    print(f"coverage: {(np.asarray(out[1]) >= 0).mean():.3f}  "
          f"depth mean {depth.mean():.4f}")


if __name__ == "__main__":
    main()
