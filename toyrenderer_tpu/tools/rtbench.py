"""Ray-traversal microbenchmark: Mrays/s through the Pallas packet kernel.

Drives the exact ray populations the frame produces (shadowmask.hlsl /
giprobetrace.hlsl parity):
  * shadow: 64x64-pixel-tile-ordered any-hit sun rays from surface points
    (ops/shadows.py packs rays this way)
  * probe: direction-major closest-hit rays from a DDGI probe grid
    (ops/ddgi.py trace layout)

Usage:
  python -m toyrenderer_tpu.tools.rtbench [--rays 1048576] [--scene stress]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")


def ray_sets(n_rays, aabb_lo, aabb_hi, sun_dir):
    """Shadow-style and probe-style ray sets over the scene bounds."""
    import numpy as np
    ext = aabb_hi - aabb_lo
    side = int(np.sqrt(n_rays))

    # shadow: ground-plane origins in 64x64 tiles (matches
    # ops/shadows.py to_blocks packing), shared sun direction + tiny
    # per-ray cone jitter
    t = 64
    g = side // t
    ty, tx = np.divmod(np.arange(g * g), g)
    yy, xx = np.divmod(np.arange(t * t), t)
    gy = (ty[:, None] * t + yy[None, :]).reshape(-1)
    gx = (tx[:, None] * t + xx[None, :]).reshape(-1)
    ox = aabb_lo[0] + (gx + 0.5) / side * ext[0]
    oz = aabb_lo[2] + (gy + 0.5) / side * ext[2]
    oy = np.full_like(ox, aabb_lo[1] + 0.02 * ext[1])
    sh_o = np.stack([ox, oy, oz], -1).astype(np.float32)
    rng = np.random.default_rng(0)
    jit = rng.normal(scale=0.004, size=(len(ox), 3))
    d = -sun_dir[None] + jit
    sh_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(
        np.float32)

    # probe: the EXACT traversal stream ops/ddgi.py produces — fibonacci
    # dirs cone-ordered, probes morton-ish grid order, rays cone-blocked
    # (CONE_DIRS similar dirs x CONE_BRICK adjacent probes per packet)
    from toyrenderer_tpu.ops.ddgi import (
        CONE_BRICK, _cone_block, _cone_order)
    n_dirs = 256
    k = np.arange(n_dirs)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * k
    z = 1.0 - 2.0 * (k + 0.5) / n_dirs
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z],
                    -1)[_cone_order(n_dirs)]
    n_probes = n_rays // n_dirs
    pbp = -(-n_probes // CONE_BRICK) * CONE_BRICK
    side_p = max(int(round(pbp ** (1.0 / 3.0))), 1)
    ii = np.arange(pbp)
    px = (ii % side_p + 0.5) / side_p
    py = ((ii // side_p) % side_p + 0.5) / side_p
    pz = (ii // (side_p * side_p) % side_p + 0.5) / side_p
    pp = aabb_lo[None] + np.stack([px, py, pz], -1) * ext[None]
    pr_o = np.tile(pp, (n_dirs, 1)).astype(np.float32)     # dir-major
    pr_d = np.repeat(dirs, pbp, axis=0).astype(np.float32)
    import jax.numpy as jnp
    from toyrenderer_tpu.ops.ddgi import GDIR_BRICK, GDIR_DIRS
    # gdir layout of the SAME rays: 32 cone dirs x 128 probes per
    # packet, one direction per 128-ray sublane group
    pbg = -(-n_probes // GDIR_BRICK) * GDIR_BRICK
    og = np.tile(pp[:pbg], (n_dirs, 1)).astype(np.float32)
    dg = np.repeat(dirs, pbg, axis=0).astype(np.float32)
    gd_o = np.asarray(_cone_block(jnp.asarray(og), n_dirs, pbg,
                                  GDIR_BRICK, GDIR_DIRS))
    gd_d = np.asarray(_cone_block(jnp.asarray(dg), n_dirs, pbg,
                                  GDIR_BRICK, GDIR_DIRS))
    gd_g = gd_d.reshape(-1, GDIR_BRICK, 3)[:, 0].copy()
    pr_o = np.asarray(_cone_block(jnp.asarray(pr_o), n_dirs, pbp))
    pr_d = np.asarray(_cone_block(jnp.asarray(pr_d), n_dirs, pbp))
    return (sh_o[:n_rays], sh_d[:n_rays]), (pr_o, pr_d), (gd_o, gd_d,
                                                          gd_g)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--scene", default="stress",
                   choices=("stress", "courtyard"))
    p.add_argument("--objects", type=int, default=192)
    p.add_argument("--platform", default=None)
    p.add_argument("--packet", type=int, default=0,
                   help="override rays/packet (0 = kernel default)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--noprefilter", action="store_true")
    p.add_argument("--nosah", action="store_true",
                   help="skip the adaptive-SAH tree rows")
    args = p.parse_args(argv)

    import jax

    from toyrenderer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from toyrenderer_tpu.scene.procedural import make_stress_scene
    from toyrenderer_tpu.ops import bvh as bvh_mod
    from toyrenderer_tpu.ops import geometry as G
    from toyrenderer_tpu.ops.bvh_pallas import traverse_pallas, fits_vmem
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    print("[stage] scene build...", flush=True)
    if args.scene == "courtyard":
        from toyrenderer_tpu.scene import load_scene
        path = "/root/repo/resources/courtyard.glb"
        if not os.path.exists(path):
            from toyrenderer_tpu.tools.gen_scene import build
            build(path, compress=True)
        scene_host = load_scene(path)
        mk_i, _ = static_meshlet_pairs(scene_host, 'mask')
        pi, pm = static_meshlet_pairs(
            scene_host, 'not_mask' if len(mk_i) else 'all')
        cap = max(int(len(pi) * 0.6), 256)       # bench.py parity
        pi, pm = pi[:cap], pm[:cap]
    else:
        scene_host = make_stress_scene(n_objects=args.objects,
                                       sphere_res=24, textured=False)
        pi, pm = static_meshlet_pairs(scene_host)
    scene = scene_host.to_device()
    print("[stage] rt_static...", flush=True)
    rts = bvh_mod.build_rt_static(scene_host, pi, pm)
    print("[stage] refit compile...", flush=True)

    # rts must be an ARGUMENT: closure-captured device constants of this
    # size make the XLA compile pathological (measured: >30 min vs 8 s)
    @jax.jit
    def refit(rts, scene):
        world = G.node_world_matrices(
            scene, scene.node_translation, scene.node_rotation,
            scene.node_scale)
        iw, _ = G.instance_transforms(scene, world)
        return bvh_mod.refit_bvh(rts, iw)

    bvh = refit(rts, scene)
    jax.block_until_ready(bvh.child_boxes)
    print(f"[scene] {int(np.sum(rts.payload >= 0))} tris, "
          f"levels={bvh.num_levels}, "
          f"cb={bvh.child_boxes.shape} leaf={bvh.leaf_rows.shape}, "
          f"fits_vmem={fits_vmem(bvh)}")

    sah = None
    if not args.nosah:
        from toyrenderer_tpu.ops.bvh_sah import (
            build_rt_static_sah, refit_sah)
        t0 = time.time()
        rts_sah = build_rt_static_sah(scene_host, pi, pm)

        @jax.jit
        def refit_s(rts, scene):
            world = G.node_world_matrices(
                scene, scene.node_translation, scene.node_rotation,
                scene.node_scale)
            iw, _ = G.instance_transforms(scene, world)
            return refit_sah(rts, iw)

        sah = refit_s(rts_sah, scene)
        jax.block_until_ready(sah.node_rows)
        print(f"[sah] nodes={sah.node_rows.shape[0]} "
              f"leaves={sah.leaf_rows.shape[0]} "
              f"fits_vmem={fits_vmem(sah)} ({time.time()-t0:.1f}s)")

    lo, hi = scene_host.world_aabb
    sun = np.asarray(scene_host.sun_direction)
    ((sh_o, sh_d), (pr_o, pr_d),
     (gd_o, gd_d, gd_g)) = ray_sets(args.rays, np.asarray(lo),
                                    np.asarray(hi), sun)
    kw = {'prefilter': not args.noprefilter}
    if args.packet:
        kw['packet'] = args.packet
    if jax.default_backend() == 'cpu':
        kw['interpret'] = True      # CPU smoke path (no perf meaning)

    from toyrenderer_tpu.ops.bvh_pallas import traverse_pallas_gdir
    gkw = {k: v for k, v in kw.items() if k != 'prefilter'}

    def run_gdir(b, o, d, ah, g=jnp.asarray(gd_g)):
        return traverse_pallas_gdir(b, o, g, t_max=1e4, any_hit=ah,
                                    **gkw)

    def run_plain(b, o, d, ah):
        lh = {'leaf_hbm': True} if not fits_vmem(b) else {}
        return traverse_pallas(b, o, d, t_max=1e4, any_hit=ah,
                               **kw, **lh)

    def run_gdir_hbm(b, o, d, ah, g=jnp.asarray(gd_g)):
        lh = {'leaf_hbm': True} if not fits_vmem(b) else {}
        return traverse_pallas_gdir(b, o, g, t_max=1e4, any_hit=ah,
                                    **gkw, **lh)

    from toyrenderer_tpu.ops.bvh_pallas import traverse_binned

    def run_binned(b, o, d, ah):
        bkw = {k: v for k, v in kw.items()
               if k not in ('prefilter', 'packet')}
        return traverse_binned(
            b, o, d, t_max=1e4, any_hit=ah,
            rounds=int(os.environ.get('TR_BIN_ROUNDS', '2')),
            packet=int(os.environ.get('TR_BIN_PACKET', '1024')),
            max_entries=int(os.environ.get('TR_BIN_ENTRIES', '128')),
            **bkw)

    rows = [("shadow(any-hit)", bvh, sh_o, sh_d, True, None),
            ("probe(closest)", bvh, pr_o, pr_d, False, None),
            ("probe(gdir)", bvh, gd_o, gd_d, False, run_gdir),
            ("probe(binned)", bvh, pr_o, pr_d, False, run_binned),
            ("shadow(binned)", bvh, sh_o, sh_d, True, run_binned)]
    if sah is not None:
        rows += [("probe(sah)", sah, pr_o, pr_d, False, run_plain),
                 ("probe(sah+gdir)", sah, gd_o, gd_d, False,
                  run_gdir_hbm),
                 ("shadow(sah)", sah, sh_o, sh_d, True, run_plain)]

    for name, tree, o, d, any_hit, f in rows:
        tp = f if f is not None else (
            lambda b, o, d, ah: traverse_pallas(b, o, d, t_max=1e4,
                                                any_hit=ah, **kw))
        # the fence must transfer ONE scalar: np.asarray(res['hit'])
        # ships the FULL 4 MB hit array through the axon tunnel inside
        # the timed region (measured ~40 ms — it dominated every row and
        # understated Mrays ~3x), so reduce ON DEVICE and read that
        fn = jax.jit(lambda b, o, d, ah=any_hit, tp=tp: (
            lambda r: (jnp.sum(r['hit'].astype(jnp.float32)), r))(
            tp(b, o, d, ah)))
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        hsum, res = fn(tree, oj, dj)
        float(np.asarray(hsum))                   # warm + force
        ts = []
        for i in range(args.reps):
            # perturbed inputs + scalar readback inside the timed
            # region: block_until_ready through the axon tunnel is NOT
            # a reliable completion fence (see ROADMAP gotchas)
            t0 = time.time()
            hsum, res = fn(tree, oj + 1e-5 * (i + 1), dj)
            float(np.asarray(hsum))
            ts.append(time.time() - t0)
        dt = min(ts)
        mrays = len(o) / dt / 1e6
        hit_frac = float(np.asarray(res['hit']).mean())
        steps = float(np.asarray(res['steps']).mean())
        print(f"{name:18s} {mrays:8.2f} Mrays/s   hit={hit_frac:.3f} "
              f"visits/packet={steps:.0f}  ({dt*1e3:.2f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
