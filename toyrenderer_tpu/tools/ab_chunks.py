"""One-off TPU A/B: block-pair chunk traversal (ops/rt_chunks.py) vs
packet kernels on the courtyard DDGI probe workload (the bench
autotune's exact rays)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
import numpy as np
import jax
from toyrenderer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp

from toyrenderer_tpu.ops import geometry as G
from toyrenderer_tpu.ops.bvh import build_rt_static, refit_bvh
from toyrenderer_tpu.ops.ddgi import (_cone_block, _cone_order,
                                      _fibonacci_sphere, volume_from_aabb,
                                      CONE_BRICK, CONE_DIRS)
from toyrenderer_tpu.ops.bvh_pallas import traverse_auto
from toyrenderer_tpu.ops.rt_chunks import chunk_table, traverse_chunks
from toyrenderer_tpu.ops.geometry import rt_lod_pairs, static_meshlet_pairs
from toyrenderer_tpu.scene import load_scene

path = os.path.join(os.path.dirname(__file__), "..", "..", "resources",
                    "courtyard.glb")
scene_host = load_scene(path)
scene = scene_host.to_device()
mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
gi_tris = int(os.environ.get('TR_GI_TRIS', '100000'))
g_pi, g_pm, lod = rt_lod_pairs(scene_host, 'not_mask',
                               budget_tris=gi_tris)
rts = build_rt_static(scene_host, g_pi, g_pm,
                      mask_pair_inst=jnp.asarray(mk_i),
                      mask_pair_meshlet=jnp.asarray(mk_m))


@jax.jit
def refit(rts, scene):
    world = G.node_world_matrices(scene, scene.node_translation,
                                  scene.node_rotation, scene.node_scale)
    iw, _ = G.instance_transforms(scene, world)
    return refit_bvh(rts, iw)


bvh = refit(rts, scene)
print(f"GI LOD{lod} leaves {bvh.leaf_rows.shape[0]}", file=sys.stderr)

# probe phase rays (phase 0 of 4), dir-major like trace_probe_block
vol = volume_from_aabb(scene_host.world_aabb[0], scene_host.world_aabb[1])
pos = np.asarray(vol.probe_positions())
p = pos.shape[0]
r = vol.rays_per_probe
pb = -(-p // 4)
pos = pos[:pb]
dirs = _fibonacci_sphere(r)[_cone_order(r)]
origins = jnp.asarray(np.tile(pos, (r, 1)))
d_all = jnp.asarray(np.repeat(dirs, pb, axis=0))
n = origins.shape[0]
t_max = float(vol.max_ray_distance)
print(f"{pb} probes x {r} rays = {n}", file=sys.stderr)

tables = jax.jit(chunk_table)(bvh)
tables = jax.tree.map(lambda x: x.block_until_ready(), tables)
print(f"chunks: {tables[0].shape[0]}", file=sys.stderr)


def force(x):
    return float(np.asarray(jnp.sum(x['t']) + jnp.sum(x['tri'])))


def bench(name, fn, reps=6):
    fn_j = jax.jit(fn)
    out = fn_j(bvh, origins, d_all)
    force(out)
    ts = []
    for i in range(reps):
        t0 = time.time()
        force(fn_j(bvh, origins, d_all))
        ts.append(time.time() - t0)
    ms = np.median(ts) * 1e3
    print(f"{name}: {ms:.2f} ms -> {n / np.median(ts) / 1e6:.2f} Mrays/s")
    return out


res_ck = bench("chunks pf=64", lambda b, o, d: traverse_chunks(
    b, o, d, t_max=t_max, tables=tables, fallback=False))
bench("chunks pf=32", lambda b, o, d: traverse_chunks(
    b, o, d, t_max=t_max, tables=tables, pair_factor=32, fallback=False))
bench("chunks pf=128", lambda b, o, d: traverse_chunks(
    b, o, d, t_max=t_max, tables=tables, pair_factor=128, fallback=False))
bench("chunks pf=64+fb", lambda b, o, d: traverse_chunks(
    b, o, d, t_max=t_max, tables=tables, fallback=True))

# packet kernel on cone-blocked rays (the current default path)
brick = CONE_BRICK
pbp = -(-pb // brick) * brick
pos_p = np.pad(pos, ((0, pbp - pb), (0, 0)))
live = np.tile((np.arange(pbp) < pb).astype(np.float32), (r,))
o_c = _cone_block(jnp.asarray(np.tile(pos_p, (r, 1))), r, pbp,
                  brick, CONE_DIRS)
d_c = _cone_block(jnp.asarray(np.repeat(dirs, pbp, axis=0)), r, pbp,
                  brick, CONE_DIRS)
lv_c = _cone_block(jnp.asarray(live), r, pbp, brick, CONE_DIRS)


def packet(b, o, d):
    return traverse_auto(b, o, d, t_max=t_max, live=lv_c, chunked=False)


try:
    res_pk = bench("packet cone", lambda b, o, d: packet(b, o_c, d_c))
except Exception as e:
    print(f"packet failed: {e!r}")
    res_pk = None

# correctness cross-check (hi/lo fetch error can flip knife edges)
if res_pk is not None:
    from toyrenderer_tpu.ops.ddgi import _cone_unblock
    hp = np.asarray(_cone_unblock(res_pk['hit'], r, pbp, brick,
                                  CONE_DIRS))
    tp = np.asarray(_cone_unblock(res_pk['t'], r, pbp, brick,
                                  CONE_DIRS))
    keep = np.tile(np.arange(pbp) < pb, (r,))
    hm = np.asarray(res_ck['hit'])
    tm = np.asarray(res_ck['t'])
    agree = (hp[keep] == hm).mean()
    both = (hp[keep] & hm)
    terr = np.abs(tp[keep][both] - tm[both]) / np.maximum(
        tp[keep][both], 1e-3)
    print(f"hit agreement {agree:.5f}, t rel err p99 "
          f"{np.percentile(terr, 99):.2e}")
