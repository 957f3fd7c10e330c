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



from toyrenderer_tpu.ops.rt_pairs import mt_tables, traverse_pairs

mt = jax.jit(mt_tables)(bvh)
mt = jax.tree.map(lambda x: x.block_until_ready(), mt)
print(f"mt chunks: {mt[0].shape[0]}", file=sys.stderr)

res_px = bench("pairs g=8 pf=64", lambda b, o, d: traverse_pairs(
    b, o, d, t_max=t_max, tables=mt, fallback=False))
bench("pairs g=4 pf=64", lambda b, o, d: traverse_pairs(
    b, o, d, t_max=t_max, tables=mt, group=4, fallback=False))
bench("pairs g=16 pf=64", lambda b, o, d: traverse_pairs(
    b, o, d, t_max=t_max, tables=mt, group=16, fallback=False))
bench("pairs g=16 pf=192", lambda b, o, d: traverse_pairs(
    b, o, d, t_max=t_max, tables=mt, group=16, pair_factor=192,
    fallback=False))
res_px = bench("pairs g=8 pf=192", lambda b, o, d: traverse_pairs(
    b, o, d, t_max=t_max, tables=mt, group=8, pair_factor=192,
    fallback=False))

# exact CPU oracle on a subsample for correctness
import numpy as _np
idx = _np.random.default_rng(0).choice(n, size=4096, replace=False)
from toyrenderer_tpu.ops.bvh import traverse as _trav
ref = jax.jit(lambda b, o, d: _trav(b, o, d, t_max=t_max))(
    bvh, origins[idx], d_all[idx])
hx = _np.asarray(res_px['hit'])[idx]; tx = _np.asarray(res_px['t'])[idx]
hm = _np.asarray(ref['hit']); tm = _np.asarray(ref['t'])
agree = (hx == hm).mean()
both = hx & hm
terr = _np.abs(tx[both] - tm[both]) / _np.maximum(tm[both], 1e-3)
print(f"pairs-vs-oracle hit agreement {agree:.5f}, t rel err p99 "
      f"{_np.percentile(terr, 99):.2e}")
