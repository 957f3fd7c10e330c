"""One-off TPU A/B: pair-MXU traversal vs the packet kernel on the
bench's COHERENT sun any-hit workload (64x64-tile-ordered rays over the
courtyard floor, the exact rt_mrays_s rays).  Probe rays already won
1.42x; this decides whether sun rays also route through pairs.

Scan-mode fencing: reps chained through a fori_loop with a scalar
device reduction, one readback — per-rep readbacks pay the ~32 ms
tunnel RTT each."""
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
from toyrenderer_tpu.ops.bvh_sah import build_rt_static_auto
from toyrenderer_tpu.ops.bvh import refit_bvh
from toyrenderer_tpu.ops.bvh_pallas import traverse_auto
from toyrenderer_tpu.ops.rt_pairs import mt_tables, traverse_pairs
from toyrenderer_tpu.ops.geometry import static_meshlet_pairs
from toyrenderer_tpu.scene import load_scene

path = os.path.join(os.path.dirname(__file__), "..", "..", "resources",
                    "courtyard.glb")
scene_host = load_scene(path)
scene = scene_host.to_device()
pi, pm = static_meshlet_pairs(scene_host)
mk_i, mk_m = static_meshlet_pairs(scene_host, 'mask')
rts = build_rt_static_auto(scene_host, pi, pm,
                           mask_pair_inst=jnp.asarray(mk_i),
                           mask_pair_meshlet=jnp.asarray(mk_m))
sah = hasattr(rts, 'depth_ranges')


@jax.jit
def refit(rts, scene):
    world = G.node_world_matrices(scene, scene.node_translation,
                                  scene.node_rotation, scene.node_scale)
    iw, _ = G.instance_transforms(scene, world)
    if sah:
        from toyrenderer_tpu.ops.bvh_sah import refit_sah
        return refit_sah(rts, iw)
    return refit_bvh(rts, iw)


bvh = refit(rts, scene)
print(f"tree {'sah' if sah else 'complete'} "
      f"{rts.payload.shape[0]} tri slots", file=sys.stderr)

# bench's exact sun-ray layout: 64x64 tiles over the ground plane
n_rays = 1 << 20
lo, hi = scene_host.world_aabb
ext = np.asarray(hi) - np.asarray(lo)
side = int(np.sqrt(n_rays))
t64 = 64
gsz = side // t64
ty, tx = np.divmod(np.arange(gsz * gsz), gsz)
yy, xx = np.divmod(np.arange(t64 * t64), t64)
gy = (ty[:, None] * t64 + yy[None, :]).reshape(-1)[:n_rays]
gx = (tx[:, None] * t64 + xx[None, :]).reshape(-1)[:n_rays]
orig = np.stack([
    lo[0] + (gx + 0.5) / side * ext[0],
    np.full(n_rays, lo[1] + 0.05 * ext[1]),
    lo[2] + (gy + 0.5) / side * ext[2]], -1).astype(np.float32)
orig_d = jnp.asarray(orig)
sun = jnp.asarray(np.array([0.35, -0.85, 0.40]) /
                  np.linalg.norm([0.35, -0.85, 0.40]), jnp.float32)

mt = jax.jit(mt_tables)(bvh)
mt = jax.tree.map(lambda x: x.block_until_ready(), mt)
print(f"mt chunks: {mt[0].shape[0]}", file=sys.stderr)

REPS = 4


def bench(name, fn):
    @jax.jit
    def scan(bvh, o, s):
        def body(k, acc):
            hit = fn(bvh, o + 1e-5 * (k + 1).astype(jnp.float32), s)
            return acc + jnp.sum(hit.astype(jnp.int32))
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    tot = scan(bvh, orig_d, sun)
    float(np.asarray(tot))                       # compile + settle
    t0 = time.time()
    tot = scan(bvh, orig_d, sun)
    v = float(np.asarray(tot))
    dt = time.time() - t0
    print(f"{name}: {dt / REPS * 1e3:.2f} ms/rep -> "
          f"{REPS * n_rays / dt / 1e6:.2f} Mrays/s (hits {v / REPS:.0f})")


def packet(bvh, o, s):
    dirs = jnp.broadcast_to(-s, (n_rays, 3))
    return traverse_auto(bvh, o, dirs, t_max=1e4, any_hit=True)['hit']


def packet_gdir(bvh, o, s):
    dirs = jnp.broadcast_to(-s, (n_rays, 3))
    gd = jnp.broadcast_to(-s, (n_rays // 128, 3))
    return traverse_auto(bvh, o, dirs, t_max=1e4, any_hit=True,
                         group_dirs=gd)['hit']


def pairs(bvh, o, s, **kw):
    dirs = jnp.broadcast_to(-s, (n_rays, 3))
    return traverse_pairs(bvh, o, dirs, t_max=1e4, any_hit=True,
                          tables=mt, fallback=False, **kw)['hit']


bench("packet", packet)
bench("packet gdir", packet_gdir)
bench("pairs g=8 pf=64", lambda b, o, s: pairs(b, o, s, group=8))
bench("pairs g=8 pf=32", lambda b, o, s: pairs(
    b, o, s, group=8, pair_factor=32))
bench("pairs g=16 pf=64", lambda b, o, s: pairs(b, o, s, group=16))

# correctness spot check vs packet — fallback=True so capacity
# overflow can't masquerade as agreement (timed benches above keep
# fallback=False to measure the dense kernel alone)
hp = np.asarray(jax.jit(packet)(bvh, orig_d, sun))
res = jax.jit(lambda b, o, s: traverse_pairs(
    b, o, jnp.broadcast_to(-s, (n_rays, 3)), t_max=1e4, any_hit=True,
    tables=mt, fallback=True, group=8))(bvh, orig_d, sun)
hx = np.asarray(res['hit'])
print(f"pairs-vs-packet hit agreement {(hp == hx).mean():.5f}")
