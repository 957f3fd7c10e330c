"""Device-mesh sharded rendering helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toyrenderer_tpu.engine.frame import render_frame


def replicate_scene(scene, mesh: Mesh):
    """Put the DeviceScene on every chip (geometry is shared state)."""
    return jax.device_put(scene, NamedSharding(mesh, P()))


def make_view_batch_renderer(mesh: Mesh, settings, ddgi_volume=None):
    """Jitted renderer for a BATCH of views over a ('dp', 'sp') mesh.

    The view batch (leading axis of every frame_inputs leaf and of the
    carry) shards over 'dp'; inside each view, the output image (and with
    it the fused screen-space stages) is row-shard-constrained over 'sp'.
    Returns fn(scene, pair_inst, pair_meshlet, fi_batch, carry_batch)
    -> (images (B, H, W, 3), new_carry_batch).
    """
    replicated = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P('dp'))

    def step(scene, pair_inst, pair_meshlet, fi_b, carry_b):
        def one(fi, carry):
            img, new_carry, _ = render_frame(
                scene, pair_inst, pair_meshlet, fi, carry,
                settings=settings, ddgi_volume=ddgi_volume)
            img = jax.lax.with_sharding_constraint(
                img, NamedSharding(mesh, P('sp', None, None)))
            return img, new_carry
        return jax.vmap(one)(fi_b, carry_b)

    return jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, batch, batch),
        out_shardings=(NamedSharding(mesh, P('dp', 'sp', None, None)),
                       batch))


def make_sp_frame_renderer(mesh: Mesh, settings, ddgi_volume=None,
                           axis: str = 'sp'):
    """Jitted SINGLE-view renderer with the raster stage itself sharded
    over `axis` tile rows (parallel.sp_raster) — one frame gets faster
    with more chips, unlike the view-batch renderer.  The screen-space
    tail follows the row sharding GSPMD propagates from the raster
    output.  Requires tiles_y % mesh.shape[axis] == 0."""
    from toyrenderer_tpu.parallel.sp_raster import shard_config

    shard_config(settings.raster_config(), mesh.shape[axis])  # validate

    def step(scene, pair_inst, pair_meshlet, fi, carry, rt_static=None,
             rt_static_gi=None, gi_pair_inst=None, gi_pair_meshlet=None):
        img, new_carry, aux = render_frame(
            scene, pair_inst, pair_meshlet, fi, carry,
            settings=settings, ddgi_volume=ddgi_volume,
            sp_mesh=(mesh, axis), rt_static=rt_static,
            rt_static_gi=rt_static_gi, gi_pair_inst=gi_pair_inst,
            gi_pair_meshlet=gi_pair_meshlet)
        img = jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P(axis, None, None)))
        return img, new_carry, aux

    # inputs are replicated by the callers (replicate_scene / device_put);
    # rt_static rides as an optional replicated pytree argument
    return jax.jit(step)
