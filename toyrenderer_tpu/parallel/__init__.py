"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.5/§5.8) — there is no
behavior to match, so this package is NEW TPU-native capability:

* data-parallel multi-view rendering ('dp'): independent cameras per chip
  (multi-client serving, cubemap baking, stereo) — near-linear scaling
  since frames are independent;
* screen-space sharding ('sp'): row-sharded per-pixel stages via GSPMD
  sharding constraints (lighting, post, TAA are embarrassingly parallel),
  plus a SINGLE-FRAME sharded raster (sp_raster.py): each chip bins and
  Pallas-fills only the tile rows it owns, so one frame's raster cost
  divides over the mesh with zero halo exchange.
"""

from toyrenderer_tpu.parallel.sharding import (
    make_sp_frame_renderer, make_view_batch_renderer, replicate_scene)
from toyrenderer_tpu.parallel.sp_raster import raster_frame_sp
