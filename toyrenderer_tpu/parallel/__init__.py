"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.5/§5.8) — there is no
behavior to match, so this package is NEW TPU-native capability:

* data-parallel multi-view rendering ('dp'): independent cameras per chip
  (multi-client serving, cubemap baking, stereo) — near-linear scaling
  since frames are independent;
* screen-space sharding ('sp'): row-sharded per-pixel stages via GSPMD
  sharding constraints (lighting, post, TAA are embarrassingly parallel;
  geometry/binning stay replicated until a cross-chip binning exchange is
  profitable).
"""

from toyrenderer_tpu.parallel.sharding import (
    make_view_batch_renderer, replicate_scene)
