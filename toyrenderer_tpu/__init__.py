"""toyrenderer_tpu — a TPU-native real-time rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lawfuyang/ToyRenderer (single-GPU D3D12 meshlet renderer; see SURVEY.md):

* the D3D12 GPU-driven meshlet pipeline (2-phase occlusion culling, auto LOD,
  mesh-shader raster) becomes a tile-binned software rasterizer producing a
  visibility buffer (reference: source/BasePassRenderers.cpp,
  source/shaders/gpuculling.hlsl, source/shaders/basepass.hlsl);
* every HLSL pass (deferred lighting, sky, bloom, auto-exposure, TAA, GTAO,
  tonemap) becomes an XLA/Pallas kernel over dense image tensors;
* DXR ray tracing (shadows, DDGI) becomes an LBVH builder + traversal kernel;
* the render graph + transient heap allocator (source/RenderGraph.cpp) is
  replaced by ONE jitted frame function — XLA does scheduling, fusion and
  buffer reuse; pass toggles select the traced graph;
* all CPU<->GPU double-buffered readbacks become an explicit pytree "carry"
  threaded through the jitted frame step.

Package layout:
  mathlib/   matrices, quaternions, frusta, jitter (reference: MathUtilities)
  ops/       compute kernels: packing, raster, culling, lighting, post, rt
  scene/     glTF loading, meshlets, LODs, global buffers, cache
  engine/    frame pipeline, view/camera, carry state, headless engine loop
  parallel/  device-mesh sharding of the frame (TPU-only design, no reference
             analogue — the reference is single-GPU)
"""

__version__ = "0.1.0"
