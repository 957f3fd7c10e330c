"""Capture a jax.profiler trace of rendered frames (tracing parity).

Counterpart of the reference's microprofile CPU+GPU timeline dumps
(SURVEY.md §5.1: HTML dump via hotkey / --profilestartup): writes a
TensorBoard/Perfetto trace directory covering N frames of the full
pipeline.

Usage:
  python -m toyrenderer_tpu.tools.trace --scene resources/cornell.gltf \
      --frames 3 --out /tmp/trtpu_trace
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="resources/cornell.gltf")
    p.add_argument("--displayresolution", default="448x256")
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--out", default="/tmp/toyrenderer_trace")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    w, h = (int(x) for x in args.displayresolution.split("x"))
    scene_host = load_scene(args.scene)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    settings = RenderSettings(width=w, height=h, manual_exposure=0.01)
    view = View.from_scene(scene_host, w, h)
    carry = init_carry(scene, settings)
    render = make_render_fn(settings)

    # warm up (compile outside the trace)
    fi = default_frame_inputs(scene_host, view.matrices())
    img, carry, _ = render(scene, pi, pm, fi, carry)
    img.block_until_ready()

    with jax.profiler.trace(args.out):
        for _ in range(args.frames):
            mats = view.matrices()
            fi = default_frame_inputs(scene_host, mats)
            img, carry, _ = render(scene, pi, pm, fi, carry)
            img.block_until_ready()
            view.advance(mats)
    print(f"[trace] wrote {args.out} "
          f"(open with TensorBoard or perfetto)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
