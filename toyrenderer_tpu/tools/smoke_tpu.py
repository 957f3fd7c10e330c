"""Real-TPU smoke lane: one tiny render through the REAL Mosaic-lowered
Pallas kernels, with hard sanity assertions.

CI runs every Pallas kernel in interpret mode (CPU), which cannot catch
Mosaic lowering regressions (e.g. the round-3 NaN constant-fold bug in
the peel-merge row table).  This script is the hand-run counterpart: a
448x256 Cornell frame with shadows+AO+GI on the real chip, asserting the
output is finite, covered and non-degenerate.  Runs compile COLD under
the axon backend (enable_compile_cache refuses there — the axon
persistent cache returns invalid executables; warm ~1 min applies only
to local TPU/CPU backends).  Run once per working session on TPU; the
result is appended to PROGRESS notes so Mosaic regressions stay visible
between rounds.

  python -m toyrenderer_tpu.tools.smoke_tpu            # lit + all-on
  python -m toyrenderer_tpu.tools.smoke_tpu --fast     # lit only

Prints one PASS/FAIL line per config; exit code 0 iff all pass.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))

import numpy as np


def _render(scene_path, w, h, frames, **flags):
    from toyrenderer_tpu.tools.render import main as render_main
    out = f"/tmp/smoke_{'_'.join(sorted(flags))or 'lit'}.png"
    argv = ["--scene", scene_path, "--displayresolution", f"{w}x{h}",
            "--frames", str(frames), "--output", out,
            "--exposure", "0.01"]
    for f in flags:
        argv.append(f"--{f}")
    render_main(argv)
    from PIL import Image
    return np.asarray(Image.open(out))


def check(name, img, min_cover=0.5):
    ok = True
    msgs = []
    if not np.isfinite(img.astype(np.float64)).all():
        ok, msgs = False, msgs + ["non-finite pixels"]
    lit = (img.max(axis=-1) > 8).mean()
    if lit < min_cover:
        ok, msgs = False, msgs + [f"lit coverage {lit:.2f} < {min_cover}"]
    if img.std() < 5.0:
        ok, msgs = False, msgs + [f"degenerate image (std {img.std():.1f})"]
    print(f"[smoke] {name}: {'PASS' if ok else 'FAIL ' + '; '.join(msgs)}"
          f" (lit {lit:.2f}, std {img.std():.1f})")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="lit config only (one compile)")
    args = p.parse_args(argv)

    import jax

    from toyrenderer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"[smoke] WARNING: backend is {backend!r}, not TPU — this "
              "run does NOT exercise Mosaic lowering", file=sys.stderr)

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    cornell = os.path.join(root, "resources", "cornell.gltf")
    t0 = time.time()
    ok = check("cornell lit 448x256",
               _render(cornell, 448, 256, 2, culling=True))
    if not args.fast:
        img = _render(cornell, 448, 256, 3, culling=True, shadows=True,
                      ao=True, gi=True, taa=True, bloom=True)
        ok &= check("cornell all-on 448x256", img)
    print(f"[smoke] backend={backend} wall={time.time() - t0:.0f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
