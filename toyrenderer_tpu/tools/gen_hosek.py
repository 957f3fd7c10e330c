"""Generate the packed Hosek-Wilkie sky dataset (hosek_data.npz).

The Hosek-Wilkie analytic skylight model ("An Analytic Model for Full
Spectral Sky-Dome Radiance", SIGGRAPH 2012) ships a fitted RGB dataset in
its reference implementation, published under the 3-clause BSD license:

    Copyright (c) 2012 - 2013, Lukas Hosek and Alexander Wilkie
    All rights reserved.  (See the license text in the original
    distribution; redistribution of the data with this notice is
    permitted.)

This script parses that dataset (e.g. the copy vendored by renderers such
as ToyRenderer as HosekDataRGB.h) and packs the double arrays into a small
float32 .npz consumed by ops/sky.py:

  rgb: (3 channels, 2 albedos, 10 turbidities, 6 bezier ctrl, 9 coeffs)
  rad: (3 channels, 2 albedos, 10 turbidities, 6 bezier ctrl)

Usage:
  python -m toyrenderer_tpu.tools.gen_hosek /path/to/HosekDataRGB.h
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "ops" / "hosek_data.npz"


def _parse_arrays(text: str) -> dict[str, np.ndarray]:
    text = re.sub(r"//[^\n]*", "", text)          # strip line comments
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    out = {}
    for m in re.finditer(
            r"double\s+(dataset\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S):
        name, body = m.group(1), m.group(2)
        vals = [float(x) for x in re.findall(
            r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", body)]
        out[name] = np.asarray(vals, np.float64)
    return out


def main(argv=None):
    argv = argv or sys.argv[1:]
    src = Path(argv[0]) if argv else Path(
        "/root/reference/source/HosekDataRGB.h")
    arrays = _parse_arrays(src.read_text())

    rgb = []
    rad = []
    for ch in (1, 2, 3):
        a = arrays[f"datasetRGB{ch}"]
        # layout: [albedo][turbidity][ctrl][coeff] with strides
        # (9*6*10, 9*6, 9, 1) — exactly how Evaluate() indexes it
        assert a.size == 2 * 10 * 6 * 9, a.size
        rgb.append(a.reshape(2, 10, 6, 9))
        r = arrays[f"datasetRGBRad{ch}"]
        assert r.size == 2 * 10 * 6, r.size
        rad.append(r.reshape(2, 10, 6))
    np.savez_compressed(OUT, rgb=np.stack(rgb).astype(np.float32),
                        rad=np.stack(rad).astype(np.float32))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
