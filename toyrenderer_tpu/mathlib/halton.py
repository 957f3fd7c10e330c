"""Halton low-discrepancy sequences for sub-pixel TAA jitter.

Reference behavior: Graphic.cpp:949-998 produces per-frame (2,3)-base Halton
jitter in [-0.5, 0.5) pixel units, cycling over a fixed phase count.
"""

from __future__ import annotations

import numpy as np


def halton(index: np.ndarray, base: int) -> np.ndarray:
    """Halton radical inverse of `index` (1-based) in `base`. Vectorized."""
    index = np.asarray(index, dtype=np.int64)
    result = np.zeros(index.shape, dtype=np.float64)
    f = 1.0 / base
    i = index.copy()
    while np.any(i > 0):
        result = result + f * (i % base)
        i = i // base
        f = f / base
    return result.astype(np.float32)


def halton_jitter_sequence(num_phases: int = 16) -> np.ndarray:
    """(num_phases, 2) sub-pixel jitter offsets in [-0.5, 0.5)."""
    idx = np.arange(1, num_phases + 1)
    return np.stack([halton(idx, 2) - 0.5, halton(idx, 3) - 0.5], axis=-1)
