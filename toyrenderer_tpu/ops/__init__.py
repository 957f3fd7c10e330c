"""Compute kernels (the XLA/Pallas equivalents of source/shaders/*.hlsl)."""
