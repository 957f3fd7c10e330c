"""Native (C++) host-side components, built on demand with g++.

The reference's whole host runtime is C++; here native code backs the hot
content-pipeline loops (meshletization) behind Python fallbacks — importing
this package never fails, `meshlet_lib()` just returns None when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB = None
_TRIED = False


def _build(src: Path, out: Path) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


import functools


@functools.lru_cache(maxsize=1)
def simplify_lib():
    """ctypes handle to the quadric simplifier, or None."""
    src = _DIR / "simplify.cpp"
    so = _DIR / "_simplify.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        if not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.simplify_qem.restype = ctypes.c_int64
        lib.simplify_qem.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,   # indices, n_idx
            ctypes.c_void_p, ctypes.c_void_p,  # positions, normals
            ctypes.c_int64,                    # n_verts
            ctypes.c_int64,                    # target_idx
            ctypes.c_float,                    # normal_weight
            ctypes.c_void_p, ctypes.c_void_p,  # out_indices, out_error
        ]
        return lib
    except OSError:
        return None


@functools.lru_cache(maxsize=1)
def meshopt_lib():
    """ctypes handle to the EXT_meshopt_compression codecs, or None."""
    src = _DIR / "meshopt_codec.cpp"
    so = _DIR / "_meshopt_codec.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        if not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
        pd = ctypes.c_ssize_t
        for name, args in (
            ("mcodec_encode_vertex_buffer",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
              ctypes.c_size_t, ctypes.c_size_t]),
            ("mcodec_decode_vertex_buffer",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
              ctypes.c_void_p, ctypes.c_size_t]),
            ("mcodec_encode_index_buffer",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
              ctypes.c_size_t]),
            ("mcodec_decode_index_buffer",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
              ctypes.c_size_t]),
            ("mcodec_encode_index_sequence",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
              ctypes.c_size_t]),
            ("mcodec_decode_index_sequence",
             [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
              ctypes.c_size_t]),
        ):
            fn = getattr(lib, name)
            fn.restype = pd
            fn.argtypes = args
        for name in ("mcodec_decode_filter_oct",
                     "mcodec_decode_filter_quat",
                     "mcodec_decode_filter_exp"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                           ctypes.c_size_t]
        return lib
    except OSError:
        return None


@functools.lru_cache(maxsize=1)
def sah_lib():
    """ctypes handle to the binned-SAH 8-wide BVH builder, or None."""
    src = _DIR / "sah.cpp"
    so = _DIR / "_sah.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        if not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.build_sah8.restype = ctypes.c_int64
        lib.build_sah8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,      # tlo, thi
            ctypes.c_int64,                        # n
            ctypes.c_int32, ctypes.c_int32,        # leaf_tris, nbins
            ctypes.c_int64, ctypes.c_int64,        # max_nodes, max_leaves
            ctypes.c_void_p, ctypes.c_void_p,      # out_child, out_axis
            ctypes.c_void_p, ctypes.c_void_p,      # out_leaf, out_counts
        ]
        return lib
    except OSError:
        return None


def meshlet_lib():
    """ctypes handle to the meshlet builder, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _DIR / "meshlet.cpp"
    so = _DIR / "_meshlet.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        if not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.build_meshlets.restype = ctypes.c_int64
        lib.build_meshlets.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,   # indices, n_tris
            ctypes.c_void_p, ctypes.c_int64,   # positions, n_verts
            ctypes.c_void_p, ctypes.c_void_p,  # out_tris, out_tri_count
            ctypes.c_void_p, ctypes.c_void_p,  # out_center, out_radius
            ctypes.c_void_p, ctypes.c_void_p,  # out_axis, out_cutoff
            ctypes.c_int64,                    # max_meshlets
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB
