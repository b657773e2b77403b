"""Build + ctypes binding for the native C++ ingest codec (native/*.cpp).

The reference's runtime-around-the-GPU is native Rust (rayon chunk decode,
treee/src/laz.rs:130-180); ours is C++ bound through ctypes.  ``load_library``
compiles on first use (g++, cached by source mtime) and degrades to None so the
pure-numpy path keeps working when no toolchain is present.

Run ``python -m treee_tpu.io.native_build`` to force a (re)build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtreee_native.so")

_SOURCES = ["las_decode.cpp", "laz_decompress.cpp", "laz_layered.cpp",
            "laz_testhooks.cpp"]
# headers participate in the staleness check: edits to the codec core must
# trigger a rebuild, not silently run against the stale committed .so
_HEADERS = ["laszip_core.h"]

_cached_lib: ctypes.CDLL | None = None
_cached_failed = False


def _sources() -> list[str]:
    return [
        os.path.join(_NATIVE_DIR, s)
        for s in _SOURCES
        if os.path.exists(os.path.join(_NATIVE_DIR, s))
    ]


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    deps = _sources() + [
        p for h in _HEADERS
        if os.path.exists(p := os.path.join(_NATIVE_DIR, h))
    ]
    return any(os.path.getmtime(s) > lib_mtime for s in deps)


def build(verbose: bool = False) -> str:
    """Compile the native library; returns its path."""
    srcs = _sources()
    if not srcs:
        raise FileNotFoundError(f"no native sources under {_NATIVE_DIR}")
    cmd = [
        # -fwrapv: the LASzip corrector arithmetic (IntegerCompressor, GPS
        # high-32 contexts) relies on two's-complement i32 wraparound; make
        # that defined instead of UB the optimizer may exploit
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-fwrapv",
        "-o", _LIB_PATH, *srcs,
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return _LIB_PATH


def load_library(required: bool = True) -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _cached_lib, _cached_failed
    if _cached_lib is not None:
        return _cached_lib
    if _cached_failed and not required:
        return None
    try:
        if _stale():
            build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.treee_las_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.treee_las_decode.restype = None
        lib.treee_laz_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint8,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.treee_laz_decompress.restype = ctypes.c_int
        lib.treee_laz_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint8, ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.treee_laz_compress.restype = ctypes.c_int
        lib.treee_laz_decompress_items.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_uint64,  # first_point (chunk-aligned range decode)
        ]
        lib.treee_laz_decompress_items.restype = ctypes.c_int
        lib.treee_laz_compress_items.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.treee_laz_compress_items.restype = ctypes.c_int
        lib.treee_laz_chunk_counts.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.treee_laz_chunk_counts.restype = ctypes.c_int
        lib.treee_laz_decompress_layered.argtypes = (
            lib.treee_laz_decompress_items.argtypes
        )
        lib.treee_laz_decompress_layered.restype = ctypes.c_int
        lib.treee_laz_compress_layered.argtypes = (
            lib.treee_laz_compress_items.argtypes
        )
        lib.treee_laz_compress_layered.restype = ctypes.c_int
        # test hooks (bit-level codec unit tests, native/laz_testhooks.cpp)
        lib.treee_laz_test_median5.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
        ]
        lib.treee_laz_test_median5.restype = None
        lib.treee_laz_test_ic_roundtrip.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.treee_laz_test_ic_roundtrip.restype = ctypes.c_int
        lib.treee_laz_test_point10_changed_symbol.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.treee_laz_test_point10_changed_symbol.restype = ctypes.c_uint32
        lib.treee_laz_test_chunk_table.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
        ]
        lib.treee_laz_test_chunk_table.restype = ctypes.c_int
        _cached_lib = lib
        return lib
    except Exception:
        _cached_failed = True
        if required:
            raise
        return None


def las_decode(
    lib: ctypes.CDLL,
    rec: np.ndarray,
    point_length: int,
    scale: np.ndarray,
    offset: np.ndarray,
    center: np.ndarray,
    n_threads: int = 0,
) -> np.ndarray:
    """Threaded native record decode -> centered y-up f32[N,3]."""
    rec = np.ascontiguousarray(rec, dtype=np.uint8)
    n = rec.size // point_length
    out = np.empty((n, 3), np.float32)
    scale = np.ascontiguousarray(scale, np.float64)
    offset = np.ascontiguousarray(offset, np.float64)
    center = np.ascontiguousarray(center, np.float64)
    lib.treee_las_decode(
        rec.ctypes.data, n, point_length,
        scale.ctypes.data, offset.ctypes.data, center.ctypes.data,
        out.ctypes.data, n_threads,
    )
    return out


if __name__ == "__main__":
    print(build(verbose=True))
