"""LAZ (LASzip) decompression via the native C++ codec.

The reference decompresses LAZ chunks in parallel with the Rust ``laz`` crate
(treee/src/laz.rs:130-180).  Our equivalent is a C++ codec in native/; until it
is built, compressed files are rejected with a clear error rather than silently
producing garbage.
"""

from __future__ import annotations

import numpy as np

from . import native_build


def decompress(data: bytes, header, vlr: bytes | None, n_points: int) -> np.ndarray:
    """Decompress LAZ point records to raw record bytes (u8[n*point_length])."""
    lib = native_build.load_library(required=False)
    if lib is None or not hasattr(lib, "treee_laz_decompress"):
        raise NotImplementedError(
            "this file is LAZ-compressed; build the native codec first "
            "(python -m treee_tpu.io.native_build) or convert to .las"
        )
    return native_build.laz_decompress(lib, data, header, vlr, n_points)
