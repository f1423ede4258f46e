"""Loader for the native host library (native/dvt_native.cpp).

Builds the shared object on first use (g++ is part of the toolchain) and
falls back silently to the pure-Python paths if unavailable — the native
library is a host-side accelerator, never a correctness dependency.
Constants are injected from the Python source of truth at load time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "dvt_native.cpp"
_SO = _REPO_ROOT / "native" / "dvt_native.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the loaded library (with Poseidon2 constants injected) or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DVT_DISABLE_NATIVE") == "1":
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.p2_init.argtypes = [ctypes.POINTER(ctypes.c_uint32)] * 3
        lib.p2_permute_batch.argtypes = [ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        lib.p2_hash_rows.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.p2_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        from ..hash import poseidon2 as p2
        import numpy as np

        ext_c = np.array(p2.EXTERNAL_CONSTANTS, dtype=np.uint32).ravel()
        int_c = np.array(p2.INTERNAL_CONSTANTS, dtype=np.uint32)
        diag = np.array(p2.INTERNAL_DIAG, dtype=np.uint32)
        lib.p2_init(
            ext_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            int_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            diag.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def s_permute_native(state):
    """Scalar permutation via the native library; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    arr = np.array(state, dtype=np.uint32)
    lib.p2_permute_batch(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), 1)
    return [int(x) for x in arr]


def hash_rows_np(matrix):
    """Sponge-hash each row of an (n, w) uint32 array → (n, 8); None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    matrix = np.ascontiguousarray(matrix, dtype=np.uint32)
    n, w = matrix.shape
    out = np.empty((n, 8), dtype=np.uint32)
    lib.p2_hash_rows(
        matrix.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def compress_np(pairs):
    """Compress (n, 16) digest pairs → (n, 8); None if unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    pairs = np.ascontiguousarray(pairs, dtype=np.uint32)
    n = pairs.shape[0]
    out = np.empty((n, 8), dtype=np.uint32)
    lib.p2_compress(
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out
