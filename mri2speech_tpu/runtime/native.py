"""ctypes bindings for the C++ gather kernel, with numpy fallback.

Build once with ``make -C mri2speech_tpu/runtime`` (or
``python -m mri2speech_tpu.runtime.native build``); if the shared library is
absent the functions transparently fall back to numpy fancy indexing, so the
framework works untouched on systems without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libm2sgather.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.m2s_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.m2s_prefetch_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return lib
    except OSError:
        return None


def native_available() -> bool:
    return _load() is not None


def build() -> bool:
    """Compile the shared library in place (requires g++/make)."""
    try:
        subprocess.run(["make", "-C", str(Path(__file__).parent)], check=True)
    except Exception as exc:  # pragma: no cover
        print(f"[runtime] build failed: {exc}")
        return False
    global _lib
    _lib = None
    return native_available()


def _as_c_contig_rows(src: np.ndarray):
    """View (N, ...) array as (N, row_bytes) byte layout; requires C order."""
    if not src.flags["C_CONTIGUOUS"]:
        raise ValueError("source must be C-contiguous (memmap of a saved .npy is)")
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    return row_bytes


def gather_rows(src: np.ndarray, indices: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """dst[i] = src[indices[i]] — native memcpy path when built, else numpy."""
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(src[indices])
    row_bytes = _as_c_contig_rows(src)
    out = np.empty((len(indices),) + src.shape[1:], dtype=src.dtype)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.m2s_gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(indices)),
        ctypes.c_int64(row_bytes),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(n_threads),
    )
    return out


def prefetch_rows(src: np.ndarray, indices: np.ndarray) -> None:
    """madvise(WILLNEED) the pages of the listed rows (no-op without the lib)."""
    lib = _load()
    if lib is None:
        return
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    row_bytes = _as_c_contig_rows(src)
    lib.m2s_prefetch_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(indices)),
        ctypes.c_int64(row_bytes),
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "build":
        ok = build()
        print("native gather:", "available" if ok else "unavailable")
