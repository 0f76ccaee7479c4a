"""ctypes bindings for the C++ corpus loader, with on-demand build + fallback.

`load_corpus_native(paths, size, mode)` decodes and resizes a whole corpus in
a C++ thread pool (cmx/native/npy_loader.cpp). Falls back to the Python/PIL
path (cmx.data.corpus) if the toolchain or library is unavailable, so the
framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npy_loader.cpp")
_LIB = os.path.join(_HERE, "_npy_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.cmx_load_corpus.restype = ctypes.c_int
        lib.cmx_load_corpus.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def load_corpus_native(
    paths: Sequence[str], size: int = 256, mode: str = "bicubic",
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """(N, size, size) float32, or None if the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size), dtype=np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.cmx_load_corpus(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads, 0 if mode == "bicubic" else 1,
    )
    if rc != 0:
        return None
    return out
