"""ctypes bindings to the C++ native runtime (native/*.cpp).

The library is built with `make -C native` (g++, no external deps).  If the
shared object is missing we try to build it once; on failure every wrapper
degrades to its pure-python fallback, so the framework never hard-requires
the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpicopose_native.so"))

_lib = None


def load_library() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    return _lib


def available() -> bool:
    return load_library() is not None
