"""Native (C++) runtime components, loaded via ctypes.

Builds lazily with ``make`` on first use; every consumer has a pure-Python
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libtableio.so")
_lib = None
_tried = False


def _build():
    subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)


def get_tableio():
    """Return the loaded ctypes library, building it if needed; None if
    unavailable (no compiler)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.tableio_parse.restype = ctypes.c_void_p
        lib.tableio_parse.argtypes = [ctypes.c_char_p]
        lib.tableio_error.restype = ctypes.c_char_p
        lib.tableio_error.argtypes = [ctypes.c_void_p]
        lib.tableio_nrows.restype = ctypes.c_int64
        lib.tableio_nrows.argtypes = [ctypes.c_void_p]
        lib.tableio_ncols.restype = ctypes.c_int64
        lib.tableio_ncols.argtypes = [ctypes.c_void_p]
        lib.tableio_copy_data.restype = None
        lib.tableio_copy_data.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_double)]
        lib.tableio_column_name.restype = ctypes.c_char_p
        lib.tableio_column_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tableio_nmeta.restype = ctypes.c_int64
        lib.tableio_nmeta.argtypes = [ctypes.c_void_p]
        lib.tableio_meta_key.restype = ctypes.c_char_p
        lib.tableio_meta_key.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tableio_meta_value.restype = ctypes.c_char_p
        lib.tableio_meta_value.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tableio_free.restype = None
        lib.tableio_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
