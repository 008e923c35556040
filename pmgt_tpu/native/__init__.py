"""Native (C++) preprocessing kernels, loaded via ctypes.

The shared library is compiled on demand with the system toolchain and
cached next to the source; every entry point has a pure-Python fallback so
the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("pmgt_tpu")

_SRC = os.path.join(os.path.dirname(__file__), "alias_builder.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_alias_builder.so")
_LIB: Optional[ctypes.CDLL] = None
_LOAD_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            with tempfile.TemporaryDirectory() as tmp:
                out = os.path.join(tmp, "lib.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", out, _SRC],
                    check=True,
                    capture_output=True,
                )
                os.replace(out, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.build_alias_tables.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.build_alias_tables.restype = None
        _LIB = lib
    except Exception as e:  # no compiler / load failure → Python fallback
        logger.info("native alias builder unavailable (%s); using Python", e)
        _LOAD_FAILED = True
    return _LIB


def build_alias_tables_native(
    nbr_logits: np.ndarray, degrees: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native Vose alias build; returns None when the library is
    unavailable (caller falls back to the Python implementation)."""
    lib = _load()
    if lib is None:
        return None
    weights = np.ascontiguousarray(nbr_logits, dtype=np.float32)
    deg = np.ascontiguousarray(degrees, dtype=np.int32)
    n, d = weights.shape
    prob = np.empty((n, d), np.float32)
    idx = np.empty((n, d), np.int32)
    lib.build_alias_tables(
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        d,
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return prob, idx
