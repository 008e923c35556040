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


_CR_SRC = os.path.join(os.path.dirname(__file__), "co_review.cpp")
_CR_LIB_PATH = os.path.join(os.path.dirname(__file__), "_co_review.so")
_CR_LIB: Optional[ctypes.CDLL] = None
_CR_LOAD_FAILED = False


def _load_co_review() -> Optional[ctypes.CDLL]:
    global _CR_LIB, _CR_LOAD_FAILED
    if _CR_LIB is not None or _CR_LOAD_FAILED:
        return _CR_LIB
    try:
        if not os.path.exists(_CR_LIB_PATH) or os.path.getmtime(
            _CR_LIB_PATH
        ) < os.path.getmtime(_CR_SRC):
            with tempfile.TemporaryDirectory() as tmp:
                out = os.path.join(tmp, "lib.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", out, _CR_SRC],
                    check=True,
                    capture_output=True,
                )
                os.replace(out, _CR_LIB_PATH)
        lib = ctypes.CDLL(_CR_LIB_PATH)
        lib.co_review_build.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
        ]
        lib.co_review_build.restype = ctypes.c_int64
        lib.co_review_fetch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.co_review_fetch.restype = None
        _CR_LIB = lib
    except Exception as e:
        logger.info("native co-review builder unavailable (%s); using scipy", e)
        _CR_LOAD_FAILED = True
    return _CR_LIB


def co_review_edges_native(
    items: np.ndarray,
    users: np.ndarray,
    min_common: int,
    max_pairs: int = 2_000_000_000,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native co-review pair counting (the hot part of the item-graph
    build, reference notebook cell 20): returns (src, dst, common_count)
    with count >= min_common and src < dst, or None when the library is
    unavailable or the pair workload exceeds ``max_pairs`` (caller falls
    back to the scipy sparse-matmul path)."""
    lib = _load_co_review()
    if lib is None:
        return None
    items = np.ascontiguousarray(items, dtype=np.int32)
    users = np.ascontiguousarray(users, dtype=np.int32)
    n_edges = lib.co_review_build(
        items.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(items),
        int(min_common),
        int(max_pairs),
    )
    if n_edges < 0:
        return None
    src = np.empty(n_edges, np.int32)
    dst = np.empty(n_edges, np.int32)
    count = np.empty(n_edges, np.int32)
    lib.co_review_fetch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return src, dst, count


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
