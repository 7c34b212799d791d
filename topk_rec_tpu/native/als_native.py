"""ctypes bindings for the native CPU ALS solver (libtkr_native.so)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .io_native import _load


def available() -> bool:
    lib = _load()
    if lib is None:
        return False
    return hasattr(lib, "tkr_als_half_sweep")


def als_half_sweep(
    this_emb: np.ndarray,
    other_emb: np.ndarray,
    indptr: np.ndarray,
    flat: np.ndarray,
    rated_other: np.ndarray,
    a: float,
    b: float,
    lam: float,
    prior: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Native one-sided ALS update; same semantics as ops.als.half_sweep."""
    lib = _load()
    assert lib is not None
    fn = lib.tkr_als_half_sweep
    fn.restype = ctypes.c_int
    out = np.ascontiguousarray(this_emb, dtype=np.float32).copy()
    other = np.ascontiguousarray(other_emb, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    rated = np.ascontiguousarray(rated_other, dtype=np.int32)
    prior_arr = (
        np.ascontiguousarray(prior, dtype=np.float32)
        if prior is not None
        else None
    )
    fptr = lambda arr: arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda arr: arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    rc = fn(
        fptr(out),
        ctypes.c_longlong(out.shape[0]),
        fptr(other),
        ctypes.c_longlong(other.shape[0]),
        iptr(indptr),
        iptr(flat),
        iptr(rated),
        ctypes.c_longlong(rated.shape[0]),
        ctypes.c_int(out.shape[1]),
        ctypes.c_float(a),
        ctypes.c_float(b),
        ctypes.c_float(lam),
        fptr(prior_arr) if prior_arr is not None else None,
    )
    if rc != 0:
        raise RuntimeError(f"native ALS solve failed (rc={rc})")
    return out
