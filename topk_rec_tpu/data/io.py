"""Flat-file IO: id vocabularies, ratings folds, and .dat matrix interchange.

Reproduces the data contracts of the reference exactly (formats documented
in reference README.md:56-69):

* id files (``uid`` / ``vid`` / ``*.idl``): one raw id per line; the index of
  an id is its line number (reference utils.py:10-16).
* ratings folds (``f{n}tr.txt`` / ``f{n}te.{im,om}.txt``): lines of
  ``uid,iid:like,iid:like,...``; an interaction is a *positive* iff
  ``like == '1'`` (reference utils.py:58-70); every mentioned item counts as
  *browsed* history regardless of like (reference utils.py:73-89).
* ``final-U/V/B/E.dat``: row-major space-separated ``%f`` text matrices, row
  order = id-file order (reference utils.py:28-55). This text format is the
  interchange contract with the reference's ``evaluate.py`` CLI, so we emit
  byte-compatible files.

A C++ fast path (``topk_rec_tpu.native``) accelerates the hot parsers when
the shared library is built; the NumPy implementations below are the
always-available fallback and the behavioral spec.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_id_map(path: str) -> Dict[str, int]:
    """Map raw id string -> dense index (line order). Ref: utils.py:10-16."""
    ids: Dict[str, int] = {}
    with open(path, "r") as f:
        for line in f:
            tid = line.strip()
            ids[tid] = len(ids)
    return ids


def load_inverse_id_map(path: str) -> Dict[int, str]:
    """Map dense index -> raw id string. Ref: utils.py:19-25."""
    ivt: Dict[int, str] = {}
    with open(path, "r") as f:
        for line in f:
            ivt[len(ivt)] = line.strip()
    return ivt


def parse_ratings(
    path: str,
    uids: Dict[str, int],
    iids: Dict[str, int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a ratings fold file into index arrays.

    Returns ``(pos_u, pos_i, seen_u, seen_i)`` int32 arrays:
      * ``(pos_u, pos_i)``  — positive interactions (``like == '1'``, both ids
        known), the training signal (ref utils.py:58-70).
      * ``(seen_u, seen_i)`` — every (user, item) mention regardless of like:
        the browse history used to exclude already-seen items at evaluation
        time (ref utils.py:73-89, evaluate.py:30-45). Items unknown to
        ``iids`` are dropped from both sets (the reference keeps unknown ids
        in its string-keyed history sets, but they can never match a
        candidate id at evaluation, so dropping is behaviorally identical).
    """
    native = _native_lib()
    if native is not None:
        return native.parse_ratings(path, uids, iids)
    pos_u: List[int] = []
    pos_i: List[int] = []
    seen_u: List[int] = []
    seen_i: List[int] = []
    with open(path, "r") as f:
        for line in f:
            terms = line.strip().split(",")
            uid = terms[0]
            if uid not in uids or len(terms) <= 1:
                continue
            u = uids[uid]
            for term in terms[1:]:
                iid, _, like = term.partition(":")
                i = iids.get(iid)
                if i is None:
                    continue
                seen_u.append(u)
                seen_i.append(i)
                if like == "1":
                    pos_u.append(u)
                    pos_i.append(i)
    return (
        np.asarray(pos_u, dtype=np.int32),
        np.asarray(pos_i, dtype=np.int32),
        np.asarray(seen_u, dtype=np.int32),
        np.asarray(seen_i, dtype=np.int32),
    )


def read_dat(path: str, ids: Optional[Dict[str, int]] = None) -> np.ndarray:
    """Read a space-separated text matrix (``final-*.dat``).

    Row order in the file already matches id-file order (writers iterate rows
    in index order), so ``ids`` is used only to validate the row count.
    Ref: utils.py:28-44 (get_embed_from_file).
    """
    native = _native_lib()
    if native is not None:
        # C strtof parse (~6x the Python split path at MovieLens scale);
        # rectangularity validation below is shared with the Python spec
        flat, n_rows, n_cols = native.parse_dat(path)
        if n_rows == 0:
            return np.zeros((0, 0), dtype=np.float32)
    else:
        with open(path, "r") as f:
            content = f.read()
        lines = content.splitlines()
        while lines and not lines[-1].strip():
            lines.pop()
        n_rows = len(lines)
        if n_rows == 0:
            return np.zeros((0, 0), dtype=np.float32)
        n_cols = len(lines[0].split())
        try:
            flat = np.array(content.split(), dtype=np.float32)
        except ValueError as e:
            raise ValueError(
                f"{path}: malformed .dat — non-numeric value in the matrix "
                f"({e})"
            ) from None
    if n_cols == 0 or flat.size != n_rows * n_cols:
        raise ValueError(
            f"{path}: malformed .dat — expected a rectangular "
            f"space-separated float matrix ({n_rows} rows x {n_cols} cols "
            f"from the first row = {n_rows * n_cols} values, found "
            f"{flat.size})"
        )
    mat = flat.reshape(n_rows, n_cols)
    if ids is not None and len(ids) != n_rows:
        raise ValueError(
            f"{path}: expected {len(ids)} rows from id map, found {n_rows}"
        )
    return mat


def write_dat(path: str, mat: np.ndarray) -> None:
    """Write a matrix in the reference's ``%f``-per-value text format.

    Byte-compatible with reference utils.py:47-55 (export_embed_to_file):
    each line is ``%f %f ... %f \\n`` — six-decimal fixed point with a
    trailing space before the newline.
    """
    parent = os.path.dirname(path)
    if parent and not os.path.isdir(parent):
        os.makedirs(parent, exist_ok=True)
    mat = np.asarray(mat)
    if mat.ndim == 1:
        mat = mat.reshape(-1, 1)
    native = _native_lib()
    if native is not None and native.write_dat(path, mat):
        return
    with open(path, "w") as f:
        for row in mat:
            f.write(" ".join("%f" % v for v in row))
            f.write(" \n")


def load_features(
    content_file: str,
    feat_id_file: str,
    item_ids: Dict[str, int],
    d: Optional[int] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Load a pickled per-item feature matrix and align rows to item order.

    Mirrors reference single/rec.py:23-33 (REC.load_content_data): the pickle
    holds one feature row per id in ``feat_id_file``; rows are re-ordered to
    the training item index; items missing from the feature file get zero
    rows; scipy-sparse payloads are densified.
    """
    import scipy.sparse as ss

    fiids = load_id_map(feat_id_file)
    with open(content_file, "rb") as f:
        feat = pickle.load(f, encoding="latin1")
    if ss.issparse(feat):
        feat = feat.toarray()
    feat = np.asarray(feat, dtype=dtype)
    if d is None:
        d = feat.shape[1]
    out = np.zeros((len(item_ids), d), dtype=dtype)
    for iid, idx in item_ids.items():
        src = fiids.get(iid)
        if src is not None:
            out[idx, :] = feat[src, :]
    return out


def read_mfp(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read the legacy sparse ``.mfp`` format into CSR arrays.

    Each line is ``count id1 id2 ...`` (reference old/cr/data.h:1-6,
    data.cpp:17-39 — the native solver's user-major / item-major inputs).
    Returns (indptr [n_rows+1], flat ids [nnz]) int32.
    """
    indptr = [0]
    flat: List[int] = []
    with open(path, "r") as f:
        for line in f:
            terms = line.split()
            if not terms:
                continue
            count = int(terms[0])
            ids = [int(t) for t in terms[1 : 1 + count]]
            flat.extend(ids)
            indptr.append(len(flat))
    return (
        np.asarray(indptr, dtype=np.int32),
        np.asarray(flat, dtype=np.int32),
    )


def write_mfp(path: str, indptr: np.ndarray, flat: np.ndarray) -> None:
    """Write CSR arrays in the legacy ``.mfp`` format."""
    with open(path, "w") as f:
        for r in range(len(indptr) - 1):
            ids = flat[indptr[r]:indptr[r + 1]]
            f.write(str(len(ids)))
            for i in ids:
                f.write(f" {i}")
            f.write("\n")


# ---------------------------------------------------------------------------
# Native fast-path plumbing

_NATIVE = None
_NATIVE_CHECKED = False


def _native_lib():
    """Return the C++ IO accelerator module, or None if unavailable."""
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from ..native import io_native as _io_native

            if _io_native.available():
                _NATIVE = _io_native
        except Exception:
            _NATIVE = None
    return _NATIVE
