"""ctypes loader for the native host-side setup kernels (native/fenasetup.cpp).

The reference's setup substrate (DOLFIN mesh topology / dofmap construction)
is C++; this is its TPU-rebuild analogue for the host side of the pipeline —
sparsity patterns and mesh topology reduce to sort-unique over packed int64
keys, which the native radix sort does ~10x faster than ``np.unique``.

Compiled on first import when the shared library is missing (g++ is in the
baked toolchain); every entry point falls back to NumPy when unavailable, so
the package never hard-depends on a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "fenasetup.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_fenasetup.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    # process-unique temp name: concurrent builders (pytest-xdist workers —
    # the threading lock is per-process only) must not interleave object
    # code into one file; os.replace makes the final install atomic
    tmp = f"{_SO}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", tmp],
            check=True, capture_output=True, timeout=300)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        stale = not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO))
        if stale and not _build() and not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # wrong-arch or corrupt binary (e.g. committed x86 .so on a
            # different host): mtimes can't detect this — rebuild once
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.fena_unique_i64.restype = ctypes.c_int64
        lib.fena_unique_i64.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
        lib.fena_searchsorted_i64.restype = ctypes.c_int64
        lib.fena_searchsorted_i64.argtypes = [i64p, ctypes.c_int64, i64p,
                                              ctypes.c_int64, i64p]
        lib.fena_rcm_rank.restype = None
        lib.fena_rcm_rank.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                      ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def unique_i64(keys: np.ndarray):
    """``np.unique(keys, return_inverse=True)`` for non-negative int64 keys."""
    lib = _load()
    keys = _as_i64(keys).ravel()
    if lib is None:
        return np.unique(keys, return_inverse=True)
    n = keys.shape[0]
    uniq = np.empty(n, dtype=np.int64)
    inverse = np.empty(n, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    nu = lib.fena_unique_i64(keys.ctypes.data_as(i64p), n,
                             uniq.ctypes.data_as(i64p),
                             inverse.ctypes.data_as(i64p))
    return uniq[:nu].copy(), inverse


def searchsorted_i64(uniq: np.ndarray, queries: np.ndarray):
    """``(np.searchsorted(uniq, queries), n_exact_hits)`` for sorted uniq."""
    lib = _load()
    uniq = _as_i64(uniq)
    queries = _as_i64(queries).ravel()
    if lib is None:
        pos = np.searchsorted(uniq, queries)
        clip = np.clip(pos, 0, uniq.shape[0] - 1) if uniq.size else pos
        hits = int((uniq[clip] == queries).sum()) if uniq.size else 0
        return pos, hits
    pos = np.empty(queries.shape[0], dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    hits = lib.fena_searchsorted_i64(
        uniq.ctypes.data_as(i64p), uniq.shape[0],
        queries.ctypes.data_as(i64p), queries.shape[0],
        pos.ctypes.data_as(i64p))
    return pos, int(hits)


def rcm_rank(cell_dofs: np.ndarray, ndof: int) -> np.ndarray:
    """RCM rank (old dof -> new dof) from cell connectivity."""
    lib = _load()
    if lib is None:
        return None                     # caller falls back to scipy
    cd = np.ascontiguousarray(cell_dofs, dtype=np.int32)
    rank = np.empty(ndof, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fena_rcm_rank(cd.ctypes.data_as(i32p), cd.shape[0], cd.shape[1],
                      ndof, rank.ctypes.data_as(i32p))
    return rank
