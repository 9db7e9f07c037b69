"""ctypes bindings for the native host graph runtime (csrc/graphlib.cpp).

Compiled on first use with g++ -O3 -fopenmp and cached next to the source.
Every entry point has a pure-numpy fallback so the package works without a
toolchain; the native path is used for large-graph preprocessing and as the
reference oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "graphlib.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "csrc", "libgraphlib.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", os.path.abspath(_SRC), "-o", os.path.abspath(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without -march=native
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_SO))
        except OSError:
            return None

        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

        lib.mult_create.restype = ctypes.c_void_p
        lib.mult_create.argtypes = [f32p, ctypes.c_int]
        lib.mult_destroy.argtypes = [ctypes.c_void_p]
        lib.mult_total.restype = ctypes.c_double
        lib.mult_total.argtypes = [ctypes.c_void_p]
        lib.mult_query.restype = ctypes.c_int
        lib.mult_query.argtypes = [ctypes.c_void_p, ctypes.c_double]

        lib.sample_row.restype = ctypes.c_float
        lib.sample_row.argtypes = [i32p, f32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_uint64, ctypes.c_int, i32p, f32p]

        lib.slice_nnz.restype = ctypes.c_int64
        lib.slice_nnz.argtypes = [i32p, i32p, ctypes.c_int]
        lib.slice_fill.argtypes = [i32p, i32p, f32p, i32p, ctypes.c_int,
                                   i64p, i32p, i32p, f32p]
        lib.dense_slice.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int,
                                    f32p]
        lib.build_padded.argtypes = [i32p, i32p, f32p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_uint64, i32p, f32p, i32p]
        lib.max_degree.restype = ctypes.c_int
        lib.max_degree.argtypes = [i32p, ctypes.c_int]
        _lib = lib
        return _lib


class MultSampler:
    """Fenwick multinomial sampler without replacement (gcn/mult.cpp role).

    ``query(u)`` draws index i with prob proportional to the remaining
    weight and removes it; u is uniform in [0,1)."""

    def __init__(self, probs):
        self.probs = np.ascontiguousarray(probs, np.float32)
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.mult_create(self.probs, len(self.probs))
        else:
            self._h = None
            self._remaining = self.probs.astype(np.float64).copy()

    def total(self) -> float:
        if self._h is not None:
            return float(self._lib.mult_total(self._h))
        return float(self._remaining.sum())

    def query(self, u: float) -> int:
        if self._h is not None:
            return int(self._lib.mult_query(self._h, float(u)))
        cum = np.cumsum(self._remaining)
        target = u * cum[-1]
        idx = int(np.searchsorted(cum, target, side="right"))
        idx = min(idx, len(self._remaining) - 1)
        self._remaining[idx] = 0.0
        return idx

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.mult_destroy(self._h)


def sample_row(indices, data, k: int, seed: int, sentinel: int):
    """Oracle uniform k-without-replacement row sample with unbiased rescale
    (scheduler.cpp:126-147 semantics).  Returns (ids [k], w [k], scale)."""
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    deg = len(indices)
    ids = np.empty(k, np.int32)
    w = np.empty(k, np.float32)
    lib = get_lib()
    if lib is not None:
        scale = lib.sample_row(indices, data, deg, k, seed, sentinel, ids, w)
        return ids, w, float(scale)
    rng = np.random.default_rng(seed)
    take = min(deg, k)
    scale = 1.0 if deg == 0 else deg / max(take, 1)
    pick = rng.choice(deg, size=take, replace=False) if take else []
    ids[:take] = indices[pick]
    w[:take] = data[pick] * scale
    ids[take:] = sentinel
    w[take:] = 0.0
    return ids, w, float(scale)


def csr_slice(csr, rows):
    """(coo_idx [nnz,2], values, shape) row slice of a CSR matrix
    (gcn/_history.pyx:25-49 role)."""
    rows = np.ascontiguousarray(rows, np.int32)
    lib = get_lib()
    if lib is None:
        sub = csr[rows]
        coo = sub.tocoo()
        idx = np.stack([coo.row, coo.col], axis=1).astype(np.int32)
        return idx, coo.data.astype(np.float32), sub.shape
    indptr = np.ascontiguousarray(csr.indptr, np.int32)
    indices = np.ascontiguousarray(csr.indices, np.int32)
    data = np.ascontiguousarray(csr.data, np.float32)
    per_row = indptr[rows + 1].astype(np.int64) - indptr[rows]
    offsets = np.concatenate([[0], np.cumsum(per_row)]).astype(np.int64)
    nnz = int(offsets[-1])
    coo_r = np.empty(nnz, np.int32)
    coo_c = np.empty(nnz, np.int32)
    vals = np.empty(nnz, np.float32)
    lib.slice_fill(indptr, indices, data, rows, len(rows),
                   np.ascontiguousarray(offsets[:-1]), coo_r, coo_c, vals)
    return (np.stack([coo_r, coo_c], axis=1), vals,
            (len(rows), csr.shape[1]))


def dense_slice(x, rows):
    """Fast dense row gather (gcn/_history.pyx:52-62 role)."""
    x = np.ascontiguousarray(x, np.float32)
    rows = np.ascontiguousarray(rows, np.int32)
    lib = get_lib()
    if lib is None:
        return x[rows]
    out = np.empty((len(rows), x.shape[1]), np.float32)
    lib.dense_slice(x, x.shape[1], rows, len(rows), out)
    return out


def build_padded_arrays(csr, pad_degree: int = -1, cap_random: bool = True,
                        seed: int = 0):
    """Native fast path for PaddedGraph construction: returns
    (nbr [N+1,D], w [N+1,D], deg [N+1]) numpy arrays."""
    n = csr.shape[0]
    indptr = np.ascontiguousarray(csr.indptr, np.int32)
    indices = np.ascontiguousarray(csr.indices, np.int32)
    data = np.ascontiguousarray(csr.data, np.float32)
    lib = get_lib()
    if pad_degree == -1:
        if lib is not None:
            dcap = int(lib.max_degree(indptr, n))
        else:
            dcap = int(np.diff(indptr).max()) if n else 1
    else:
        dcap = int(pad_degree)
    dcap = max(dcap, 1)
    if lib is None:
        return None, dcap
    nbr = np.empty((n + 1, dcap), np.int32)
    w = np.empty((n + 1, dcap), np.float32)
    deg = np.empty(n + 1, np.int32)
    lib.build_padded(indptr, indices, data, n, dcap, int(cap_random), seed,
                     nbr, w, deg)
    return (nbr, w, deg), dcap
