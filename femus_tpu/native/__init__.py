"""Native (C++) setup kernels, built on first import and loaded via ctypes.

The reference's setup-critical native machinery — METIS element partitioning
(MeshMetisPartitioning.cpp:41-99) and CSR sparsity construction
(LinearEquation.hpp:161) — has C++ equivalents here; Python callers fall
back to NumPy implementations when the toolchain is unavailable.

Build model: ``g++ -O3 -shared -fPIC`` into ``_femus_native_<hash>.so``
next to the source; the hash of the source file keys the cache so edits
rebuild automatically.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "femus_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        so = os.path.join(_DIR, f"_femus_native_{tag}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", so, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.rcb_partition.argtypes = [ctypes.c_int64, ctypes.c_int32, f64p,
                                      ctypes.c_int32, i32p]
        lib.greedy_graph_partition.argtypes = [
            ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int32,
            ctypes.c_int32, i32p]
        lib.edge_cut.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p, i32p]
        lib.edge_cut.restype = ctypes.c_int64
        lib.csr_from_coo.argtypes = [ctypes.c_int64, i64p, i64p,
                                     ctypes.c_int64, i64p, i64p]
        lib.csr_from_coo.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def rcb_partition(centroids: np.ndarray, nparts: int) -> np.ndarray:
    """Recursive coordinate bisection of element centroids -> part ids."""
    cent = np.ascontiguousarray(centroids, np.float64)
    ne, dim = cent.shape
    out = np.empty(ne, np.int32)
    lib = _build_and_load()
    if lib is not None:
        lib.rcb_partition(ne, dim, cent, nparts, out)
        return out
    # NumPy fallback: same recursion
    def rec(ids, p0, np_):
        if np_ <= 1 or len(ids) <= 1:
            out[ids] = p0
            return
        c = cent[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        nl = np_ // 2
        k = max(1, min(len(ids) - 1, len(ids) * nl // np_))
        order = np.argpartition(c[:, axis], k)
        rec(ids[order[:k]], p0, nl)
        rec(ids[order[k:]], p0 + nl, np_ - nl)
    rec(np.arange(ne), 0, nparts)
    return out


def greedy_graph_partition(neigh: np.ndarray, nparts: int,
                           sweeps: int = 6) -> np.ndarray:
    """BFS region growing over the element dual graph + refinement sweeps
    (METIS K-way stand-in)."""
    nb = np.ascontiguousarray(neigh, np.int32)
    ne, nf = nb.shape
    out = np.empty(ne, np.int32)
    lib = _build_and_load()
    if lib is not None:
        lib.greedy_graph_partition(ne, nf, nb, nparts, sweeps, out)
        return out
    # NumPy/Python fallback (slow; small meshes only)
    part = np.full(ne, -1, np.int32)
    size = np.zeros(nparts, np.int64)
    target = -(-ne // nparts)
    seed = 0
    from collections import deque
    for p in range(nparts):
        while seed < ne and part[seed] >= 0:
            seed += 1
        if seed >= ne:
            break
        q = deque([seed])
        part[seed] = p
        size[p] += 1
        while q and size[p] < target:
            e = q.popleft()
            for o in nb[e]:
                if o >= 0 and part[o] < 0 and size[p] < target:
                    part[o] = p
                    size[p] += 1
                    q.append(o)
    for e in range(ne):
        if part[e] < 0:
            ns = [part[o] for o in nb[e] if o >= 0 and part[o] >= 0]
            part[e] = ns[0] if ns else int(np.argmin(size))
            size[part[e]] += 1
    out[:] = part
    return out


def edge_cut(neigh: np.ndarray, part: np.ndarray) -> int:
    nb = np.ascontiguousarray(neigh, np.int32)
    pt = np.ascontiguousarray(part, np.int32)
    lib = _build_and_load()
    if lib is not None:
        return int(lib.edge_cut(nb.shape[0], nb.shape[1], nb, pt))
    e = np.repeat(np.arange(nb.shape[0]), nb.shape[1])
    o = nb.ravel()
    sel = (o >= 0) & (o > e)
    return int(np.sum(pt[e[sel]] != pt[o[sel]]))


def csr_from_coo(rows: np.ndarray, cols: np.ndarray,
                 n_rows: int):
    """(indptr, indices) with sorted, deduplicated columns per row."""
    r = np.ascontiguousarray(rows, np.int64)
    c = np.ascontiguousarray(cols, np.int64)
    lib = _build_and_load()
    if lib is not None:
        indptr = np.empty(n_rows + 1, np.int64)
        indices = np.empty(len(r), np.int64)
        nnz = lib.csr_from_coo(len(r), r, c, n_rows, indptr, indices)
        return indptr, indices[:nnz].copy()
    import scipy.sparse as sp
    m = sp.csr_matrix((np.ones(len(r), np.int8), (r, c)))
    m.resize(n_rows, max(int(c.max()) + 1, 1) if len(c) else 1)
    m.sum_duplicates()
    m.sort_indices()
    return m.indptr.astype(np.int64), m.indices.astype(np.int64)
