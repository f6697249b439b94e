"""ctypes bindings for the native host-side runtime (itsolvers_native.cpp).

The shared library is built lazily on first use (g++ -O3, cached next to this
file).  Every entry point has a numpy fallback, so the package works even
without a toolchain — the native path is the fast one for big matrices
(COO->CSR sort, level scheduling, MatrixMarket parsing are O(n)/O(nnz)
passes that are interpreter-bound in pure Python).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "itsolvers_native.cpp")
_SO = os.path.join(_HERE, "itsolvers_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return ctypes.CDLL(_SO)
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.coo_to_csr.restype = ctypes.c_int64
                lib.level_schedule.restype = ctypes.c_int64
                lib.mm_read.restype = ctypes.c_int64
                lib.extract_diagonal.restype = ctypes.c_int64
                lib.ilu0.restype = ctypes.c_int64
                lib.ic0.restype = ctypes.c_int64
            _lib = lib
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(t)


def coo_to_csr(rows, cols, vals, n_rows: int):
    """Sorted, deduped CSR from COO.  Returns (indptr i64, indices i32,
    data f64 view of vals dtype... data returned as float64)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals64 = np.ascontiguousarray(vals, np.float64)
    # the C++ counting sort indexes raw buffers with these (count[row+1]++,
    # int32 cast of col) — out-of-range input must never reach it
    if rows.size and (int(rows.min()) < 0 or int(rows.max()) >= n_rows):
        raise ValueError(
            f"row indices out of range [0, {n_rows}): "
            f"[{rows.min()}, {rows.max()}]"
        )
    if cols.size and (int(cols.min()) < 0 or int(cols.max()) >= 2**31):
        raise ValueError("column indices must fit int32 and be >= 0")
    lib = get_lib()
    if lib is None:
        return _coo_to_csr_numpy(rows, cols, vals64, n_rows)
    nnz = rows.size
    nnz_out = lib.coo_to_csr(
        _ptr(rows, _i64p), _ptr(cols, _i64p), _ptr(vals64, _f64p),
        ctypes.c_int64(nnz), ctypes.c_int64(n_rows),
        None, None, None,
    )
    indptr = np.empty(n_rows + 1, np.int64)
    indices = np.empty(nnz_out, np.int32)
    data = np.empty(nnz_out, np.float64)
    lib.coo_to_csr(
        _ptr(rows, _i64p), _ptr(cols, _i64p), _ptr(vals64, _f64p),
        ctypes.c_int64(nnz), ctypes.c_int64(n_rows),
        _ptr(indptr, _i64p), _ptr(indices, _i32p), _ptr(data, _f64p),
    )
    return indptr, indices, data


def _coo_to_csr_numpy(rows, cols, vals, n_rows):
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    if rows.size:
        new = np.empty(rows.size, bool)
        new[0] = True
        new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        grp = np.cumsum(new) - 1
        merged = np.zeros(int(grp[-1]) + 1, vals.dtype)
        np.add.at(merged, grp, vals)
        rows, cols, vals = rows[new], cols[new], merged
    indptr = np.zeros(n_rows + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    return np.cumsum(indptr), cols.astype(np.int32), vals


def level_schedule(indptr, indices, n: int, lower: bool) -> np.ndarray:
    """Dependency levels of a strict-triangular CSR (see ops/triangular.py)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = get_lib()
    level = np.zeros(n, np.int64)
    if lib is None:
        order = range(n) if lower else range(n - 1, -1, -1)
        for r in order:
            deps = indices[indptr[r]: indptr[r + 1]]
            if deps.size:
                level[r] = level[deps].max() + 1
        return level
    lib.level_schedule(
        _ptr(indptr, _i64p), _ptr(indices, _i32p),
        ctypes.c_int64(n), ctypes.c_int32(1 if lower else 0),
        _ptr(level, _i64p),
    )
    return level


def csr_to_ell(indptr, indices, data, n: int, width: int):
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data64 = np.ascontiguousarray(data, np.float64)
    lib = get_lib()
    if lib is None:
        cols = np.zeros((n, width), np.int32)
        out = np.zeros((n, width), np.float64)
        for r in range(n):
            lo, hi = indptr[r], indptr[r + 1]
            w = min(hi - lo, width)
            cols[r, :w] = indices[lo: lo + w]
            out[r, :w] = data64[lo: lo + w]
        return cols, out
    cols = np.empty((n, width), np.int32)
    out = np.empty((n, width), np.float64)
    lib.csr_to_ell(
        _ptr(indptr, _i64p), _ptr(indices, _i32p), _ptr(data64, _f64p),
        ctypes.c_int64(n), ctypes.c_int64(width),
        _ptr(cols, _i32p), _ptr(out, _f64p),
    )
    return cols, out


def mm_read(path: str) -> Tuple[Tuple[int, int], np.ndarray, np.ndarray, np.ndarray]:
    """Parse a MatrixMarket coordinate file (real/integer/pattern;
    general/symmetric/skew).  Returns ((m, n), rows, cols, vals) in COO,
    symmetry expanded.  ~ the loaders in benchmark/matrixmarket.jl."""
    lib = get_lib()
    if lib is None:
        return _mm_read_python(path)
    shape = np.zeros(2, np.int64)
    cnt = lib.mm_read(
        path.encode(), _ptr(shape, _i64p), None, None, None
    )
    if cnt < 0:
        raise ValueError(f"failed to parse MatrixMarket file {path} ({cnt})")
    rows = np.empty(cnt, np.int64)
    cols = np.empty(cnt, np.int64)
    vals = np.empty(cnt, np.float64)
    lib.mm_read(
        path.encode(), _ptr(shape, _i64p),
        _ptr(rows, _i64p), _ptr(cols, _i64p), _ptr(vals, _f64p),
    )
    return (int(shape[0]), int(shape[1])), rows, cols, vals


def _mm_read_python(path):
    with open(path) as f:
        header = f.readline().split()
        if len(header) < 5 or header[2] != "coordinate" or header[3] == "complex":
            raise ValueError(f"unsupported MatrixMarket format in {path}")
        pattern = header[3] == "pattern"
        sym = header[4] in ("symmetric", "skew-symmetric")
        skew = header[4] == "skew-symmetric"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        m, n, nnz = (int(t) for t in line.split())
        rows, cols, vals = [], [], []
        for _ in range(nnz):
            parts = f.readline().split()
            r, c = int(parts[0]) - 1, int(parts[1]) - 1
            v = 1.0 if pattern else float(parts[2])
            rows.append(r); cols.append(c); vals.append(v)
            if sym and r != c:
                rows.append(c); cols.append(r); vals.append(-v if skew else v)
    return (m, n), np.asarray(rows), np.asarray(cols), np.asarray(vals)


def extract_diagonal(indptr, indices, data, n: int):
    """(diag, first_bad_index or -1) — ~ DiagonalIndices singular check."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data64 = np.ascontiguousarray(data, np.float64)
    lib = get_lib()
    diag = np.zeros(n, np.float64)
    if lib is None:
        bad = -1
        for r in range(n):
            seg = indices[indptr[r]: indptr[r + 1]]
            hit = np.where(seg == r)[0]
            if hit.size:
                diag[r] = data64[indptr[r] + hit[0]]
            if (hit.size == 0 or diag[r] == 0.0) and bad < 0:
                bad = r
        return diag, bad
    bad = lib.extract_diagonal(
        _ptr(indptr, _i64p), _ptr(indices, _i32p), _ptr(data64, _f64p),
        ctypes.c_int64(n), _ptr(diag, _f64p),
    )
    return diag, int(bad)


def greedy_coloring(indptr, indices, n: int):
    """(colors (n,), ncolors): greedy multicoloring of the sparsity graph.
    Pass the symmetrized pattern for nonsymmetric matrices."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = get_lib()
    color = np.zeros(n, np.int64)
    if lib is None:
        mark = np.full(n, -1, np.int64)
        nc = 0
        for r in range(n):
            seg = indices[indptr[r]: indptr[r + 1]]
            for j in seg:
                if j < r:
                    mark[color[j]] = r
            c = 0
            while c < n and mark[c] == r:
                c += 1
            color[r] = c
            nc = max(nc, c + 1)
        return color, nc
    lib.greedy_coloring.restype = ctypes.c_int64
    nc = lib.greedy_coloring(
        _ptr(indptr, _i64p), _ptr(indices, _i32p), ctypes.c_int64(n),
        _ptr(color, _i64p),
    )
    return color, int(nc)


def rcm_order(indptr, indices, n: int):
    """(perm (n,), bandwidth): reverse Cuthill-McKee ordering of a SYMMETRIC
    sparsity pattern.  ``perm[k]`` is the old index placed at new position k;
    the returned bandwidth is the permuted pattern's half-bandwidth.  Pass
    the symmetrized pattern (A + A^T structure) for nonsymmetric matrices."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = get_lib()
    perm = np.zeros(n, np.int64)
    if lib is not None:
        lib.rcm_order.restype = ctypes.c_int64
        bw = lib.rcm_order(
            _ptr(indptr, _i64p), _ptr(indices, _i32p), ctypes.c_int64(n),
            _ptr(perm, _i64p),
        )
        return perm, int(bw)
    # numpy fallback: plain CM BFS (ascending degree), then reverse
    deg = np.diff(indptr)
    visited = np.zeros(n, bool)
    order = []
    for s in np.argsort(deg, kind="stable"):
        if visited[s]:
            continue
        queue = [int(s)]
        visited[s] = True
        head = 0
        while head < len(queue):
            u = queue[head]
            head += 1
            order.append(u)
            nbrs = [int(v) for v in indices[indptr[u]: indptr[u + 1]]
                    if v != u and v < n and not visited[v]]
            nbrs.sort(key=lambda v: deg[v])
            for v in nbrs:
                visited[v] = True
                queue.append(v)
    perm = np.asarray(order[::-1], np.int64)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    bw = 0
    for r in range(n):
        seg = indices[indptr[r]: indptr[r + 1]]
        if seg.size:
            bw = max(bw, int(np.abs(inv[r] - inv[seg]).max()))
    return perm, bw


def ilu0(indptr, indices, data, n: int):
    """ILU(0) factorization in place on the CSR pattern (IKJ variant):
    returns a copy of ``data`` whose strict lower part is L (unit diagonal
    implied) and whose diagonal + strict upper are U.  Raises on zero pivot
    or a structurally missing diagonal.  Native for real dtypes; generic
    numpy fallback (also used for complex)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.asarray(data)
    # factors are NOT representable in narrowed value dtypes (int8/bf16 from
    # compress_values): factor at f64 and return at float precision
    fdtype = np.result_type(data.dtype, np.float32)
    lib = get_lib()
    if lib is None or np.iscomplexobj(data):
        return _ilu0_numpy(indptr, indices, data.astype(fdtype), n)
    out = np.ascontiguousarray(data, np.float64).copy()
    bad = lib.ilu0(_ptr(indptr, _i64p), _ptr(indices, _i32p),
                   _ptr(out, _f64p), ctypes.c_int64(n))
    if bad >= 0:
        raise ZeroDivisionError(f"ILU(0) zero/missing pivot at row {bad}")
    return out.astype(fdtype)


def _ilu0_numpy(indptr, indices, data, n):
    diag_ptr = np.full(n, -1, np.int64)
    for r in range(n):
        seg = indices[indptr[r]: indptr[r + 1]]
        hit = np.nonzero(seg == r)[0]
        if hit.size == 0:
            raise ZeroDivisionError(f"ILU(0) zero/missing pivot at row {r}")
        diag_ptr[r] = indptr[r] + int(hit[0])
    pos = np.full(n, -1, np.int64)
    for i in range(n):
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        pos[indices[lo:hi]] = np.arange(lo, hi)
        for p in range(lo, int(diag_ptr[i])):
            k = int(indices[p])
            piv = data[diag_ptr[k]]
            if piv == 0:
                raise ZeroDivisionError(f"ILU(0) zero/missing pivot at row {k}")
            lik = data[p] / piv
            data[p] = lik
            q = slice(int(diag_ptr[k]) + 1, int(indptr[k + 1]))
            r2 = pos[indices[q]]
            ok = r2 >= 0
            data[r2[ok]] -= lik * data[q][ok]
        if data[diag_ptr[i]] == 0:
            raise ZeroDivisionError(f"ILU(0) zero/missing pivot at row {i}")
        pos[indices[lo:hi]] = -1
    return data


def ic0(indptr, indices, data, n: int):
    """IC(0) on a LOWER-triangular CSR pattern (row r holds columns <= r,
    sorted, diagonal last): returns the factor L with A ~= L L^H.  Raises on
    breakdown (non-positive pivot)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.asarray(data)
    # see ilu0: never return factors in a narrowed value dtype
    fdtype = np.result_type(data.dtype, np.float32)
    lib = get_lib()
    if lib is None or np.iscomplexobj(data):
        return _ic0_numpy(indptr, indices, data.astype(fdtype), n)
    out = np.ascontiguousarray(data, np.float64).copy()
    bad = lib.ic0(_ptr(indptr, _i64p), _ptr(indices, _i32p),
                  _ptr(out, _f64p), ctypes.c_int64(n))
    if bad >= 0:
        raise ZeroDivisionError(f"IC(0) breakdown at row {bad}")
    return out.astype(fdtype)


def _ic0_numpy(indptr, indices, data, n):
    pos = np.full(n, -1, np.int64)
    for i in range(n):
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        if hi <= lo or indices[hi - 1] != i:
            raise ZeroDivisionError(f"IC(0) breakdown at row {i}")
        pos[indices[lo:hi]] = np.arange(lo, hi)
        for p in range(lo, hi - 1):
            k = int(indices[p])
            s = data[p]
            q = slice(int(indptr[k]), int(indptr[k + 1]) - 1)
            r2 = pos[indices[q]]
            ok = r2 >= 0
            s = s - np.sum(data[r2[ok]] * np.conj(data[q][ok]))
            data[p] = s / data[int(indptr[k + 1]) - 1]
        d = data[hi - 1] - np.sum(np.abs(data[lo:hi - 1]) ** 2)
        if np.real(d) <= 0:
            pos[indices[lo:hi]] = -1
            raise ZeroDivisionError(f"IC(0) breakdown at row {i}")
        data[hi - 1] = np.sqrt(np.real(d))
        pos[indices[lo:hi]] = -1
    return data
