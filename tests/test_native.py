"""Native-layer tests: C++ kernels vs numpy fallbacks (itsolvers_native.cpp)."""

import numpy as np
import pytest

from iterativesolvers_tpu import native
from iterativesolvers_tpu.operators.sparse import CSRMatrix, csr_from_dense
from iterativesolvers_tpu.utils.io import load_matrix_market


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of itsolvers_native failed"


def test_coo_to_csr_matches_numpy(rng):
    n, nnz = 50, 400
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.random(nnz)
    indptr, indices, data = native.coo_to_csr(rows, cols, vals, n)
    indptr2, indices2, data2 = native._coo_to_csr_numpy(
        rows.astype(np.int64), cols.astype(np.int64), vals, n
    )
    np.testing.assert_array_equal(indptr, indptr2)
    np.testing.assert_array_equal(indices, indices2)
    np.testing.assert_allclose(data, data2)
    # dense reconstruction equals scatter-add
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    A = CSRMatrix(data, indices, indptr, (n, n))
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-12)


def test_level_schedule_matches_python(rng):
    n = 60
    T = np.tril(rng.random((n, n)), -1)
    T[T < 0.8] = 0.0
    csr = csr_from_dense(T)
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    lv = native.level_schedule(indptr, indices, n, lower=True)
    # python reference
    ref = np.zeros(n, np.int64)
    for r in range(n):
        deps = indices[indptr[r]: indptr[r + 1]]
        if deps.size:
            ref[r] = ref[deps].max() + 1
    np.testing.assert_array_equal(lv, ref)


def test_csr_to_ell(rng):
    n = 30
    M = rng.random((n, n))
    M[M < 0.7] = 0.0
    csr = csr_from_dense(M)
    ell = csr.to_ell()
    np.testing.assert_allclose(
        np.asarray(ell.to_dense()), np.asarray(csr.to_dense()), rtol=1e-12
    )


@pytest.mark.parametrize("symmetry,field", [
    ("general", "real"), ("symmetric", "real"), ("general", "pattern"),
])
def test_matrix_market_roundtrip(tmp_path, rng, symmetry, field):
    n, nnz = 12, 30
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.random(nnz).round(6)
    if symmetry == "symmetric":
        keep = rows >= cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    path = tmp_path / "test.mtx"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        f.write("% comment line\n")
        f.write(f"{n} {n} {rows.size}\n")
        for r, c, v in zip(rows, cols, vals):
            if field == "pattern":
                f.write(f"{r+1} {c+1}\n")
            else:
                f.write(f"{r+1} {c+1} {v}\n")
    A = load_matrix_market(str(path))
    dense = np.zeros((n, n))
    use_vals = np.ones_like(vals) if field == "pattern" else vals
    np.add.at(dense, (rows, cols), use_vals)
    if symmetry == "symmetric":
        off = rows != cols
        np.add.at(dense, (cols[off], rows[off]), use_vals[off])
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-10)


def test_extract_diagonal(rng):
    n = 20
    M = rng.random((n, n)) + np.eye(n)
    csr = csr_from_dense(M)
    diag, bad = native.extract_diagonal(
        np.asarray(csr.indptr), np.asarray(csr.indices), np.asarray(csr.data), n
    )
    assert bad == -1
    np.testing.assert_allclose(diag, np.diagonal(M), rtol=1e-12)
    # missing diagonal detected
    M2 = M.copy()
    M2[5, 5] = 0.0
    csr2 = csr_from_dense(M2)
    _, bad2 = native.extract_diagonal(
        np.asarray(csr2.indptr), np.asarray(csr2.indices),
        np.asarray(csr2.data), n,
    )
    assert bad2 == 5
