"""Stationary method tests (~ test/stationary.jl).

Covers: convergence on diagonally-dominant problems, GS == SOR(1) sweep-by-
sweep (test/stationary.jl:56-68), singular diagonal raises
(test/stationary.jl:70-84), dense == sparse sweeps, and level-scheduled
triangular solves vs dense ground truth (test/stationary.jl:86-214).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.operators.sparse import csr_from_dense
from iterativesolvers_tpu.ops.triangular import LevelScheduledTriangular
from iterativesolvers_tpu.solvers.stationary import (
    SingularError,
    gauss_seidel,
    gauss_seidel_iterable,
    jacobi,
    jacobi_iterable,
    sor,
    sor_iterable,
    ssor,
)


def _dd_matrix(rng, n, dtype=np.float64):
    """Strictly diagonally dominant random matrix (guaranteed convergence)."""
    A = rng.random((n, n)).astype(dtype)
    A += A.T
    A[np.diag_indices(n)] = 2.0 * np.abs(A).sum(axis=1) + 1.0
    return A


@pytest.mark.parametrize("method", ["jacobi", "gauss_seidel"])
@pytest.mark.parametrize("sparse", [False, True])
def test_converges(rng, method, sparse):
    n = 30
    A = _dd_matrix(rng, n)
    x_true = rng.random(n)
    b = A @ x_true
    op = csr_from_dense(A) if sparse else A
    fn = {"jacobi": jacobi, "gauss_seidel": gauss_seidel}[method]
    x = fn(op, b, maxiter=200)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("sparse", [False, True])
@pytest.mark.parametrize("omega", [0.8, 1.1])
def test_sor_ssor_converge(rng, sparse, omega):
    n = 30
    A = _dd_matrix(rng, n)
    x_true = rng.random(n)
    b = A @ x_true
    op = csr_from_dense(A) if sparse else A
    for fn in (sor, ssor):
        x = fn(op, b, omega, maxiter=300)
        assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("sparse", [False, True])
def test_gs_equals_sor_omega1(rng, sparse):
    """GS and SOR(1.0) produce identical iterates (test/stationary.jl:56-68)."""
    n = 20
    A = _dd_matrix(rng, n)
    b = rng.random(n)
    op = csr_from_dense(A) if sparse else A
    it_gs = gauss_seidel_iterable(op, b, maxiter=5)
    it_sor = sor_iterable(op, b, 1.0, maxiter=5)
    for xg, xs in zip(it_gs, it_sor):
        np.testing.assert_allclose(np.asarray(xg), np.asarray(xs), rtol=1e-12)


def test_dense_matches_sparse(rng):
    n = 25
    A = _dd_matrix(rng, n)
    b = rng.random(n)
    for fn, args in ((jacobi, ()), (gauss_seidel, ()), (sor, (1.2,)), (ssor, (1.2,))):
        xd = fn(A, b, *args, maxiter=7)
        xs = fn(csr_from_dense(A), b, *args, maxiter=7)
        np.testing.assert_allclose(np.asarray(xd), np.asarray(xs), rtol=1e-10, atol=1e-12)


def test_singular_diagonal_raises(rng):
    A = _dd_matrix(rng, 10)
    A[3, 3] = 0.0
    b = rng.random(10)
    for fn, args in ((jacobi, ()), (gauss_seidel, ()), (sor, (1.1,))):
        with pytest.raises(SingularError):
            fn(A, b, *args)
        with pytest.raises(SingularError):
            fn(csr_from_dense(A), b, *args)


def test_missing_sparse_diagonal_raises(rng):
    A = _dd_matrix(rng, 10)
    csr = csr_from_dense(A)
    # structurally remove a diagonal entry
    import numpy as np2

    rows = np2.asarray(csr.row_ids)
    cols = np2.asarray(csr.indices)
    vals = np2.asarray(csr.data)
    keep = ~((rows == 5) & (cols == 5))
    from iterativesolvers_tpu.operators.sparse import CSRMatrix

    broken = CSRMatrix.from_coo(rows[keep], cols[keep], vals[keep], (10, 10))
    with pytest.raises(SingularError):
        gauss_seidel(broken, np2.ones(10))


@pytest.mark.parametrize("lower", [True, False])
def test_level_scheduled_triangular_vs_dense(rng, lower):
    """(D + T) y = rhs matches dense solve (test/stationary.jl:86-214)."""
    n = 40
    T = np.tril(rng.random((n, n)), -1) if lower else np.triu(rng.random((n, n)), 1)
    T[np.abs(T) < 0.7] = 0.0  # sparsify
    d = rng.random(n) + 1.0
    csr = csr_from_dense(T)
    ls = LevelScheduledTriangular.from_csr(
        np.asarray(csr.indptr), np.asarray(csr.indices), np.asarray(csr.data),
        d, lower=lower,
    )
    rhs = rng.random(n)
    y = np.asarray(ls.solve(jnp.asarray(rhs)))
    y_ref = np.linalg.solve(T + np.diag(d), rhs)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)
    # omega-scaled diagonal variant
    y2 = np.asarray(ls.solve(jnp.asarray(rhs), omega=1.3))
    y2_ref = np.linalg.solve(T + np.diag(d / 1.3), rhs)
    np.testing.assert_allclose(y2, y2_ref, rtol=1e-10)


def test_jacobi_iterable_checkpoint(rng):
    """Iterator exposes state between sweeps (docs/src/iterators.md)."""
    n = 15
    A = _dd_matrix(rng, n)
    b = rng.random(n)
    it = jacobi_iterable(A, b, maxiter=50)
    for i, x in enumerate(it):
        if i == 3:
            break
    x_mid = np.asarray(it.state.x)
    x_direct = np.asarray(jacobi(A, b, maxiter=4))
    np.testing.assert_allclose(x_mid, x_direct, rtol=1e-12)


@pytest.mark.parametrize("method,args", [
    ("gauss_seidel", ()), ("sor", (1.1,)), ("ssor", (1.1,)),
])
def test_multicolor_ordering_converges(rng, method, args):
    """ordering='multicolor': greedy-coloring sweeps reach the same fixed
    point (update order differs from natural — documented deviation)."""
    n = 40
    A = _dd_matrix(rng, n)
    x_true = rng.random(n)
    b = A @ x_true
    fn = {"gauss_seidel": gauss_seidel, "sor": sor, "ssor": ssor}[method]
    for op in (A, csr_from_dense(A)):
        x = fn(op, b, *args, maxiter=300, ordering="multicolor")
        assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_multicolor_coloring_valid(rng):
    from iterativesolvers_tpu import native

    n = 80
    M = rng.random((n, n))
    M[M < 0.85] = 0
    M += M.T + np.eye(n)
    csr = csr_from_dense(M)
    color, nc = native.greedy_coloring(
        np.asarray(csr.indptr, np.int64), np.asarray(csr.indices), n
    )
    rows, cols = np.asarray(csr.row_ids), np.asarray(csr.indices)
    off = rows != cols
    assert not np.any(color[rows[off]] == color[cols[off]])
    assert nc == color.max() + 1


def test_stationary_accepts_hyb(rng):
    """HYBMatrix dispatches through the sparse split like CSR/ELL/DIA."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    n = 40
    M = rng.random((n, n))
    M[np.abs(M) < 0.6] = 0
    M = M + M.T + 4 * n * np.eye(n)
    M[2, :] = rng.random(n) * 0.01  # heavy row -> nonempty HYB tail
    M[2, 2] = 4 * n
    hyb = csr_from_dense(M).to_hyb()
    b = rng.random(n)
    for run in (
        lambda: its.jacobi(hyb, b, maxiter=40),
        lambda: its.gauss_seidel(hyb, b, maxiter=40),
        lambda: its.sor(hyb, b, 1.1, maxiter=40, ordering="multicolor"),
    ):
        x = np.asarray(run())
        assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-3


def test_baseline_config3_stationary_and_chebyshev(rng):
    """BASELINE workload 3: stationary sweeps + Chebyshev with spectral
    bounds on the 2-D Laplacian (analytic eigenvalue bounds
    4*sin^2(pi/(2(n+1))) .. 8*cos^2(pi/(2(n+1))) per axis sum)."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    side = 16
    A = laplace_dia(side, 2)
    n = A.shape[0]
    b = np.ones(n)
    lam1 = 2 * (2 - 2 * np.cos(np.pi / (side + 1)))
    lamn = 2 * (2 + 2 * np.cos(np.pi / (side + 1)))
    x, h = its.chebyshev(A, b, lam1, lamn, reltol=1e-8, maxiter=2000, log=True)
    assert h.isconverged
    M = np.asarray(A.to_dense())
    assert np.linalg.norm(M @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-6
    # 20 SOR sweeps reduce the residual (fixed-sweep contract, no conv test)
    xs = np.asarray(its.sor(A, b, 1.5, maxiter=200))
    assert np.linalg.norm(M @ xs - b) < np.linalg.norm(b)


def _dd_complex(rng, n, dtype):
    """Diagonally dominant Hermitian complex matrix."""
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = A + A.conj().T
    A[np.diag_indices(n)] = 2.0 * np.abs(A).sum(axis=1) + 1.0
    return A.astype(dtype)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("sparse", [False, True])
@pytest.mark.parametrize("method", ["jacobi", "gauss_seidel", "sor", "ssor"])
def test_complex_converges(rng, dtype, sparse, method):
    """Complex-eltype sweeps (the reference tests stationary methods over
    ComplexF32/ComplexF64, test/stationary.jl) — exercises the conj paths in
    the splits and triangular sweeps."""
    n = 30
    A = _dd_complex(rng, n, dtype)
    x_true = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(dtype)
    b = A @ x_true
    op = csr_from_dense(A) if sparse else A
    fn = {"jacobi": jacobi, "gauss_seidel": gauss_seidel, "sor": sor, "ssor": ssor}[method]
    kw = {"omega": 1.1} if method in ("sor", "ssor") else {}
    x = fn(op, b, maxiter=300, **kw)
    tol = 2e-5 if dtype == np.complex64 else 1e-10
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < tol
