"""LOBPCG tests (~ test/lobpcg.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.operators.preconditioners import DensePreconditioner
from iterativesolvers_tpu.operators.sparse import csr_from_dense
from iterativesolvers_tpu.solvers.lobpcg import default_tolerance, lobpcg
from iterativesolvers_tpu.utils.fixtures import laplace_dia


def _sym(rng, n, dtype=np.float64):
    A = rng.random((n, n)).astype(dtype)
    A = (A + A.T) / 2 + n * np.eye(n, dtype=dtype)
    return A


@pytest.mark.parametrize("largest", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_standard_eigenproblem(rng, largest, dtype):
    n, k = 50, 4
    A = _sym(rng, n, dtype)
    w_ref = np.linalg.eigvalsh(A)
    X0 = rng.random((n, k)).astype(dtype)
    r = lobpcg(A, X0, largest=largest, maxiter=300)
    assert r.converged
    lam = np.sort(np.asarray(r.lam))
    expect = w_ref[-k:] if largest else w_ref[:k]
    tol = 5e-3 if dtype == np.float32 else 1e-7
    np.testing.assert_allclose(lam, np.sort(expect), rtol=tol, atol=tol)
    # residual check A x = lam x
    X = np.asarray(r.X)
    R = A @ X - X * np.asarray(r.lam)[None, :]
    assert np.linalg.norm(R) < n * r.tolerance


def test_laplace_smallest(rng):
    """Smallest eigenpairs of the 20x20 2-D Laplacian (test/lobpcg.jl:73)."""
    A = laplace_dia(20, 2)
    n = A.shape[0]
    Ad = np.asarray(A.to_dense())
    w_ref = np.linalg.eigvalsh(Ad)
    X0 = rng.random((n, 3))
    r = lobpcg(A, X0, largest=False, tol=1e-8, maxiter=500)
    assert r.converged
    np.testing.assert_allclose(np.sort(np.asarray(r.lam)), w_ref[:3], rtol=1e-6)


def test_generalized_eigenproblem(rng):
    n, k = 40, 3
    A = _sym(rng, n)
    d = rng.random(n) + 1.0
    B = np.diag(d)
    from scipy.linalg import eigh as scipy_eigh

    w_ref = scipy_eigh(A, B, eigvals_only=True)
    X0 = rng.random((n, k))
    r = lobpcg(A, X0, B=B, largest=False, tol=1e-9, maxiter=500)
    assert r.converged
    np.testing.assert_allclose(np.sort(np.asarray(r.lam)), w_ref[:k], rtol=1e-6)
    # B-orthonormality of eigenvectors (test/lobpcg.jl:213-246)
    X = np.asarray(r.X)
    np.testing.assert_allclose(X.T @ B @ X, np.eye(k), atol=1e-6)


def test_nev_greater_than_blocksize(rng):
    """nev > blocksize accumulates batches w/ deflation (src/lobpcg.jl:928-961)."""
    n, bs, nev = 60, 2, 6
    A = _sym(rng, n)
    w_ref = np.linalg.eigvalsh(A)
    X0 = rng.random((n, bs))
    r = lobpcg(A, X0, nev=nev, largest=False, tol=1e-8, maxiter=500)
    assert r.converged
    np.testing.assert_allclose(np.sort(np.asarray(r.lam)), w_ref[:nev], rtol=1e-6)
    # returned eigenvectors mutually orthonormal across batches
    X = np.asarray(r.X)
    np.testing.assert_allclose(X.T @ X, np.eye(nev), atol=1e-6)


def test_constraint_orthogonality(rng):
    """Iterates stay orthogonal to constraint C (test/lobpcg.jl:303,320)."""
    n, k = 40, 2
    A = _sym(rng, n)
    w, V = np.linalg.eigh(A)
    C = V[:, :2]  # deflate the two smallest
    X0 = rng.random((n, k))
    r = lobpcg(A, X0, C=C, largest=False, tol=1e-8, maxiter=500)
    assert r.converged
    np.testing.assert_allclose(np.sort(np.asarray(r.lam)), w[2 : 2 + k], rtol=1e-6)
    assert np.abs(C.T @ np.asarray(r.X)).max() < 1e-6


def test_preconditioned(rng):
    n, k = 50, 3
    A = _sym(rng, n)
    X0 = rng.random((n, k))
    # exact inverse as preconditioner accelerates convergence
    r_plain = lobpcg(A, X0, tol=1e-7, maxiter=300)
    r_prec = lobpcg(A, X0, P=DensePreconditioner(A), tol=1e-7, maxiter=300)
    assert r_prec.converged
    assert r_prec.iterations <= r_plain.iterations


def test_sparse_operator(rng):
    A = laplace_dia(12, 2)
    csr = A.to_csr()
    X0 = rng.random((A.shape[0], 2))
    r = lobpcg(csr, X0, tol=1e-7, maxiter=400)
    assert r.converged
    w_ref = np.linalg.eigvalsh(np.asarray(A.to_dense()))
    np.testing.assert_allclose(np.sort(np.asarray(r.lam)), w_ref[:2], rtol=1e-5)


def test_exact_start_converges_immediately(rng):
    """Exact eigenvector start converges in <= 2 iterations (test/lobpcg.jl:46-48)."""
    n = 30
    A = _sym(rng, n)
    w, V = np.linalg.eigh(A)
    r = lobpcg(A, V[:, :3], tol=1e-8, maxiter=100)
    assert r.converged
    assert r.iterations <= 2


def test_blocksize_guard(rng):
    A = _sym(rng, 8)
    with pytest.raises(ValueError):
        lobpcg(A, rng.random((8, 3)))  # 3*3 > 8


def test_default_tolerance():
    assert abs(default_tolerance(np.float64) - np.finfo(np.float64).eps ** 0.3) < 1e-12


def _herm(rng, n, dtype):
    """Hermitian positive-definite complex matrix."""
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = (A + A.conj().T) / 2 + n * np.eye(n)
    return A.astype(dtype)


def _cstart(rng, n, k, dtype):
    return (rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))).astype(dtype)


@pytest.mark.parametrize("largest", [False, True])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_standard(rng, largest, dtype):
    """Complex-eltype standard eigenproblem (test/lobpcg.jl:36 runs every
    block over Float32/64 and ComplexF32/64)."""
    n, k = 50, 4
    A = _herm(rng, n, dtype)
    w_ref = np.linalg.eigvalsh(A)
    r = lobpcg(A, _cstart(rng, n, k, dtype), largest=largest, maxiter=400)
    assert r.converged
    lam = np.sort(np.asarray(r.lam).real)
    expect = np.sort(w_ref[-k:] if largest else w_ref[:k])
    tol = 5e-3 if dtype == np.complex64 else 1e-7
    np.testing.assert_allclose(lam, expect, rtol=tol, atol=tol)
    X = np.asarray(r.X)
    R = A @ X - X * np.asarray(r.lam)[None, :]
    assert np.linalg.norm(R) < n * r.tolerance


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_generalized_b_orthogonality(rng, dtype):
    """Complex generalized problem + B-orthogonality of the eigenvectors
    (test/lobpcg.jl:213-246 over complex eltypes)."""
    n, k = 40, 3
    A = _herm(rng, n, dtype)
    d = rng.random(n) + 1.0
    B = np.diag(d).astype(dtype)
    from scipy.linalg import eigh as scipy_eigh

    w_ref = scipy_eigh(
        A.astype(np.complex128), B.astype(np.complex128), eigvals_only=True
    )
    tol = None if dtype == np.complex64 else 1e-9
    r = lobpcg(A, _cstart(rng, n, k, dtype), B=B, largest=False, tol=tol,
               maxiter=500)
    assert r.converged
    rtol = 5e-3 if dtype == np.complex64 else 1e-6
    np.testing.assert_allclose(
        np.sort(np.asarray(r.lam).real), w_ref[:k], rtol=rtol, atol=rtol
    )
    X = np.asarray(r.X)
    atol = 5e-3 if dtype == np.complex64 else 1e-6
    np.testing.assert_allclose(X.conj().T @ B @ X, np.eye(k), atol=atol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_constraint_orthogonality(rng, dtype):
    """Deflation constraints stay honored for complex eltypes
    (test/lobpcg.jl:303,320)."""
    n, k = 48, 2
    A = _herm(rng, n, dtype)
    w_ref, V_ref = np.linalg.eigh(A)
    C = V_ref[:, :2].astype(dtype)  # deflate the two smallest
    r = lobpcg(A, _cstart(rng, n, k, dtype), C=C, largest=False, maxiter=400)
    assert r.converged
    rtol = 5e-3 if dtype == np.complex64 else 1e-6
    np.testing.assert_allclose(
        np.sort(np.asarray(r.lam).real), w_ref[2 : 2 + k], rtol=rtol
    )
    X = np.asarray(r.X)
    atol = 1e-4 if dtype == np.complex64 else 1e-8
    assert np.abs(C.conj().T @ X).max() < atol


def test_history_per_batch_traces(rng):
    """nev > blocksize keeps one trace + iteration count per batch
    (src/lobpcg.jl:71-88); iters totals the batches."""
    n, bs, nev = 60, 2, 6
    A = _sym(rng, n)
    X0 = rng.random((n, bs))
    r = lobpcg(A, X0, nev=nev, largest=False, tol=1e-8, maxiter=500, log=True)
    assert len(r.batch_iterations) == 3
    assert r.iterations == sum(r.batch_iterations)
    assert r.history.iters == r.iterations
    assert r.history["batch_iters"] == r.batch_iterations
    assert len(r.history["resnorm"]) == r.iterations
