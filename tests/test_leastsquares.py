"""LSQR / LSMR tests (~ test/lsqr.jl, test/lsmr.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.operators.linear_operator import FunctionOperator
from iterativesolvers_tpu.operators.sparse import csr_from_dense
from iterativesolvers_tpu.solvers.lsmr import lsmr
from iterativesolvers_tpu.solvers.lsqr import lsqr


def sol_matrix(m, n, dtype=np.float64):
    """The Paige-Saunders LSQR test matrix family (~ test/lsqr.jl:24-31):
    A = Y D Z with Householder reflections Y, Z and graded diagonal D."""
    mn = max(m, n)
    d = np.arange(1, n + 1, dtype=dtype) / n
    hy = np.ones(m, dtype) / np.sqrt(m)
    hz = np.ones(n, dtype) / np.sqrt(n)
    Y = np.eye(m, dtype=dtype) - 2 * np.outer(hy, hy)
    Z = np.eye(n, dtype=dtype) - 2 * np.outer(hz, hz)
    return Y[:, :n] @ np.diag(d) @ Z


@pytest.mark.parametrize("solver", [lsqr, lsmr])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_overdetermined(rng, solver, dtype):
    m, n = 60, 25
    A = rng.random((m, n)).astype(dtype)
    b = rng.random(m).astype(dtype)
    x = np.asarray(solver(A, b, atol=1e-10, btol=1e-10, maxiter=200))
    x_ref, *_ = np.linalg.lstsq(A, b, rcond=None)
    tol = 1e-3 if dtype == np.float32 else 1e-8
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < tol


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_square_consistent(rng, solver):
    n = 40
    A = sol_matrix(n, n)
    x_true = rng.random(n)
    b = A @ x_true
    x, h = solver(A, b, atol=1e-12, btol=1e-12, maxiter=400, log=True)
    assert h.isconverged
    assert h["istop"] in (1, 2)
    assert np.linalg.norm(np.asarray(x) - x_true) / np.linalg.norm(x_true) < 1e-8


@pytest.mark.parametrize("solver,kw", [(lsqr, "damp"), (lsmr, "lam")])
def test_damped(rng, solver, kw):
    """Damped LS == augmented undamped problem [A; damp*I] x = [b; 0]."""
    m, n, damp = 50, 20, 0.5
    A = rng.random((m, n))
    b = rng.random(m)
    x = np.asarray(solver(A, b, **{kw: damp}, atol=1e-12, btol=1e-12, maxiter=500))
    Aaug = np.vstack([A, damp * np.eye(n)])
    baug = np.concatenate([b, np.zeros(n)])
    x_ref, *_ = np.linalg.lstsq(Aaug, baug, rcond=None)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-6


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_matrix_free(rng, solver):
    """LinearMap-style operator (test/lsqr.jl:36-40, test/lsmr.jl:17-50)."""
    m, n = 30, 12
    M = rng.random((m, n))
    Mj = jnp.asarray(M)
    op = FunctionOperator(
        lambda mat, v: mat @ v, (m, n), M.dtype,
        rmatvec=lambda mat, v: mat.T @ v, params=(Mj,),
    )
    b = rng.random(m)
    x = np.asarray(solver(op, b, atol=1e-10, btol=1e-10, maxiter=200))
    x_ref, *_ = np.linalg.lstsq(M, b, rcond=None)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-6


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_sparse_operator(rng, solver):
    m, n = 60, 25
    A = rng.random((m, n))
    A[np.abs(A) < 0.7] = 0.0
    A += np.pad(np.eye(n), ((0, m - n), (0, 0)))  # ensure full column rank
    b = rng.random(m)
    x = np.asarray(solver(csr_from_dense(A), b, atol=1e-10, btol=1e-10, maxiter=300))
    x_ref, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-6


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_maxiter_istop7(rng, solver):
    n = 50
    A = sol_matrix(n, n)
    b = rng.random(n)
    x, h = solver(A, b, atol=1e-14, btol=1e-14, maxiter=2, log=True)
    assert h["istop"] == 7
    assert h.iters == 2
    # LSQR marks converged for any istop > 0; LSMR treats 7 as failure
    assert h.isconverged == (solver is lsqr)


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_zero_rhs(solver):
    A = np.eye(10)
    x = np.asarray(solver(A, np.zeros(10)))
    np.testing.assert_allclose(x, 0.0)


@pytest.mark.parametrize("solver", [lsqr, lsmr])
def test_history_series(rng, solver):
    A = sol_matrix(30, 30)
    b = rng.random(30)
    x, h = solver(A, b, maxiter=100, log=True)
    for key in ("rnorm", "anorm", "cnorm"):
        assert len(h[key]) == h.iters
    assert h.mtvps >= h.iters  # one adjoint product per iteration + initial


def test_baseline_config4_lsqr_lsmr_lobpcg(rng):
    """BASELINE workload 4: LSQR/LSMR on a rectangular system + LOBPCG
    smallest eigenpairs."""
    import jax.numpy as jnp
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia, random_sparse

    A = random_sparse(300, 120, 0.05, seed=21)
    x_true = rng.random(120)
    b = jnp.asarray(np.asarray(A.to_dense()) @ x_true)
    for solver in (its.lsqr, its.lsmr):
        x, h = solver(A.to_ell().with_adjoint(), b, atol=1e-10, btol=1e-10,
                      maxiter=400, log=True)
        r = np.asarray(A.to_dense()) @ np.asarray(x) - np.asarray(b)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6

    L = laplace_dia(16, 2)
    X0 = rng.random((L.shape[0], 4))
    res = its.lobpcg(L, X0, largest=False, tol=1e-6, maxiter=400)
    assert res.converged
    lam_exact = sorted(
        2 * (2 - np.cos(np.pi * i / 17) - np.cos(np.pi * j / 17))
        for i in range(1, 5) for j in range(1, 5)
    )[:4]
    np.testing.assert_allclose(np.asarray(res.lam), lam_exact, rtol=1e-4)


def test_lsqr_f32_defaults_reach_user_tolerance(rng):
    """Default atol/btol scale as sqrt(eps(T)) (src/lsqr.jl:91-92): a float32
    solve must terminate via the user-tolerance codes istop 1-2, not the
    machine-precision guards 4-7 (ADVICE r1)."""
    n = 40
    A = (np.eye(n) + 0.1 * rng.standard_normal((n, n))).astype(np.float32)
    b = rng.random(n).astype(np.float32)
    x, h = lsqr(A, b, log=True)
    assert h["istop"] in (1, 2)
    assert h.isconverged
    # and the default tolerances scale with the dtype
    assert abs(h["atol"] - np.sqrt(np.finfo(np.float32).eps)) < 1e-6
