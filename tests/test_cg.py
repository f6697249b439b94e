"""CG tests mirroring the reference suite (test/cg.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterativesolvers_tpu as its
from iterativesolvers_tpu import (
    DiagonalPreconditioner,
    DensePreconditioner,
    FunctionOperator,
    cg,
    cg_iterator,
)
from iterativesolvers_tpu.utils.fixtures import laplace_dia

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def spd_matrix(rng, n, dtype):
    """Hermitian positive definite test matrix (~ test/cg.jl:26-30)."""
    a = rng.standard_normal((n, n))
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * rng.standard_normal((n, n))
    a = a.astype(dtype)
    return a @ a.conj().T + n * np.eye(n, dtype=dtype)


def rtol_for(dtype):
    return float(np.sqrt(np.finfo(np.dtype(dtype).name.replace("complex64", "float32").replace("complex128", "float64")).eps))


@pytest.mark.parametrize("dtype", DTYPES)
def test_small_spd_full_matrix(rng, dtype):
    n = 15
    A = spd_matrix(rng, n, dtype)
    b = rng.standard_normal(n).astype(dtype)
    reltol = rtol_for(dtype)
    x, history = cg(A, b, maxiter=2 * n, log=True)
    assert history.isconverged
    resid = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert resid <= 2 * reltol
    assert len(history["resnorm"]) == history.iters


def test_exact_solution_start_converges_immediately(rng):
    n = 10
    A = spd_matrix(rng, n, np.float64)
    b = rng.standard_normal(n)
    x_exact = np.linalg.solve(A, b)
    # reference: abstol = 2n*eps, reltol = 0 => niters <= 1 (test/cg.jl:38-41)
    x, history = cg(
        A, b, x0=jnp.asarray(x_exact),
        abstol=2 * n * np.finfo(np.float64).eps * np.linalg.norm(b),
        reltol=0.0, log=True,
    )
    assert history.isconverged
    assert history.iters <= 1


def test_zero_rhs_gives_zero_solution(rng):
    n = 10
    A = spd_matrix(rng, n, np.float64)
    x = cg(A, np.zeros(n))
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_exact_preconditioner_converges_fast(rng):
    n = 20
    A = spd_matrix(rng, n, np.float64)
    b = rng.standard_normal(n)
    x, history = cg(A, b, Pl=DensePreconditioner(jnp.asarray(A)), log=True)
    assert history.isconverged
    assert history.iters <= 2  # (test/cg.jl:43-47)


def test_jacobi_preconditioner_on_laplace(rng):
    A = laplace_dia(10, 2)  # 100x100 (test/cg.jl:56)
    n = A.shape[0]
    b = rng.standard_normal(n)
    diag, _ = A.diagonal()
    x, h_plain = cg(A, b, log=True, reltol=1e-8, maxiter=5 * n)
    xp, h_prec = cg(
        A, b, Pl=DiagonalPreconditioner(jnp.asarray(diag)), log=True, reltol=1e-8,
        maxiter=5 * n,
    )
    dense = np.asarray(A.to_dense())
    for sol, h in ((x, h_plain), (xp, h_prec)):
        assert h.isconverged
        assert np.linalg.norm(dense @ np.asarray(sol) - b) / np.linalg.norm(b) <= 1e-7


def test_matrix_free_operator(rng):
    n = 15
    A = spd_matrix(rng, n, np.float64)
    Aj = jnp.asarray(A)
    op = FunctionOperator(lambda M, v: M @ v, (n, n), np.float64, params=(Aj,))
    b = rng.standard_normal(n)
    x, history = cg(op, b, log=True)
    assert history.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 1e-7


def test_termination_criteria(rng):
    """~ the reference's shared 'Termination criterion' block (test/cg.jl:98-122)."""
    n = 15
    A = spd_matrix(rng, n, np.float64)
    b = rng.standard_normal(n)
    x_exact = np.linalg.solve(A, b)
    x0 = x_exact + 1e-4 * rng.standard_normal(n)

    # tight reltol from a good start: at least some but few iterations
    _, h = cg(A, b, x0=jnp.asarray(x0), reltol=1e-12, log=True, maxiter=10 * n)
    assert 1 <= h.iters <= n + 5

    # abstol above the initial residual: zero iterations
    r0 = np.linalg.norm(b - A @ x0)
    _, h = cg(A, b, x0=jnp.asarray(x0), abstol=2 * r0, reltol=0.0, log=True)
    assert h.iters == 0

    # maxiter cap respected
    _, h = cg(A, b, maxiter=3, reltol=1e-16, abstol=0.0, log=True)
    assert h.iters == 3
    assert not h.isconverged


def test_cg_iterator_resume(rng):
    """Iterator protocol: step eagerly, residuals decrease, state is resumable
    (docs/src/iterators.md)."""
    n = 20
    A = spd_matrix(rng, n, np.float64)
    b = rng.standard_normal(n)
    it = cg_iterator(A, b, reltol=1e-10)
    res = [float(r) for r in it]
    assert len(res) >= 2
    assert res[-1] <= 1e-10 * res[0] + np.linalg.norm(b) * 1e-10 + res[0]
    x = np.asarray(it.x)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-8


def test_history_repr_and_plot(rng):
    n = 15
    A = spd_matrix(rng, n, np.float64)
    b = rng.standard_normal(n)
    _, h = cg(A, b, log=True)
    s = repr(h)
    assert "converged" in s
    assert "resnorm" in h
    assert h.nprods() == h.mvps
    plot = h.plot("resnorm")
    assert "iterations" in plot


def test_baseline_config1_laplace64():
    """BASELINE workload 1: CG on the 64x64 2-D Laplace fixture, Float64,
    rtol 1e-8 — the driver's minimum end-to-end slice (SURVEY §7 step 3)."""
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(64, 2)
    n = A.shape[0]
    b = np.ones(n)
    x, h = cg(A, b, reltol=1e-8, log=True)
    assert h.isconverged
    # unpreconditioned CG on the 2-D Laplacian: O(side) iterations
    assert 64 <= h.iters <= 400
    r = np.asarray(A.mv(jnp.asarray(x))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_block_cg_matches_columnwise_cg():
    """Batched multi-RHS CG == looping cg over columns (same recurrence
    per column, per-column convergence masking)."""
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(12, 2)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.standard_normal((n, 5)))
    X, h = its.block_cg(A, B, reltol=1e-10, maxiter=600, log=True)
    assert h.isconverged
    assert h.data["converged_per_rhs"].all()
    for i in range(5):
        xi = its.cg(A, B[:, i], reltol=1e-10, maxiter=600)
        np.testing.assert_allclose(np.asarray(X[:, i]), np.asarray(xi),
                                   atol=1e-8)
    r = np.asarray(A.mv_rows(jnp.asarray(X).T)).T - np.asarray(B)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(B)) < 1e-9


def test_block_cg_per_column_freeze_and_formats():
    """Columns with very different conditioning: the easy column freezes
    exactly at its own convergence; ELL/HYB mv_rows (the k-wide amortized
    gather) agree with the DIA solve."""
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(10, 2)
    n = A.shape[0]
    rng = np.random.default_rng(4)
    # column 0: b = A e -> converges in few iters; column 1: random
    e = np.zeros(n); e[n // 2] = 1.0
    B = jnp.asarray(np.stack([np.asarray(A.mv(jnp.asarray(e))),
                              rng.standard_normal(n)], axis=1))
    X = its.block_cg(A, B, reltol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(X[:, 0]), e, atol=1e-9)
    csr = A.to_csr()
    for op in (csr.to_ell(), csr.to_hyb()):
        Xe = its.block_cg(op, B, reltol=1e-12, maxiter=500)
        np.testing.assert_allclose(np.asarray(Xe), np.asarray(X), atol=1e-8)


def test_block_cg_preconditioned():
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side = 12
    A = variable_diffusion(side, 2, contrast=1e3, seed=2, dtype=np.float64)
    n = A.shape[0]
    d, _ = A.diagonal()
    B = jnp.asarray(np.random.default_rng(5).standard_normal((n, 3)))
    X, h = its.block_cg(A, B, Pl=its.DiagonalPreconditioner(jnp.asarray(d)),
                        reltol=1e-10, maxiter=2000, log=True)
    assert h.isconverged
    r = np.asarray(A.mv_rows(jnp.asarray(X).T)).T - np.asarray(B)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(B)) < 1e-8


def test_block_cg_rejects_vector():
    with pytest.raises(ValueError, match="shape"):
        its.block_cg(jnp.eye(4), jnp.ones(4))
