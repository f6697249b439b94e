"""MINRES tests (~ test/minres.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.solvers.minres import minres, minres_iterator

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def rtol_for(dtype):
    return float(np.sqrt(np.finfo(np.zeros((), dtype).real.dtype).eps))


def hermitian_problem(rng, dtype, n):
    B = rng.random((n, n))
    if np.issubdtype(dtype, np.complexfloating):
        B = B + 1j * rng.random((n, n))
    B = B.astype(dtype) + n * np.eye(n, dtype=dtype)
    A = B + B.conj().T
    b = B @ np.ones(n, dtype=dtype)
    return A, b


def skew_hermitian_problem(rng, dtype, n):
    B = rng.random((n, n))
    if np.issubdtype(dtype, np.complexfloating):
        B = B + 1j * rng.random((n, n))
    B = B.astype(dtype) + n * np.eye(n, dtype=dtype)
    A = B - B.conj().T
    b = A @ np.ones(n, dtype=dtype)
    return A, b


@pytest.mark.parametrize("dtype", DTYPES)
def test_hermitian(rng, dtype):
    n = 15
    A, b = hermitian_problem(rng, dtype, n)
    reltol = rtol_for(dtype)
    x, h = minres(A, b, maxiter=10 * n, reltol=reltol, log=True)
    assert h.isconverged
    assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) <= 10 * reltol
    # warm start variant (the `minres!` form)
    x0 = rng.random(n).astype(dtype)
    x2, h2 = minres(A, b, x0=jnp.asarray(x0), maxiter=10 * n, reltol=reltol, log=True)
    assert np.linalg.norm(b - A @ np.asarray(x2)) / np.linalg.norm(b) <= 10 * reltol


@pytest.mark.parametrize("dtype", DTYPES)
def test_skew_hermitian(rng, dtype):
    n = 15
    A, b = skew_hermitian_problem(rng, dtype, n)
    reltol = rtol_for(dtype)
    x, h = minres(A, b, skew_hermitian=True, maxiter=10 * n, reltol=reltol, log=True)
    assert h.isconverged
    assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) <= 10 * reltol


def test_termination_criteria(rng):
    dtype = np.float64
    A = np.array([[2, -1, 0], [-1, 2, -1], [0, -1, 2]], dtype=dtype)
    n = 3
    b = np.ones(n, dtype=dtype)
    x0 = np.linalg.solve(A, b)
    eps = np.finfo(dtype).eps
    perturb = 10 * np.sqrt(eps) * np.array([(-1) ** i for i in range(1, n + 1)])

    x = x0 + perturb
    _, ch = minres(A, b, x0=jnp.asarray(x), log=True)
    assert 1 <= ch.iters <= n + 1

    x = x0 + perturb
    r0 = np.linalg.norm(A @ x - b)
    _, ch = minres(A, b, x0=jnp.asarray(x), abstol=2 * r0, reltol=0.0, log=True)
    assert ch.iters == 0


def test_minres_iterator(rng):
    n = 15
    A, b = hermitian_problem(rng, np.float64, n)
    it = minres_iterator(A, b, reltol=1e-10, maxiter=200)
    res = [float(r) for r in it]
    assert len(res) >= 2
    x = np.asarray(it.x)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) <= 1e-8
