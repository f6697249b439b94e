"""BiCGStab(l), IDR(s), QMR, Chebyshev tests
(~ test/bicgstabl.jl, test/idrs.jl, test/qmr.jl, test/chebyshev.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu import DensePreconditioner
from iterativesolvers_tpu.solvers.bicgstabl import bicgstabl
from iterativesolvers_tpu.solvers.chebyshev import chebyshev
from iterativesolvers_tpu.solvers.idrs import idrs
from iterativesolvers_tpu.solvers.qmr import qmr
from iterativesolvers_tpu.utils.fixtures import random_sparse

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def rtol_for(dtype):
    return float(np.sqrt(np.finfo(np.zeros((), dtype).real.dtype).eps))


def shifted_random(rng, n, dtype, shift):
    a = rng.random((n, n))
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * rng.random((n, n))
    return a.astype(dtype) + shift * np.eye(n, dtype=dtype)


# ---------------------------------------------------------------- BiCGStab(l)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("l", [2, 4])
def test_bicgstabl(rng, dtype, l):
    n = 20
    A = shifted_random(rng, n, dtype, 15)
    b = A @ np.ones(n, dtype=dtype)
    reltol = rtol_for(dtype)
    x, h = bicgstabl(A, b, l, max_mv_products=100, log=True, reltol=reltol)
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 10 * reltol
    # warm start
    xg = rng.random(n).astype(dtype)
    x2, h2 = bicgstabl(
        A, b, l, x0=jnp.asarray(xg), max_mv_products=100, log=True, reltol=reltol
    )
    assert np.linalg.norm(A @ np.asarray(x2) - b) / np.linalg.norm(b) <= 10 * reltol


def test_bicgstabl_preconditioned(rng):
    n = 20
    A = shifted_random(rng, n, np.float64, 15)
    b = A @ np.ones(n)
    F = DensePreconditioner(jnp.asarray(A + rng.random((n, n))))
    x, h = bicgstabl(A, b, 2, Pl=F, max_mv_products=100, log=True)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 1e-7


def test_bicgstabl_termination(rng):
    A = np.array([[2, -1, 0], [-1, 2, -1], [0, -1, 2]], dtype=np.float64)
    b = np.ones(3)
    x0 = np.linalg.solve(A, b)
    perturb = 10 * np.sqrt(np.finfo(np.float64).eps) * np.array([-1.0, 1.0, -1.0])
    x = x0 + perturb
    r0 = np.linalg.norm(A @ x - b)
    _, ch = bicgstabl(A, b, 2, x0=jnp.asarray(x), abstol=2 * r0, reltol=0.0, log=True)
    assert ch.iters == 0


# ---------------------------------------------------------------- IDR(s)
@pytest.mark.parametrize("dtype", DTYPES)
def test_idrs(rng, dtype):
    n = 10
    A = shifted_random(rng, n, dtype, n)
    b = rng.random(n).astype(dtype)
    reltol = rtol_for(dtype)
    x, h = idrs(A, b, reltol=reltol, log=True)
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 10 * reltol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_idrs_smoothing(rng, dtype):
    n = 10
    A = shifted_random(rng, n, dtype, n)
    b = rng.random(n).astype(dtype)
    reltol = rtol_for(dtype)
    x, h = idrs(A, b, reltol=reltol, smoothing=True, log=True)
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 10 * reltol


def test_idrs_sparse_and_preconditioner(rng):
    n = 200
    A = random_sparse(n, n, 0.1, seed=11, shift=30.0)
    dense = np.asarray(A.to_dense())
    b = rng.random(n)
    x, h = idrs(A, b, log=True)
    assert h.isconverged
    assert np.linalg.norm(dense @ np.asarray(x) - b) / np.linalg.norm(b) <= 1e-7
    # exact-ish preconditioner cuts iterations
    xp, hp = idrs(A, b, Pl=DensePreconditioner(jnp.asarray(dense)), log=True)
    assert hp.isconverged
    assert hp.iters < h.iters


def test_idrs_maxiter(rng):
    x, h = idrs(rng.random((5, 5)), rng.random(5), log=True, maxiter=2)
    assert h.iters == 2
    assert len(h["resnorm"]) == 2


def test_idrs_termination(rng):
    A = np.array([[2, -1, 0], [-1, 2, -1], [0, -1, 2]], dtype=np.float64)
    b = np.ones(3)
    x0 = np.linalg.solve(A, b)
    perturb = 10 * np.sqrt(np.finfo(np.float64).eps) * np.array([-1.0, 1.0, -1.0])
    x = x0 + perturb
    r0 = np.linalg.norm(A @ x - b)
    _, ch = idrs(A, b, x0=jnp.asarray(x), abstol=2 * r0, reltol=0.0, log=True)
    assert ch.iters == 0
    x = x0 + perturb
    _, ch = idrs(A, b, x0=jnp.asarray(x), log=True)
    assert 1 <= ch.iters <= 10


# ---------------------------------------------------------------- QMR
@pytest.mark.parametrize("dtype", DTYPES)
def test_qmr(rng, dtype):
    n = 10
    A = shifted_random(rng, n, dtype, n)
    b = rng.random(n).astype(dtype)
    reltol = 10 * rtol_for(dtype)
    x, h = qmr(A, b, log=True)
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= reltol


def test_qmr_maxiter(rng):
    x, h = qmr(rng.random((5, 5)), rng.random(5), log=True, maxiter=2)
    assert h.iters == 2
    assert len(h["resnorm"]) == 2
    assert h.mtvps == 2


def test_qmr_termination(rng):
    A = np.array([[2, -1, 0], [-1, 2, -1], [0, -1, 2]], dtype=np.float64)
    b = np.ones(3)
    x0 = np.linalg.solve(A, b)
    perturb = 10 * np.sqrt(np.finfo(np.float64).eps) * np.array([-1.0, 1.0, -1.0])
    x = x0 + perturb
    _, ch = qmr(A, b, x0=jnp.asarray(x), log=True)
    assert 1 <= ch.iters <= 4
    x = x0 + perturb
    r0 = np.linalg.norm(A @ x - b)
    _, ch = qmr(A, b, x0=jnp.asarray(x), abstol=2 * r0, reltol=0.0, log=True)
    assert ch.iters == 0


# ---------------------------------------------------------------- Chebyshev
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_chebyshev(rng, dtype):
    n = 20
    B = rng.random((n, n)).astype(dtype)
    A = B @ B.T + n * np.eye(n, dtype=dtype)
    b = rng.random(n).astype(dtype)
    evals = np.linalg.eigvalsh(A)
    lmin, lmax = 0.9 * evals[0], 1.1 * evals[-1]
    reltol = rtol_for(dtype)
    x, h = chebyshev(A, b, lmin, lmax, reltol=reltol, maxiter=10 * n, log=True)
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 10 * reltol


def test_chebyshev_preconditioned(rng):
    n = 20
    B = rng.random((n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.random(n)
    diag = np.diag(A)
    Ap = A / diag[:, None]  # Pl^-1 A spectrum
    ev = np.linalg.eigvals(Ap).real
    x, h = chebyshev(
        A, b, 0.9 * ev.min(), 1.1 * ev.max(), Pl=jnp.asarray(diag),
        reltol=1e-8, maxiter=500, log=True,
    )
    assert h.isconverged
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) <= 1e-6


def test_baseline_config2_advection_diffusion():
    """BASELINE workload 2: GMRES(20) + BiCGStab(2) on the 3-D advection-
    diffusion operator (benchmark/advection_diffusion.jl:3-31)."""
    from iterativesolvers_tpu.utils.fixtures import advection_diffusion
    import iterativesolvers_tpu as its

    A, b = advection_diffusion(10)
    bj = jnp.asarray(b)
    x, h = its.gmres(A, bj, restart=20, reltol=1e-8, maxiter=600, log=True)
    assert h.isconverged
    r = np.asarray(A.mv(x)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6

    x2, h2 = its.bicgstabl(A, bj, 2, max_mv_products=4000, reltol=1e-8, log=True)
    assert h2.isconverged
    r2 = np.asarray(A.mv(x2)) - b
    assert np.linalg.norm(r2) / np.linalg.norm(b) < 1e-6
