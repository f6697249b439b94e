"""Power / inverse power method tests (~ test/simple_eigensolvers.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.operators.linear_operator import FunctionOperator
from iterativesolvers_tpu.solvers.simple import invpowm, powm, powm_iterator


def _sym_with_gap(rng, n, dtype=np.float64):
    Q, _ = np.linalg.qr(rng.random((n, n)).astype(dtype))
    vals = np.linspace(1.0, 2.0, n).astype(dtype)
    vals[-1] = 10.0  # dominant, well-separated
    return (Q * vals) @ Q.T, vals, Q


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_powm_dominant(rng, dtype):
    n = 30
    A, vals, Q = _sym_with_gap(rng, n, dtype)
    x0 = rng.random(n).astype(dtype)
    x0 /= np.linalg.norm(x0)
    tol = 1e-5 if dtype == np.float32 else 1e-10
    lam, x, h = powm(A, x0=x0, tol=tol, maxiter=2000, log=True)
    assert h.isconverged
    assert abs(complex(lam).real - 10.0) < 100 * tol
    # eigenvector up to sign
    v = np.asarray(x)
    assert min(np.linalg.norm(v - Q[:, -1]), np.linalg.norm(v + Q[:, -1])) < 1e-3


def test_powm_random_complex_start(rng):
    """Allocating form uses a random complex unit start (src/simple.jl:64-68)."""
    n = 20
    A, vals, _ = _sym_with_gap(rng, n)
    lam, x = powm(A.astype(np.complex128), tol=1e-10, maxiter=2000,
                  key=jax.random.PRNGKey(7))
    assert abs(complex(lam) - 10.0) < 1e-6
    assert abs(np.linalg.norm(np.asarray(x)) - 1.0) < 1e-6


def test_invpowm_shift_invert(rng):
    """Shift-and-invert via a user-supplied (A - sigma I)^{-1} operator
    (test/simple_eigensolvers.jl:36-49)."""
    n = 25
    A, vals, Q = _sym_with_gap(rng, n)
    sigma = 1.52  # near an interior eigenvalue
    target = vals[np.argmin(np.abs(vals - sigma))]
    F = np.linalg.inv(A - sigma * np.eye(n))
    Fj = jnp.asarray(F)
    op = FunctionOperator(lambda M, v: M @ v, (n, n), F.dtype, params=(Fj,))
    x0 = rng.random(n)
    x0 /= np.linalg.norm(x0)
    lam, x, h = invpowm(op, shift=sigma, x0=x0, tol=1e-10, maxiter=2000, log=True)
    assert h.isconverged
    assert abs(complex(lam).real - target) < 1e-7


def test_powm_iterator(rng):
    n = 20
    A, *_ = _sym_with_gap(rng, n)
    x0 = rng.random(n)
    x0 /= np.linalg.norm(x0)
    it = powm_iterator(A, x0, tol=1e-8, maxiter=500)
    residuals = [float(r) for r in it]
    assert residuals[-1] <= 1e-8
    assert abs(float(jnp.real(it.state.theta)) - 10.0) < 1e-5


def test_powm_maxiter_log_length(rng):
    """done is ``k > maxiter`` so maxiter+1 residuals are produced; the logged
    series must cover every executed iteration (ADVICE r1)."""
    n = 20
    A, _, _ = _sym_with_gap(rng, n)
    x0 = rng.random(n)
    x0 /= np.linalg.norm(x0)
    lam, x, h = powm(A, x0=x0, tol=0.0, maxiter=5, log=True)
    assert h.iters == len(h["resnorm"]) == 6  # 5 + 1, matching the reference
