"""Tests for the small-dense ops layer (~ test/hessenberg.jl and
test/orthogonalize.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.ops.givens import apply_givens, givens
from iterativesolvers_tpu.ops.hessenberg import back_substitute, hessenberg_lstsq
from iterativesolvers_tpu.ops.orthogonalize import orthogonalize_and_normalize

DTYPES = [np.float64, np.complex128]


def random_of(rng, shape, dtype):
    a = rng.standard_normal(shape)
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * rng.standard_normal(shape)
    return a.astype(dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_givens_zeroes_second_entry(rng, dtype):
    for _ in range(10):
        a, b = random_of(rng, (2,), dtype)
        c, s, r = givens(a, b)
        x, y = apply_givens(c, s, a, b)
        assert abs(complex(y)) < 1e-12
        np.testing.assert_allclose(complex(x), complex(r), atol=1e-12)
        # unitary: |c|^2 + |s|^2 == 1
        np.testing.assert_allclose(float(c) ** 2 + abs(complex(s)) ** 2, 1.0)


def test_givens_edge_cases():
    c, s, r = givens(0.0, 0.0)
    assert float(c) == 1.0 and complex(s) == 0 and complex(r) == 0
    c, s, r = givens(0.0, 3.0)
    x, y = apply_givens(c, s, 0.0, 3.0)
    assert abs(complex(y)) < 1e-14
    np.testing.assert_allclose(abs(complex(x)), 3.0)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("m", [1, 5, 10])
def test_hessenberg_lstsq_vs_numpy(rng, dtype, m):
    """~ test/hessenberg.jl:28-44: matches `\\` and leaves residual behind."""
    H = np.triu(random_of(rng, (m + 1, m), dtype), -1)
    rhs = np.zeros(m + 1, dtype=dtype)
    rhs[0] = 1.23  # GMRES-style rhs = beta * e1
    y, res = hessenberg_lstsq(jnp.asarray(H), jnp.asarray(rhs))
    y_np, *_ = np.linalg.lstsq(H, rhs, rcond=None)
    np.testing.assert_allclose(np.asarray(y), y_np, rtol=1e-9, atol=1e-10)
    true_res = np.linalg.norm(H @ y_np - rhs)
    np.testing.assert_allclose(float(res), true_res, rtol=1e-9, atol=1e-12)


def test_hessenberg_lstsq_masked_k(rng):
    """Columns >= k zero => same answer as the k-column problem."""
    m, k = 8, 5
    H = np.triu(rng.standard_normal((m + 1, m)), -1)
    H[:, k:] = 0.0
    H[k + 1 :, :] = 0.0
    rhs = np.zeros(m + 1)
    rhs[0] = 2.0
    y, res = hessenberg_lstsq(jnp.asarray(H), jnp.asarray(rhs), k=k)
    y_np, *_ = np.linalg.lstsq(H[: k + 1, :k], rhs[: k + 1], rcond=None)
    np.testing.assert_allclose(np.asarray(y)[:k], y_np, rtol=1e-9)
    assert np.allclose(np.asarray(y)[k:], 0.0)


def test_back_substitute(rng):
    m = 6
    R = np.triu(rng.standard_normal((m, m))) + np.eye(m) * 3
    g = rng.standard_normal(m)
    y = back_substitute(jnp.asarray(R), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y), np.linalg.solve(R, g), rtol=1e-10)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("method", ["mgs", "cgs", "cgs2", "dgks"])
def test_orthogonalize_invariants(rng, dtype, method):
    """~ test/orthogonalize.jl:25-61: unit norm, V'w == 0, reconstruction."""
    n, k, m = 30, 4, 8
    Vfull = np.linalg.qr(random_of(rng, (n, k), dtype))[0]
    V = np.zeros((n, m), dtype=dtype)
    V[:, :k] = Vfull  # inactive columns zero
    w0 = random_of(rng, (n,), dtype)
    w, h, nrm = orthogonalize_and_normalize(jnp.asarray(V), jnp.asarray(w0), method)
    w, h, nrm = np.asarray(w), np.asarray(h), float(nrm)
    np.testing.assert_allclose(np.linalg.norm(w), 1.0, rtol=1e-10)
    assert np.max(np.abs(V.conj().T @ w)) < 1e-8
    np.testing.assert_allclose(V @ h + nrm * w, w0, rtol=1e-8, atol=1e-10)
    assert np.allclose(h[k:], 0.0)


def test_dgks_reorthogonalizes_hard_case(rng):
    """w nearly inside span(V): plain CGS loses orthogonality, DGKS must not."""
    n, k, m = 50, 6, 8
    V = np.zeros((n, m))
    V[:, :k] = np.linalg.qr(rng.standard_normal((n, k)))[0]
    w0 = V[:, 0] + 1e-10 * rng.standard_normal(n)
    w, h, nrm = orthogonalize_and_normalize(jnp.asarray(V), jnp.asarray(w0), "dgks")
    assert np.max(np.abs(V.T @ np.asarray(w))) < 1e-8
    # h must accumulate the re-orthogonalization corrections so the
    # reconstruction identity still holds (src/orthogonalize.jl:31)
    np.testing.assert_allclose(
        V @ np.asarray(h) + float(nrm) * np.asarray(w), w0,
        rtol=1e-8, atol=1e-12)


def test_spectral_bound_helpers():
    """gershgorin_bounds encloses the true spectrum; power_bound upper-bounds
    lambda_max (Chebyshev's required inputs — the reference makes the user
    supply them, src/chebyshev.jl:59)."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(12, 2, dtype=np.float64)
    dense = np.asarray(A.to_dense())
    ev = np.linalg.eigvalsh(dense)
    lmin, lmax = its.gershgorin_bounds(A.to_csr())
    assert lmin <= ev[0] and ev[-1] <= lmax
    # stencil form gives the same enclosure
    lmin2, lmax2 = its.gershgorin_bounds(its.laplacian(12, 2, dtype=np.float64))
    assert abs(lmin - lmin2) < 1e-12 and abs(lmax - lmax2) < 1e-12
    pb = float(its.power_bound(A, iters=100))
    assert ev[-1] <= pb <= 1.10 * ev[-1]
    # chebyshev with the computed bounds converges
    b = np.ones(A.shape[0])
    x, h = its.chebyshev(A, b, max(lmin, float(ev[0])), lmax, reltol=1e-8,
                         maxiter=2000, log=True)
    assert h.isconverged
