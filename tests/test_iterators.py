"""Iterator protocol across solvers (~ docs/src/iterators.md): every solver
exposes its functional step eagerly; .state is a checkpoint."""

import numpy as np
import pytest

import iterativesolvers_tpu as its


def _spd(rng, n):
    A = rng.random((n, n))
    return A @ A.T + n * np.eye(n)


def _nonsym(rng, n):
    return rng.random((n, n)) + n * np.eye(n)


@pytest.mark.parametrize("make_it", [
    lambda A, b: its.cg_iterator(A, b, reltol=1e-10),
    lambda A, b: its.minres_iterator(A, b, reltol=1e-10),
], ids=["cg", "minres"])
def test_spd_iterators_converge(rng, make_it):
    n = 30
    A = _spd(rng, n)
    b = rng.random(n)
    it = make_it(A, b)
    res = [float(r) for r in it]
    assert res[-1] < res[0]
    x = np.asarray(it.x)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.parametrize("make_it", [
    lambda A, b: its.gmres_iterator(A, b, restart=10, reltol=1e-10),
    lambda A, b: its.qmr_iterator(A, b, reltol=1e-10),
    lambda A, b: its.bicgstabl_iterator(A, b, 2, reltol=1e-10),
    lambda A, b: its.idrs_iterator(A, b, s=4, reltol=1e-10),
], ids=["gmres", "qmr", "bicgstabl", "idrs"])
def test_nonsym_iterators_converge(rng, make_it):
    n = 40
    A = _nonsym(rng, n)
    b = rng.random(n)
    it = make_it(A, b)
    res = [float(r) for r in it]
    x = np.asarray(it.x)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-7


def test_chebyshev_iterator(rng):
    n = 30
    Q, _ = np.linalg.qr(rng.random((n, n)))
    vals = np.linspace(1.0, 4.0, n)
    A = (Q * vals) @ Q.T
    b = rng.random(n)
    it = its.chebyshev_iterator(A, b, 1.0, 4.0, reltol=1e-9, maxiter=500)
    res = [float(r) for r in it]
    x = np.asarray(it.x)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-7


def test_iterator_state_is_checkpoint(rng):
    """Stop, hold the state, resume — total result equals a straight run
    (the reference's hold/step/resume pattern, docs/src/iterators.md)."""
    n = 25
    A = _spd(rng, n)
    b = rng.random(n)
    it1 = its.cg_iterator(A, b, reltol=1e-12, maxiter=200)
    for i, _ in enumerate(it1):
        if i == 4:
            break
    saved = it1.state
    it2 = its.cg_iterator(A, b, reltol=1e-12, maxiter=200)
    it2.state = saved  # resume from checkpoint
    for _ in it2:
        pass
    x_resumed = np.asarray(it2.x)
    x_straight = np.asarray(its.cg(A, b, reltol=1e-12, maxiter=200))
    np.testing.assert_allclose(x_resumed, x_straight, rtol=1e-10)


def test_idrs_smoothing_iterator_x_matches_yielded_norm(rng):
    """With smoothing=True the yielded value is norm(R_s); .x must expose the
    matching smoothed iterate X_s, not the raw one."""
    n = 40
    A = _spd(rng, n) + np.triu(rng.random((n, n)), 1) * 0.1
    b = rng.random(n)
    it = its.idrs_iterator(A, b, s=4, reltol=1e-9, smoothing=True)
    last = None
    for v in it:
        last = float(v)
    x = np.asarray(it.x)
    true_res = np.linalg.norm(np.asarray(A) @ x - b)
    # the smoothed norm is an exact recurrence for norm(b - A X_s)
    np.testing.assert_allclose(true_res, last, rtol=1e-5, atol=1e-9)


def test_lobpcg_iterator_converges(rng):
    """Step-wise LOBPCG (~ LOBPCGIterator, src/lobpcg.jl:497-522)."""
    n, bs = 60, 3
    vals = np.linspace(1.0, 10.0, n)
    Q, _ = np.linalg.qr(rng.random((n, n)))
    A = ((Q * vals) @ Q.T).astype(np.float64)
    X0 = rng.random((n, bs))
    it = its.lobpcg_iterator(A, X0, tol=1e-7, maxiter=300)
    res = [float(r) for r in it]
    assert res[-1] <= 1e-7 and len(res) >= 2
    lam = np.sort(np.asarray(it.state.lam))
    np.testing.assert_allclose(lam, np.sort(vals)[:bs], rtol=1e-6)
    X = np.asarray(it.x)
    assert X.shape == (n, bs)
    R = A @ X - X * np.asarray(it.state.lam)[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-5


def test_lobpcg_iterator_checkpoint_resume(rng):
    """Hold the state, resume in a fresh iterator — matches a straight run
    step-for-step (the state pytree is the checkpoint)."""
    n, bs = 50, 2
    A = _spd(rng, n)
    X0 = rng.random((n, bs))
    it1 = its.lobpcg_iterator(A, X0, tol=1e-8, maxiter=100)
    for i, _ in enumerate(it1):
        if i == 3:
            break
    saved = it1.state
    it2 = its.lobpcg_iterator(A, X0, tol=1e-8, maxiter=100)
    it2.state = saved
    for _ in it2:
        pass
    it3 = its.lobpcg_iterator(A, X0, tol=1e-8, maxiter=100)
    for _ in it3:
        pass
    np.testing.assert_allclose(np.asarray(it2.state.lam),
                               np.asarray(it3.state.lam), rtol=1e-10)
    assert int(it2.state.it) == int(it3.state.it)


def test_svdl_iterator_converges(rng):
    """Step-wise svdl macro-iterations (~ host loop src/svdl.jl:188-226)."""
    m, n, nsv = 80, 50, 4
    A = rng.random((m, n))
    it = its.svdl_iterator(A, nsv=nsv, tol=1e-9, reltol=1e-9, maxiter=200)
    res = [float(r) for r in it]
    assert bool(it.state.converged)
    s_ref = np.linalg.svd(A, compute_uv=False)[:nsv]
    np.testing.assert_allclose(np.asarray(it.x), s_ref, rtol=1e-7)
    assert res[-1] < res[0]


def test_svdl_iterator_checkpoint_matches_classic(rng):
    """Resuming from a held state reproduces the classic svdl values (the
    fused while_loop and the eager stepper share _svdl_step verbatim)."""
    m, n, nsv = 60, 40, 3
    A = rng.random((m, n))
    v0 = rng.random(n)
    it = its.svdl_iterator(A, nsv=nsv, v0=v0, maxiter=150)
    for i, _ in enumerate(it):
        if i == 2:
            break
    saved = it.state
    it2 = its.svdl_iterator(A, nsv=nsv, v0=v0, maxiter=150)
    it2.state = saved
    for _ in it2:
        pass
    vals, _fact = its.svdl(A, nsv=nsv, v0=v0, maxiter=150)
    np.testing.assert_allclose(np.asarray(it2.x), np.asarray(vals),
                               rtol=1e-8)


def test_block_cg_iterator_matches_solver():
    import jax.numpy as jnp
    import numpy as np

    from iterativesolvers_tpu import block_cg, block_cg_iterator
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(10, 2)
    n = A.shape[0]
    B = jnp.asarray(np.random.default_rng(2).standard_normal((n, 3)))
    it = block_cg_iterator(A, B, reltol=1e-10, maxiter=400)
    last = None
    for last in it:
        pass
    X = block_cg(A, B, reltol=1e-10, maxiter=400)
    np.testing.assert_allclose(np.asarray(it.x.T), np.asarray(X), atol=1e-9)
    assert np.all(np.asarray(last) >= 0)
