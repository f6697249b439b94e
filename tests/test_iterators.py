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
