"""ConvergenceHistory tests (~ test/history.jl:13-78)."""

import numpy as np

from iterativesolvers_tpu.utils.history import ConvergenceHistory

import iterativesolvers_tpu as its
from iterativesolvers_tpu.utils.fixtures import laplace_dia


def test_counters_and_accessors():
    h = ConvergenceHistory(restart=5)
    h.mvps, h.mtvps, h.iters = 12, 3, 11
    h.isconverged = True
    assert h.nprods() == 15
    assert h.niters() == 11
    assert h.nrests() == 3  # ceil(11 / 5)
    assert "converged" in repr(h)
    assert "iters=11" in repr(h)


def test_series_and_partial():
    h = ConvergenceHistory()
    h.set_series("resnorm", np.arange(10.0), 6)
    assert len(h["resnorm"]) == 6
    hp = ConvergenceHistory(partial=True)
    hp.set_series("resnorm", np.arange(10.0), 6)
    assert len(hp["resnorm"]) == 1 and hp["resnorm"][0] == 5.0


def test_dict_interface():
    h = ConvergenceHistory()
    h["abstol"] = 1e-8
    assert "abstol" in h
    assert h["abstol"] == 1e-8
    assert "abstol" in list(h.keys())


def test_plot_ascii_with_restarts():
    h = ConvergenceHistory(restart=10)
    h.set_series("resnorm", np.geomspace(1.0, 1e-8, 40), 40)
    out = h.plot()
    assert "*" in out and "|" in out  # curve + restart separators
    assert "resnorm" in out


def test_solver_history_end_to_end(rng):
    A = laplace_dia(16, 2)
    b = np.ones(A.shape[0])
    x, h = its.cg(A, b, reltol=1e-8, log=True)
    assert h.isconverged
    assert h.mvps == h.iters  # initially-zero start skips the first product
    assert len(h["resnorm"]) == h.iters
    # monotone-ish decreasing overall
    r = np.asarray(h["resnorm"], dtype=float)
    assert r[-1] < r[0]
    # gmres logs restart count
    x2, h2 = its.gmres(A, b, restart=15, reltol=1e-8, log=True)
    assert h2.restart == 15
    assert h2.nrests() >= 1


def test_plot_all_multiseries():
    h = ConvergenceHistory()
    h.set_series("resnorm", np.geomspace(1.0, 1e-6, 30), 30)
    h.set_series("anorm", np.linspace(1.0, 2.0, 30), 30)
    h["tol"] = 1e-8          # scalar: skipped like the reference's plotable
    out = h.plot_all()
    assert "resnorm" in out and "anorm" in out
    assert "tol" not in out


def test_plot_all_empty():
    assert ConvergenceHistory().plot_all() == "(no series)"
