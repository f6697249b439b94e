"""ConvergenceHistory tests (~ test/history.jl:13-78)."""

import numpy as np
import pytest

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


# ---------------- live verbose (@printf parity, src/cg.jl:234) --------------


def _live_lines(capsys):
    import jax

    jax.effects_barrier()
    out = capsys.readouterr().out
    return [ln for ln in out.splitlines() if ln.strip()]


@pytest.mark.parametrize("solver_kw", [
    ("cg", {}),
    ("minres", {}),
    ("gmres", {"restart": 10}),
    ("qmr", {}),
    ("bicgstabl", {}),
    ("idrs", {"s": 4}),
], ids=lambda p: p[0] if isinstance(p, tuple) else str(p))
def test_live_verbose_prints_during_solve(rng, capsys, solver_kw):
    """verbose=True emits one LIVE residual line per executed iteration
    (the reference prints via in-loop @printf, src/cg.jl:234); no
    duplicate lines from run_chunked's frozen post-convergence re-steps."""
    import iterativesolvers_tpu as its

    name, kw = solver_kw
    n = 40
    A = rng.random((n, n)) + n * np.eye(n)
    if name in ("cg", "minres"):
        A = A @ A.T + n * np.eye(n)
    b = rng.random(n)
    solver = getattr(its, name)
    x, h = solver(A, b, reltol=1e-8, verbose=True, log=True, **kw)
    lines = _live_lines(capsys)
    assert len(lines) > 0
    # every line is "  k\t1.23e-05"
    ks, vals = [], []
    for ln in lines:
        k_str, v_str = ln.split("\t")
        ks.append(int(k_str))
        vals.append(float(v_str))
    assert ks == sorted(ks)
    # no duplicate final lines (frozen re-steps are gated off);
    # bicgstabl counts outer l-cycles, others count iterations
    assert len(lines) <= max(h.iters, 1)
    assert vals[-1] < vals[0]


def test_live_verbose_chebyshev(rng, capsys):
    import iterativesolvers_tpu as its

    n = 30
    Q, _ = np.linalg.qr(rng.random((n, n)))
    vals = np.linspace(1.0, 4.0, n)
    A = (Q * vals) @ Q.T
    b = rng.random(n)
    its.chebyshev(A, b, 1.0, 4.0, reltol=1e-8, maxiter=400, verbose=True)
    lines = _live_lines(capsys)
    assert len(lines) > 2


# ---------------- matplotlib recipe (src/history.jl:269-325) ----------------


def test_to_mpl_subplots_and_restart_separators(rng):
    """ConvergenceHistory.to_mpl: one subplot per plottable key, vertical
    restart separators (the Plots.jl recipe equivalents)."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import iterativesolvers_tpu as its

    n = 60
    A = rng.random((n, n)) + 12 * np.eye(n)
    b = rng.random(n)
    x, h = its.gmres(A, b, restart=5, reltol=1e-10, log=True)
    assert h.iters > 10  # several restarts
    fig = h.to_mpl()
    keys = h.plotable_keys()
    assert "resnorm" in keys
    assert len(fig.axes) == len(keys)
    ax = fig.axes[keys.index("resnorm")]
    # one axvline per restart boundary within the trace
    n_sep = sum(1 for ln in ax.lines
                if len(set(np.asarray(ln.get_xdata(), float))) == 1)
    assert n_sep == (h.iters - 1) // 5
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_to_mpl_2d_series(rng):
    """2-D series (per-vector residuals) draw one line per column."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")

    from iterativesolvers_tpu.utils.history import ConvergenceHistory

    h = ConvergenceHistory()
    h.iters = 8
    h.data["resnorm"] = np.abs(rng.random((8, 3))) + 1e-3
    fig = h.to_mpl()
    assert len(fig.axes) == 1
    assert len(fig.axes[0].lines) == 3
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_to_mpl_raises_on_empty():
    from iterativesolvers_tpu.utils.history import ConvergenceHistory

    pytest.importorskip("matplotlib")
    h = ConvergenceHistory()
    with pytest.raises(ValueError):
        h.to_mpl()
