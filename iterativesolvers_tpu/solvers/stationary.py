"""Stationary iterative methods: Jacobi, Gauss-Seidel, SOR, SSOR.

TPU-native re-design of the reference's ``src/stationary.jl`` (dense) and
``src/stationary_sparse.jl:209-426`` (sparse CSC).  Behavioral contract
(SURVEY §2.3): **exactly maxiter sweeps, no convergence check** (``maxiter=10``
default, src/stationary.jl:22-29); a singular/missing diagonal raises up front
(``check_diag``, src/stationary.jl:6-12; DiagonalIndices,
src/stationary_sparse.jl:18-20).

Sweep algebra (equivalent to the reference's fused column kernels
``forward_sub!(α, F, x, β, y)`` etc., src/stationary_sparse.jl:88-143):

    jacobi:        x <- D^{-1} (b - (A - D) x)
    gauss_seidel:  x <- (D + L)^{-1} (b - U x)
    sor(w):        (D/w + L) x_new = (b - U x) + (1/w - 1) D x
    ssor(w):       forward sor sweep, then the U/L-swapped backward sweep

where L/U are the strict lower/upper triangles.  Dense matrices use XLA's
native triangular solve; sparse matrices use the level-scheduled sweep
(ops/triangular.py) — the same dependency order as the sequential reference
loop, parallel across independent rows.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.sparse import CSRMatrix, DIAMatrix, ELLMatrix, HYBMatrix, csr_from_dense
from ..ops.triangular import LevelScheduledTriangular
from ..utils.dtypes import solve_dtype
from .common import SolverIterator, with_highest_precision

__all__ = [
    "jacobi",
    "gauss_seidel",
    "sor",
    "ssor",
    "jacobi_iterable",
    "gauss_seidel_iterable",
    "sor_iterable",
    "ssor_iterable",
    "SingularError",
]


class SingularError(ValueError):
    """Raised when the matrix diagonal has a missing or zero entry
    (~ ``SingularException``, src/stationary.jl:6-12)."""


# ---------------------------------------------------------------------------
# Host-side matrix splitting
# ---------------------------------------------------------------------------


class _Split(NamedTuple):
    """Host-precomputed D/L/U split of A, as pytree-friendly pieces."""

    diag: jax.Array                      # (n,)
    lower_mv: Optional[CSRMatrix]        # strict lower triangle (None if dense)
    upper_mv: Optional[CSRMatrix]        # strict upper triangle
    lower_solve: Optional[LevelScheduledTriangular]
    upper_solve: Optional[LevelScheduledTriangular]
    dense: Optional[jax.Array]           # dense A (None if sparse)
    n: int


def _strict_csr(rows, cols, vals, n, lower: bool):
    mask = (rows > cols) if lower else (rows < cols)
    return CSRMatrix.from_coo(rows[mask], cols[mask], vals[mask], (n, n))


def _split_matrix(A, need_lower_solve=False, need_upper_solve=False) -> _Split:
    if isinstance(A, (DIAMatrix, ELLMatrix, HYBMatrix)):
        A = A.to_csr()
    if isinstance(A, CSRMatrix):
        n = A.shape[0]
        if A.shape[0] != A.shape[1]:
            raise ValueError("stationary methods need a square matrix")
        d, present = A.diagonal()
        if not present.all() or (d == 0).any():
            raise SingularError("matrix has a missing or zero diagonal entry")
        rows = np.asarray(A.row_ids)
        cols = np.asarray(A.indices)
        vals = np.asarray(A.data)
        lower = _strict_csr(rows, cols, vals, n, lower=True)
        upper = _strict_csr(rows, cols, vals, n, lower=False)
        lo_solve = up_solve = None
        if need_lower_solve:
            lo_solve = LevelScheduledTriangular.from_csr(
                np.asarray(lower.indptr), np.asarray(lower.indices),
                np.asarray(lower.data), d, lower=True,
            )
        if need_upper_solve:
            up_solve = LevelScheduledTriangular.from_csr(
                np.asarray(upper.indptr), np.asarray(upper.indices),
                np.asarray(upper.data), d, lower=False,
            )
        return _Split(jnp.asarray(d), lower, upper, lo_solve, up_solve, None, n)

    # dense path (src/stationary.jl) — XLA-native triangular solves
    mat = jnp.asarray(A)
    if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
        raise ValueError("stationary methods need a square matrix")
    d = jnp.diagonal(mat)
    if bool(jnp.any(d == 0)):
        raise SingularError("matrix has a zero diagonal entry")
    return _Split(d, None, None, None, None, mat, int(mat.shape[0]))


def _mv_strict(split: _Split, which: str, x):
    """(strict L or U) @ x."""
    if split.dense is not None:
        T = jnp.tril(split.dense, -1) if which == "L" else jnp.triu(split.dense, 1)
        return T @ x
    op = split.lower_mv if which == "L" else split.upper_mv
    return op.mv(x)


def _solve_tri(split: _Split, which: str, rhs, omega):
    """Solve (D/omega + T) y = rhs, T the strict lower/upper triangle."""
    if split.dense is not None:
        lower = which == "L"
        T = jnp.tril(split.dense, -1) if lower else jnp.triu(split.dense, 1)
        M = T + jnp.diag(split.diag if omega is None else split.diag / omega)
        return jax.scipy.linalg.solve_triangular(M, rhs, lower=lower)
    solver = split.lower_solve if which == "L" else split.upper_solve
    return solver.solve(rhs, omega=omega)


# ---------------------------------------------------------------------------
# Sweeps
# ---------------------------------------------------------------------------


def _jacobi_sweep(split: _Split, b, x, omega=None):
    # x <- D^{-1} (b - (A - D) x)   (src/stationary.jl:31-49;
    #                                src/stationary_sparse.jl:225-234)
    off = _mv_strict(split, "L", x) + _mv_strict(split, "U", x)
    return (b - off) / split.diag


def _gs_sweep(split: _Split, b, x, omega=None):
    # x <- (D + L)^{-1} (b - U x)   (src/stationary_sparse.jl:278-286)
    return _solve_tri(split, "L", b - _mv_strict(split, "U", x), None)


def _sor_sweep(split: _Split, b, x, omega):
    # (D/w + L) x_new = (b - U x) + (1/w - 1) D x
    # == the reference's gauss_seidel_multiply! + forward_sub!(w, L, ., 1-w, x)
    #    (src/stationary_sparse.jl:322-336)
    rhs = (b - _mv_strict(split, "U", x)) + (1.0 / omega - 1.0) * split.diag * x
    return _solve_tri(split, "L", rhs, omega)


def _backward_sor_sweep(split: _Split, b, x, omega):
    rhs = (b - _mv_strict(split, "L", x)) + (1.0 / omega - 1.0) * split.diag * x
    return _solve_tri(split, "U", rhs, omega)


def _ssor_sweep(split: _Split, b, x, omega):
    # forward SOR then backward SOR (src/stationary.jl:227-263,
    # src/stationary_sparse.jl:392-409)
    return _backward_sor_sweep(split, b, _sor_sweep(split, b, x, omega), omega)


_SWEEPS = {
    "jacobi": _jacobi_sweep,
    "gauss_seidel": _gs_sweep,
    "sor": _sor_sweep,
    "ssor": _ssor_sweep,
}


# ---------------------------------------------------------------------------
# Multicolor sweeps (ordering="multicolor")
#
# Level scheduling preserves the reference's natural update order but is
# depth-bound: on random sparsity the dependency DAG can be O(n) deep.  The
# classical TPU/GPU alternative (SURVEY §7 step 6) is greedy multicoloring:
# rows of one color share no edge, so each color class updates fully in
# parallel — a sweep is `ncolors` masked Jacobi-style passes.  The update
# ORDER differs from the natural ordering (documented deviation; the
# reference itself deviates from textbook row order by sweeping CSC
# column-major, docs/src/linear_systems/stationary.md:5-8 — fixed sweep
# count, not ordering, is the contract).
# ---------------------------------------------------------------------------


def _color_classes(A_csr) -> jax.Array:
    """Greedy coloring of the symmetrized pattern (native C++ pass)."""
    from ..native import greedy_coloring

    n = A_csr.shape[0]
    rows = np.asarray(A_csr.row_ids, np.int64)
    cols = np.asarray(A_csr.indices, np.int64)
    # symmetrize the pattern so nonsymmetric matrices color correctly
    rs = np.concatenate([rows, cols])
    cs = np.concatenate([cols, rows])
    sym = CSRMatrix.from_coo(rs, cs, np.ones(rs.size), (n, n))
    color, nc = greedy_coloring(
        np.asarray(sym.indptr, np.int64), np.asarray(sym.indices), n
    )
    return jnp.asarray(color, jnp.int32), int(nc)


def _mc_pass(split: _Split, color, c, b, x, omega):
    off = _mv_strict(split, "L", x) + _mv_strict(split, "U", x)
    z = (b - off) / split.diag
    xi = z if omega is None else (1.0 - omega) * x + omega * z
    return jnp.where(color == c, xi, x)


def _make_mc_sweep(method: str, ncolors: int):
    def sweep(split, color, b, x, omega):
        for c in range(ncolors):          # static unroll
            x = _mc_pass(split, color, c, b, x, omega)
        if method == "ssor":
            for c in range(ncolors - 1, -1, -1):
                x = _mc_pass(split, color, c, b, x, omega)
        return x

    return sweep


@partial(jax.jit, static_argnames=("method", "maxiter"))
@with_highest_precision
def _run(split: _Split, b, x0, omega, method: str, maxiter: int):
    sweep = _SWEEPS[method]
    return jax.lax.fori_loop(
        0, maxiter, lambda _, x: sweep(split, b, x, omega), x0
    )


@partial(jax.jit, static_argnames=("method", "maxiter", "ncolors"))
@with_highest_precision
def _run_mc(split: _Split, color, b, x0, omega, method: str, maxiter: int,
            ncolors: int):
    sweep = _make_mc_sweep(method, ncolors)
    return jax.lax.fori_loop(
        0, maxiter, lambda _, x: sweep(split, color, b, x, omega), x0
    )


def _prep(A, b, x0, method, ordering="natural"):
    multicolor = ordering == "multicolor" and method != "jacobi"
    need_lo = not multicolor and method in ("gauss_seidel", "sor", "ssor")
    need_up = not multicolor and method == "ssor"
    split = _split_matrix(A, need_lower_solve=need_lo, need_upper_solve=need_up)
    b = jnp.asarray(b)
    dtype = solve_dtype(split.diag.dtype, b.dtype)
    x = jnp.zeros(split.n, dtype) if x0 is None else jnp.asarray(x0, dtype)
    return split, b, x


def _solve(A, b, omega, x0, maxiter, method, ordering):
    if ordering not in ("natural", "multicolor"):
        raise ValueError("ordering must be 'natural' or 'multicolor'")
    split, b, x = _prep(A, b, x0, method, ordering)
    om = None if omega is None else jnp.asarray(omega, split.diag.dtype)
    if ordering == "multicolor" and method != "jacobi":
        Ac = A.to_csr() if isinstance(A, (DIAMatrix, ELLMatrix, HYBMatrix)) else (
            A if isinstance(A, CSRMatrix) else csr_from_dense(np.asarray(A))
        )
        color, nc = _color_classes(Ac)
        return _run_mc(split, color, b, x, om, method, int(maxiter), nc)
    return _run(split, b, x, om, method, int(maxiter))


def jacobi(A, b, *, x0=None, maxiter: int = 10, ordering: str = "natural"):
    """``maxiter`` Jacobi sweeps (~ ``jacobi(!)``, src/stationary.jl:13-49)."""
    return _solve(A, b, None, x0, maxiter, "jacobi", ordering)


def gauss_seidel(A, b, *, x0=None, maxiter: int = 10, ordering: str = "natural"):
    """``maxiter`` Gauss-Seidel sweeps (~ ``gauss_seidel(!)``,
    src/stationary.jl:73-118).  ``ordering='multicolor'`` runs the sweep in
    greedy-coloring order — ncolors parallel passes instead of a
    dependency-depth-bound level schedule (fast path for random sparsity)."""
    return _solve(A, b, None, x0, maxiter, "gauss_seidel", ordering)


def sor(A, b, omega: float, *, x0=None, maxiter: int = 10,
        ordering: str = "natural"):
    """``maxiter`` SOR(omega) sweeps (~ ``sor(!)``, src/stationary.jl:131-177)."""
    return _solve(A, b, omega, x0, maxiter, "sor", ordering)


def ssor(A, b, omega: float, *, x0=None, maxiter: int = 10,
         ordering: str = "natural"):
    """``maxiter`` symmetric-SOR sweeps — one forward + one backward pass
    per iteration (~ ``ssor(!)``, src/stationary.jl:190-263)."""
    return _solve(A, b, omega, x0, maxiter, "ssor", ordering)


# ---------------------------------------------------------------------------
# Iterables (~ jacobi_iterable etc., src/stationary_sparse.jl:236-387)
# ---------------------------------------------------------------------------


class _StationaryState(NamedTuple):
    x: jax.Array
    k: jax.Array


def _iterable(A, b, method, omega, x0, maxiter) -> SolverIterator:
    split, b, x = _prep(A, b, x0, method)
    sweep = _SWEEPS[method]
    om = None if omega is None else jnp.asarray(omega, split.diag.dtype)

    def step(s: _StationaryState):
        return _StationaryState(sweep(split, b, s.x, om), s.k + 1)

    return SolverIterator(
        _StationaryState(x, jnp.zeros((), jnp.int32)),
        step=step,
        done=lambda s: s.k >= maxiter,
        extract=lambda s: s.x,
    )


def jacobi_iterable(A, b, *, x0=None, maxiter: int = 10):
    return _iterable(A, b, "jacobi", None, x0, maxiter)


def gauss_seidel_iterable(A, b, *, x0=None, maxiter: int = 10):
    return _iterable(A, b, "gauss_seidel", None, x0, maxiter)


def sor_iterable(A, b, omega: float, *, x0=None, maxiter: int = 10):
    return _iterable(A, b, "sor", omega, x0, maxiter)


def ssor_iterable(A, b, omega: float, *, x0=None, maxiter: int = 10):
    return _iterable(A, b, "ssor", omega, x0, maxiter)
