"""Chebyshev iteration for SPD systems with known spectral bounds.

Functional analogue of ``src/chebyshev.jl``: requires user-supplied eigenvalue
bounds (lmin, lmax) as positional arguments (src/chebyshev.jl:59,141); one SpMV
and **no inner products** in the update — the selling point on a mesh, since
only the stopping test needs a global reduction (and stopping can be checked
every ``check_every`` iterations to amortize it).

Deviation (documented): the reference's recurrence drops the search-direction
momentum (``u = c + beta*c`` where the textbook has ``beta*u``,
src/chebyshev.jl:46, and an `iteration == 1` branch that is unreachable at the
first step).  We implement the standard Templates/Saad recurrence

    beta_1 = 0,            alpha_1 = 1/d
    beta_2 = (c*alpha)^2/2, alpha_k = 1/(d - beta_k/alpha_{k-1})
    beta_k = (c*alpha/2)^2
    u = Pl^{-1} r + beta * u;  x += alpha*u;  r -= alpha*A*u

which satisfies the same contract (|r_k| <= max(reltol |r_0|, abstol)) at the
textbook rate.  Left preconditioning only, like the reference.

Also fixed consciously (SURVEY §2.3): the reference reserves/pushes its
residual history even when ``log=false`` (src/chebyshev.jl:152,159-163 has no
``log &&`` guard) — here history materializes only when ``log=True``, matching
every other solver's contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype, solve_dtype
from .common import (
    SolveResult,
    SolverIterator,
    make_history,
    norm,
    resolve_tols,
    run_chunked,
    live_print,
    tolerance,
    with_highest_precision,
)

__all__ = ["chebyshev", "chebyshev_iterator"]


class ChebyshevState(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array
    alpha: jax.Array
    residual: jax.Array
    tol: jax.Array
    k: jax.Array
    resnorm_log: jax.Array


def _cheb_prepare(op, b, x0, Pl, lmin, lmax, reltol, abstol, maxiter,
                  initially_zero, verbose=False):
    """Build (state0, step, done) — shared by the jitted core and the
    eager iterator (~ chebyshev_iterable!, src/chebyshev.jl:59-91)."""
    dtype = solve_dtype(op.dtype, b.dtype)
    rdt = real_dtype(dtype)
    d = jnp.asarray((lmax + lmin) / 2, rdt)
    half_c = jnp.asarray((lmax - lmin) / 4, rdt)  # c/2

    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    residual = norm(r)
    tol = tolerance(residual, reltol, abstol)
    state0 = ChebyshevState(
        x=x,
        r=r,
        u=jnp.zeros_like(x),
        alpha=jnp.zeros((), rdt),
        residual=residual,
        tol=tol,
        k=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max(maxiter, 1),), rdt),
    )

    def body(s):
        z = Pl.ldiv(s.r)
        # beta_1 = 0 (alpha starts at 0); beta_2 = (c alpha)^2 / 2;
        # beta_k = (c alpha / 2)^2 afterwards
        beta = jnp.where(
            s.k == 1,
            2 * (half_c * s.alpha) ** 2,
            (half_c * s.alpha) ** 2,
        )
        alpha = jnp.where(
            s.k == 0,
            1.0 / d,
            1.0 / (d - beta / jnp.where(s.alpha == 0, 1, s.alpha)),
        )
        u = z + beta * s.u
        c = op.mv(u)
        x = s.x + alpha * u
        r = s.r - alpha * c
        residual = norm(r)
        if verbose:
            # live residual line (src/chebyshev.jl @printf parity)
            live = (s.k < maxiter) & (s.residual > s.tol)
            live_print(live, s.k + 1, residual)
        return ChebyshevState(
            x=x, r=r, u=u, alpha=alpha,
            residual=residual, tol=s.tol, k=s.k + 1,
            resnorm_log=s.resnorm_log.at[s.k].set(residual),
        )

    return state0, body, lambda s: (s.k >= maxiter) | (s.residual <= s.tol)


def _cheb_core(op, b, x0, Pl, lmin, lmax, reltol, abstol, maxiter,
               initially_zero, verbose=False):
    state0, step, done = _cheb_prepare(
        op, b, x0, Pl, lmin, lmax, reltol, abstol, maxiter, initially_zero,
        verbose
    )
    final = run_chunked(step, done, state0)
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    )


_cheb_jit = jax.jit(with_highest_precision(_cheb_core),
                    static_argnames=("maxiter", "initially_zero", "verbose"))


def chebyshev(
    A,
    b,
    lmin: float,
    lmax: float,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
):
    """Solve A x = b by Chebyshev iteration given eigenvalue bounds
    (~ chebyshev/chebyshev!, src/chebyshev.jl:93-170)."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    res = _cheb_jit(
        op, b, jnp.asarray(x0), Pl, float(lmin), float(lmax),
        reltol_, abstol_, maxiter, initially_zero, verbose=bool(verbose),
    )
    if not log:
        return res.x
    history = make_history(res, mv_per_iter=1.0, mv_initial=0 if initially_zero else 1)
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def chebyshev_iterator(
    A,
    b,
    lmin: float,
    lmax: float,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
) -> SolverIterator:
    """Eager Chebyshev iterator (~ ``chebyshev_iterable!``,
    src/chebyshev.jl:59-91): yields the residual norm each step."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    state0, step, done = _cheb_prepare(
        op, b, jnp.asarray(x0), Pl, float(lmin), float(lmax),
        reltol_, abstol_, maxiter, initially_zero,
    )
    return SolverIterator(state0, step=step, done=done, extract=lambda s: s.residual)
