"""MINRES for Hermitian (or skew-Hermitian) indefinite systems.

Functional re-design of ``src/minres.jl``: the Lanczos 3-term recurrence with
two sliding Givens rotations and a W = V R^{-1} recurrence (src/minres.jl:97-159).
The reference's ``iteration > 1`` / ``> 2`` guards vanish here: buffers are
zero-initialized and rotations start as identities, so the guarded updates are
exact no-ops in the first iterations and the loop body is branch-free — ideal
for ``lax.while_loop``.

``skew_hermitian=True`` keeps the Hessenberg column complex and flips its
symmetry ``H2 <- -H4`` (src/minres.jl:46,110,153).

The residual estimate is ``|rhs[1]|`` after rotation (src/minres.jl:156) — the
true residual norm is not formed (no extra reduction per iteration).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..ops.givens import givens
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, SolverIterator, live_print, make_history, norm, resolve_tols, tolerance, vdot, run_chunked, with_highest_precision

__all__ = ["minres", "minres_iterator"]


class MINRESState(NamedTuple):
    x: jax.Array
    v_prev: jax.Array
    v_curr: jax.Array
    w_prev: jax.Array
    w_curr: jax.Array
    H2: jax.Array          # sub/super-diagonal carried to the next iteration
    rhs1: jax.Array        # active rhs entry
    c_prev: jax.Array
    s_prev: jax.Array
    c_curr: jax.Array
    s_curr: jax.Array
    residual: jax.Array
    tol: jax.Array
    k: jax.Array
    resnorm_log: jax.Array


def _minres_init(op, b, x0, reltol, abstol, maxiter, initially_zero, skew):
    dtype = solve_dtype(op.dtype, b.dtype)
    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    resnorm = norm(r)
    tol = tolerance(resnorm, reltol, abstol)
    safe = jnp.where(resnorm == 0, 1, resnorm)
    hdtype = dtype if skew else real_dtype(dtype)
    return MINRESState(
        x=x,
        v_prev=jnp.zeros_like(x),
        v_curr=r / safe,
        w_prev=jnp.zeros_like(x),
        w_curr=jnp.zeros_like(x),
        H2=jnp.zeros((), hdtype),
        rhs1=resnorm.astype(hdtype),
        # rotations live in the Hessenberg dtype: real for Hermitian problems
        # (Lanczos tridiagonal is real), complex for skew-Hermitian ones
        c_prev=jnp.ones((), hdtype),
        s_prev=jnp.zeros((), hdtype),
        c_curr=jnp.ones((), hdtype),
        s_curr=jnp.zeros((), hdtype),
        residual=resnorm,
        tol=tol,
        k=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max(maxiter, 1),), real_dtype(dtype)),
    )


def _minres_step(op, state: MINRESState, skew: bool, verbose: bool = False,
                 maxiter=None) -> MINRESState:
    # Lanczos: v_next = A v_curr - H2 * v_prev, orthogonalize against v_curr
    v_next = op.mv(state.v_curr) - state.H2 * state.v_prev
    proj = vdot(state.v_curr, v_next)
    H3 = proj if skew else jnp.real(proj)
    v_next = v_next - proj * state.v_curr
    H4 = norm(v_next)
    safe = jnp.where(H4 == 0, 1, H4)
    v_next = v_next / safe

    # sliding rotations (no-ops in iterations 1-2 because identities/zeros)
    H1 = state.s_prev * state.H2
    H2 = state.c_prev * state.H2
    tmp = -jnp.conj(state.s_curr) * H2 + state.c_curr * H3
    H2 = state.c_curr * H2 + state.s_curr * H3
    H3 = tmp

    c, s, H3 = givens(H3, H4.astype(tmp.dtype))
    rhs2 = -jnp.conj(s) * state.rhs1
    rhs1 = c * state.rhs1

    # W = V R^{-1} recurrence
    safe_H3 = jnp.where(H3 == 0, 1, H3)
    w_next = (state.v_curr - H2 * state.w_curr - H1 * state.w_prev) / safe_H3
    x = state.x + rhs1 * w_next

    residual = jnp.abs(rhs2)
    if verbose:
        # live per-iteration residual (src/minres.jl @printf parity)
        live = ~_minres_done(state, maxiter) if maxiter is not None else True
        live_print(live, state.k + 1, residual)
    return MINRESState(
        x=x,
        v_prev=state.v_curr,
        v_curr=v_next,
        w_prev=state.w_curr,
        w_curr=w_next,
        H2=(-H4 if skew else H4).astype(state.H2.dtype),
        rhs1=rhs2.astype(state.rhs1.dtype),
        c_prev=state.c_curr,
        s_prev=state.s_curr,
        c_curr=c.astype(state.c_curr.dtype),
        s_curr=s.astype(state.s_curr.dtype),
        residual=residual,
        tol=state.tol,
        k=state.k + 1,
        resnorm_log=state.resnorm_log.at[state.k].set(residual),
    )


def _minres_done(state: MINRESState, maxiter: int):
    return (state.k >= maxiter) | (state.residual <= state.tol)


def _minres_core(op, b, x0, reltol, abstol, maxiter, initially_zero, skew,
                 verbose=False):
    state0 = _minres_init(op, b, x0, reltol, abstol, maxiter, initially_zero, skew)
    final = run_chunked(
        lambda s: _minres_step(op, s, skew, verbose, maxiter),
        lambda s: _minres_done(s, maxiter),
        state0,
    )
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    )


_minres_jit = jax.jit(
    with_highest_precision(_minres_core),
    static_argnames=("maxiter", "initially_zero", "skew", "verbose"),
)


def minres(
    A,
    b,
    *,
    x0=None,
    skew_hermitian: bool = False,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
):
    """Solve A x = b for Hermitian (or skew-Hermitian) A
    (~ minres/minres!, src/minres.jl:161-244)."""
    op = as_operator(A, b)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    res = _minres_jit(
        op, b, jnp.asarray(x0), reltol_, abstol_, maxiter, initially_zero,
        bool(skew_hermitian), verbose=bool(verbose),
    )
    if not log:
        return res.x
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=0 if initially_zero else 1
    )
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def minres_iterator(A, b, *, x0=None, skew_hermitian=False, abstol=None,
                    reltol=None, maxiter=None) -> SolverIterator:
    op = as_operator(A, b)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    state0 = _minres_init(
        op, b, jnp.asarray(x0), reltol_, abstol_, maxiter, initially_zero,
        bool(skew_hermitian),
    )
    return SolverIterator(
        state0,
        step=lambda s: _minres_step(op, s, bool(skew_hermitian)),
        done=lambda s: _minres_done(s, maxiter),
        extract=lambda s: s.residual,
    )
