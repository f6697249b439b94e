"""Conjugate Gradient (CG / PCG).

TPU-native re-design of the reference ``src/cg.jl``: the mutable
``CGIterable``/``PCGIterable`` (src/cg.jl:5-36) become an immutable state
pytree advanced by a pure step inside ``lax.while_loop``.  Numerics mirror the
reference exactly (src/cg.jl:43-96):

    c = Pl^{-1} r                  (identity Pl: c = r, so the PCG recurrence
    rho = <c, r>                    reduces to the plain CG one, src/cg.jl:50-51)
    beta = rho / rho_prev
    u = c + beta * u
    c = A u                        <- the SpMV
    alpha = rho / <u, c>
    x += alpha u;  r -= alpha c
    residual = |r|

Per iteration: 1 SpMV + 2 global reductions (<u,c> and |r|; +1 for <c,r> when
preconditioned) — on a sharded mesh these become psum allreduces.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, SolverIterator, make_history, norm, resolve_tols, tolerance, vdot, run_chunked, with_highest_precision

__all__ = ["cg", "cg_iterator", "CGState"]


class CGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array
    residual: jax.Array     # |r| (real)
    rho: jax.Array          # <Pl^{-1} r, r> of previous iteration
    k: jax.Array            # iteration counter (int32)
    tol: jax.Array
    resnorm_log: jax.Array  # (maxiter,) real


def _cg_init(op, b, x0, reltol, abstol, maxiter, initially_zero):
    dtype = solve_dtype(op.dtype, b.dtype)
    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    residual = norm(r)
    tol = tolerance(residual, reltol, abstol)
    return CGState(
        x=x,
        r=r,
        u=jnp.zeros_like(x),
        residual=residual,
        rho=jnp.ones((), dtype=dtype),
        k=jnp.zeros((), jnp.int32),
        tol=tol,
        # max(maxiter, 1): a zero-size buffer breaks the (never-executed)
        # scatter trace when maxiter=0
        resnorm_log=jnp.zeros((max(maxiter, 1),), dtype=real_dtype(dtype)),
    )


def _cg_step(op, Pl, state: CGState, verbose: bool = False, maxiter=None) -> CGState:
    c = Pl.ldiv(state.r)
    rho = vdot(c, state.r)
    beta = rho / state.rho
    u = c + beta * state.u
    # bundled SpMV + <u, Au>: one fused HBM pass for operators with a
    # Pallas kernel (StencilOperator on TPU); identical math otherwise
    c, sigma = op.mv_dot(u)
    alpha = rho / sigma
    x = state.x + alpha * u
    r = state.r - alpha * c
    residual = norm(r)
    if verbose:
        # run_chunked keeps re-stepping the frozen state (discarded) until
        # the chunk boundary — gate the print on liveness so a converged
        # solve doesn't emit up to chunk-1 duplicate final lines
        live = ~_cg_done(state, maxiter) if maxiter is not None else True
        jax.lax.cond(
            live,
            lambda k, res: jax.debug.print("{k:3d}\t{res:.2e}", k=k, res=res),
            lambda k, res: None,
            state.k + 1, residual,
        )
    return CGState(
        x=x,
        r=r,
        u=u,
        residual=residual,
        rho=rho,
        k=state.k + 1,
        tol=state.tol,
        resnorm_log=state.resnorm_log.at[state.k].set(residual),
    )


def _cg_done(state: CGState, maxiter: int):
    return (state.k >= maxiter) | (state.residual <= state.tol)


@partial(jax.jit, static_argnames=("maxiter", "initially_zero", "verbose",
                                   "chunk"))
@with_highest_precision
def _cg_solve(op, b, x0, Pl, reltol, abstol, maxiter, initially_zero, verbose,
              chunk=256):
    state0 = _cg_init(op, b, x0, reltol, abstol, maxiter, initially_zero)
    final = run_chunked(
        lambda s: _cg_step(op, Pl, s, verbose, maxiter),
        lambda s: _cg_done(s, maxiter),
        state0,
        chunk=chunk,
    )
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    )


def cg(
    A,
    b,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
    chunk: int = 256,
):
    """Solve A x = b with (preconditioned) conjugate gradients.

    Mirrors ``cg`` / ``cg!`` (src/cg.jl:162,209-242): pass ``x0`` for the
    in-place form's warm start; returns ``x`` or ``(x, ConvergenceHistory)``
    when ``log=True``.

    The reference's ``CGStateVariables`` scratch-buffer reuse (src/cg.jl:
    114-124) has no functional analogue: XLA buffer-donates the loop carry,
    so repeated solves already reuse device memory.

    ``chunk``: convergence-check granularity of the masked chunked loop
    (see ``common.run_chunked``).  The default 256 amortizes the ~1.5 ms
    data-dependent-cond sequencer sync for cheap iterations (~66 us on the
    2M-row Laplacian); a solve whose per-iteration cost is many hundreds
    of us (heavy preconditioner, Eisenstat operator) wastes up to chunk/2
    masked iterations of overshoot — pass a smaller chunk (e.g. 32-64)
    there.  Numerics are identical at any value.
    """
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=solve_dtype(op.dtype, b.dtype))
    reltol_, abstol_ = resolve_tols(solve_dtype(op.dtype, b.dtype), reltol, abstol)
    res = _cg_solve(
        op, b, jnp.asarray(x0), Pl, reltol_, abstol_, maxiter, initially_zero,
        verbose, chunk=int(chunk)
    )
    if not log:
        return res.x
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=0 if initially_zero else 1
    )
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def cg_iterator(
    A,
    b,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
) -> SolverIterator:
    """Eager CG iterator (~ ``cg_iterator!``, src/cg.jl:120-155): yields the
    residual norm each step; ``.state`` is inspectable/replaceable between
    steps and serves as a checkpoint."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=solve_dtype(op.dtype, b.dtype))
    reltol_, abstol_ = resolve_tols(solve_dtype(op.dtype, b.dtype), reltol, abstol)
    state0 = _cg_init(op, b, jnp.asarray(x0), reltol_, abstol_, maxiter, initially_zero)
    return SolverIterator(
        state0,
        step=lambda s: _cg_step(op, Pl, s),
        done=lambda s: _cg_done(s, maxiter),
        extract=lambda s: s.residual,
    )
