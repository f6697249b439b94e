"""QMR — Quasi-Minimal Residual for general nonsymmetric systems.

Functional analogue of ``src/qmr.jl``: two-sided (non-Hermitian) Lanczos
(``LanczosDecomp``, src/qmr.jl:5-99, Saad Algorithm 7.1) + a MINRES-style
sliding Givens QR of the tridiagonal (src/qmr.jl:100-228).  Requires an
adjoint matvec (``op.rmv``).

Breakdown handling mirrors the reference: when ``delta = sqrt(|<v,w>|)``
vanishes the Lanczos recurrence stops (src/qmr.jl:82-86); here divisions are
guarded so the step stays finite, the rotated rhs becomes 0 and the loop
terminates "converged" with the last iterate — the same observable behavior.

The residual estimate is the rotated-rhs tail ``|g2|`` (Proposition 7.3 of
Saad, src/qmr.jl:210-212).
The ``lookahead`` kwarg is accepted-but-unused in the reference
(src/qmr.jl:125,269) and is intentionally not replicated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..ops.givens import givens
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, live_print, make_history, norm, resolve_tols, tolerance, vdot, with_highest_precision, run_chunked, SolverIterator

__all__ = ["qmr", "qmr_iterator"]


class QMRState(NamedTuple):
    x: jax.Array
    v_prev: jax.Array   # v_m   (post-swap convention of the reference)
    v_curr: jax.Array   # v_{m+1}
    w_prev: jax.Array
    w_curr: jax.Array
    alpha: jax.Array
    beta_prev: jax.Array
    beta_curr: jax.Array
    delta: jax.Array
    g1: jax.Array
    c_prev: jax.Array
    s_prev: jax.Array
    c_curr: jax.Array
    s_curr: jax.Array
    p_prev: jax.Array
    p_curr: jax.Array
    residual: jax.Array
    tol: jax.Array
    k: jax.Array
    breakdown: jax.Array  # Lanczos breakdown delta == 0 (src/qmr.jl:82-86)
    resnorm_log: jax.Array


def _safe(x):
    return jnp.where(x == 0, 1, x)


def _qmr_prepare(op, b, x0, reltol, abstol, maxiter, initially_zero,
                 verbose=False):
    """(state0, step, done) shared by the jitted core and the eager iterator
    (~ qmr_iterable!, src/qmr.jl:120-140)."""
    dtype = solve_dtype(op.dtype, b.dtype)
    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    resnorm = norm(r)
    tol = tolerance(resnorm, reltol, abstol)
    v1 = r / _safe(resnorm)
    zeros = jnp.zeros_like(x)
    zt = jnp.zeros((), dtype)
    state0 = QMRState(
        x=x,
        v_prev=zeros, v_curr=v1,
        w_prev=zeros, w_curr=v1,
        alpha=zt, beta_prev=zt, beta_curr=zt, delta=zt,
        g1=resnorm.astype(dtype),
        c_prev=jnp.ones((), dtype), s_prev=zt,
        c_curr=jnp.ones((), dtype), s_curr=zt,
        p_prev=zeros, p_curr=zeros,
        residual=resnorm, tol=tol,
        k=jnp.zeros((), jnp.int32),
        breakdown=jnp.zeros((), bool),
        resnorm_log=jnp.zeros((max(maxiter, 1),), real_dtype(dtype)),
    )

    def body(s: QMRState) -> QMRState:
        # --- two-sided Lanczos step (src/qmr.jl:62-99); the iteration>1
        # guards are no-ops here because coefficients start at zero.
        v_next = op.mv(s.v_curr)
        alpha = vdot(v_next, s.w_curr)
        v_next = v_next - jnp.conj(alpha) * s.v_curr - jnp.conj(s.beta_curr) * s.v_prev
        w_next = op.rmv(s.w_curr) - alpha * s.w_curr - s.delta * s.w_prev
        vw = vdot(v_next, w_next)
        delta = jnp.sqrt(jnp.abs(vw)).astype(dtype)
        # Lanczos breakdown: stop like the reference (src/qmr.jl:82-86)
        breakdown = s.breakdown | (delta == 0)
        beta_prev = s.beta_curr
        beta_curr = vw / _safe(delta)
        v_next = v_next / _safe(delta)
        w_next = w_next / _safe(beta_curr)

        # --- QMR update (src/qmr.jl:160-215)
        H2 = jnp.conj(beta_prev)
        H3 = jnp.conj(alpha)
        H4 = delta
        H1 = s.s_prev * H2
        H2 = s.c_prev * H2
        tmp = -jnp.conj(s.s_curr) * H2 + s.c_curr * H3
        H2 = s.c_curr * H2 + s.s_curr * H3
        H3 = tmp
        c, s_rot, H3 = givens(H3, H4)
        g2 = -jnp.conj(s_rot) * s.g1
        g1 = c * s.g1

        p = (s.v_curr - H2 * s.p_curr - H1 * s.p_prev) / _safe(H3)
        x = s.x + g1 * p
        residual = jnp.abs(g2)
        if verbose:
            # live residual line (@printf parity); scalar-operand cond only
            live = (s.k < maxiter) & (s.residual > s.tol) & ~s.breakdown
            live_print(live, s.k + 1, residual)
        return QMRState(
            x=x,
            v_prev=s.v_curr, v_curr=v_next,
            w_prev=s.w_curr, w_curr=w_next,
            alpha=alpha, beta_prev=beta_prev, beta_curr=beta_curr, delta=delta,
            g1=g2.astype(dtype),
            c_prev=s.c_curr, s_prev=s.s_curr,
            c_curr=c.astype(dtype), s_curr=s_rot.astype(dtype),
            p_prev=s.p_curr, p_curr=p,
            residual=residual, tol=s.tol,
            k=s.k + 1,
            breakdown=breakdown,
            resnorm_log=s.resnorm_log.at[s.k].set(residual),
        )

    return state0, body, lambda s: (s.k >= maxiter) | (s.residual <= s.tol) | s.breakdown


def _qmr_core(op, b, x0, reltol, abstol, maxiter, initially_zero,
              verbose=False):
    state0, step, done = _qmr_prepare(
        op, b, x0, reltol, abstol, maxiter, initially_zero, verbose
    )
    final = run_chunked(step, done, state0)
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    )


_qmr_jit = jax.jit(with_highest_precision(_qmr_core), static_argnames=("maxiter", "initially_zero", "verbose"))


def qmr(
    A,
    b,
    *,
    x0=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
):
    """Solve A x = b with QMR (~ qmr/qmr!, src/qmr.jl:230-297).  Needs an
    operator with an adjoint matvec (dense/sparse matrices provide it;
    matrix-free operators must supply ``rmatvec``)."""
    op = as_operator(A, b)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    res = _qmr_jit(op, b, jnp.asarray(x0), reltol_, abstol_, maxiter,
                   initially_zero, verbose=bool(verbose))
    if not log:
        return res.x
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=0 if initially_zero else 1,
        mtv_per_iter=1.0,
    )
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def qmr_iterator(
    A,
    b,
    *,
    x0=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
) -> SolverIterator:
    """Eager QMR iterator (~ ``qmr_iterable!``, src/qmr.jl:120-140): yields
    the residual-norm estimate |g2| each step."""
    op = as_operator(A, b)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    state0, step, done = _qmr_prepare(
        op, b, jnp.asarray(x0), reltol_, abstol_, maxiter, initially_zero
    )
    return SolverIterator(state0, step=step, done=done, extract=lambda s: s.residual)
