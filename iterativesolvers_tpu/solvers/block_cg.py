"""Multi-RHS (batched) conjugate gradients.

TPU-native extension with no reference counterpart (the reference's ``cg``
is single-RHS, src/cg.jl:162): solve ``A x_i = b_i`` for all k columns of
B SIMULTANEOUSLY, with every vector operation batched over a (k, n) row
panel (VECTORS AS ROWS, the repo's block layout) and the SpMV becoming one
``mv_rows`` SpMM.

Why it exists (BENCH_NOTES r4 "Unstructured-gather mitigation"): on this
TPU the gather that dominates unstructured SpMV (ELL/HYB) costs ~8 ns per
INDEX regardless of the fetched width, so one k-wide gathered SpMM costs
the same as ONE SpMV — the per-vector cost of the batched solve drops
~k-fold on gather-bound operators (measured in
benchmarks/tpu_block_cg_ab.py).  On streaming operators (DIA/stencil) the
same batching amortizes the matrix-value streams k-fold instead.

This is batched CG (independent Krylov spaces per column, per-column
convergence masking), not classical block CG (shared search space): the
iteration counts match single-RHS CG column-for-column, which keeps the
semantics identical to looping ``cg`` over columns — only faster.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype, solve_dtype
from .common import (
    SolverIterator,
    resolve_tols,
    run_chunked,
    with_highest_precision,
)

__all__ = ["block_cg", "block_cg_iterator"]


class BlockCGState(NamedTuple):
    X: jax.Array          # (k, n) iterates, rows are vectors
    R: jax.Array          # (k, n) residuals
    U: jax.Array          # (k, n) search directions
    residual: jax.Array   # (k,)
    rho: jax.Array        # (k,)
    it: jax.Array         # scalar iteration counter
    tol: jax.Array        # (k,)
    resnorm_log: jax.Array  # (maxiter, k)


def _row_norms(R):
    return jnp.sqrt(jnp.sum(jnp.real(jnp.conj(R) * R), axis=1))


def _block_cg_init(op, Br, Xr, reltol, abstol, maxiter):
    dtype = Xr.dtype
    R = Br - op.mv_rows(Xr)
    residual = _row_norms(R)
    tol = jnp.maximum(reltol * residual, abstol).astype(real_dtype(dtype))
    k = Br.shape[0]
    return BlockCGState(
        X=Xr, R=R, U=jnp.zeros_like(Xr),
        residual=residual,
        rho=jnp.ones((k,), dtype),
        it=jnp.zeros((), jnp.int32),
        tol=tol,
        resnorm_log=jnp.zeros((max(int(maxiter), 1), k), real_dtype(dtype)),
    )


def _block_cg_step(op, Pl, s: BlockCGState, maxiter: int) -> BlockCGState:
    live = (s.residual > s.tol) & (s.it < maxiter)          # (k,)
    C = Pl.ldiv_rows(s.R)
    rho = jnp.sum(jnp.conj(C) * s.R, axis=1)
    beta = jnp.where(live, rho / jnp.where(s.rho == 0, 1, s.rho), 0)
    U = C + beta[:, None] * s.U
    AU = op.mv_rows(U)
    sigma = jnp.sum(jnp.conj(U) * AU, axis=1)
    # alpha = 0 freezes converged columns exactly (X, R unchanged)
    alpha = jnp.where(live, rho / jnp.where(sigma == 0, 1, sigma), 0)
    X = s.X + alpha[:, None] * U
    R = s.R - alpha[:, None] * AU
    residual = jnp.where(live, _row_norms(R), s.residual)
    return BlockCGState(
        X=X, R=R, U=U,
        residual=residual,
        rho=jnp.where(live, rho, s.rho),
        it=s.it + 1,
        tol=s.tol,
        resnorm_log=s.resnorm_log.at[s.it].set(residual),
    )


def _block_cg_done(s: BlockCGState, maxiter: int):
    return (s.it >= maxiter) | jnp.all(s.residual <= s.tol)


@partial(jax.jit, static_argnames=("maxiter", "chunk"))
@with_highest_precision
def _block_cg_solve(op, Br, Xr, Pl, reltol, abstol, maxiter, chunk=256):
    s0 = _block_cg_init(op, Br, Xr, reltol, abstol, maxiter)
    final = run_chunked(
        lambda s: _block_cg_step(op, Pl, s, maxiter),
        lambda s: _block_cg_done(s, maxiter),
        s0,
        chunk=chunk,
    )
    return final


def block_cg(
    A,
    B,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    chunk: int = 256,
):
    """Solve ``A X = B`` for an (n, k) block of right-hand sides with
    batched CG (see module docstring).  Per-column tolerances follow the
    single-RHS ``cg`` contract (``max(reltol * |r0_i|, abstol)``);
    converged columns freeze exactly while the rest continue.

    Returns ``X`` of shape (n, k), or ``(X, history)`` when ``log=True``
    (history.isconverged = all columns; ``history["resnorm"]`` is the
    (iters, k) per-column residual trace).
    """
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError("block_cg expects B of shape (n, k); "
                         "use cg() for a single right-hand side")
    op = as_operator(A, B[:, 0])
    Pl = as_preconditioner(Pl)
    n, k = B.shape
    maxiter = int(maxiter if maxiter is not None else n)
    dtype = solve_dtype(op.dtype, B.dtype)
    Br = B.T.astype(dtype)                       # (k, n) rows
    Xr = (jnp.zeros_like(Br) if x0 is None
          else jnp.asarray(x0).T.astype(dtype))
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    final = _block_cg_solve(op, Br, Xr, Pl, reltol_, abstol_, maxiter,
                            chunk=int(chunk))
    X = final.X.T
    if not log:
        return X
    from ..utils.history import ConvergenceHistory

    history = ConvergenceHistory(partial=False)
    iters = int(final.it)
    history.iters = iters
    history.isconverged = bool(jnp.all(final.residual <= final.tol))
    history.mvps = iters * k + k                 # k per iteration + init
    history["reltol"] = float(reltol_)
    history["abstol"] = float(abstol_)
    import numpy as np

    history.data["resnorm"] = np.asarray(final.resnorm_log)[:iters]
    history.data["converged_per_rhs"] = np.asarray(
        final.residual <= final.tol)
    return X, history


def block_cg_iterator(
    A,
    B,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
) -> SolverIterator:
    """Eager block-CG iterator (iterator-protocol uniformity,
    docs/iterators.md): yields the (k,) per-column residual norms each
    iteration; ``.x`` holds the (k, n) row-panel iterate."""
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError("block_cg_iterator expects B of shape (n, k)")
    op = as_operator(A, B[:, 0])
    Pl = as_preconditioner(Pl)
    n, k = B.shape
    maxiter = int(maxiter if maxiter is not None else n)
    dtype = solve_dtype(op.dtype, B.dtype)
    Br = B.T.astype(dtype)
    Xr = (jnp.zeros_like(Br) if x0 is None
          else jnp.asarray(x0).T.astype(dtype))
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    state0 = _block_cg_init(op, Br, Xr, reltol_, abstol_, maxiter)
    return SolverIterator(
        state0,
        step=lambda s: _block_cg_step(op, Pl, s, maxiter),
        done=lambda s: _block_cg_done(s, maxiter),
        extract=lambda s: s.residual,
    )
