"""Pipelined (communication-reduced) CG — Ghysels & Vanroose.

A TPU-native addition beyond the reference's plain CG: on a device mesh the
standard CG pays 2-3 reduction latencies per iteration (SURVEY §7 "reduction
latency" is a ranked hard part); the pipelined variant

  * needs ONE fused reduction pair  (gamma = <r, u>, delta = <w, u>)
    per iteration — both reduce in a single psum when sharded, and
  * issues the next SpMV (n = A m) *before* consuming the reduction
    results, so XLA can overlap the allreduce with the matvec.

Cost: four extra vector recurrences (z, q, s, p) — more HBM traffic per
iteration, so on a single chip plain ``cg`` is usually faster; across hosts
the saved latency dominates.  Same convergence as CG in exact arithmetic
(the recurrences are algebraic rearrangements); in finite precision the
recurrence residual can drift slightly earlier than CG's.

Reference: Ghysels & Vanroose, "Hiding global synchronization latency in
the preconditioned Conjugate Gradient algorithm", Parallel Computing 40
(2014).  (Listed in PAPERS.md as the retrieved technique.)
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
    SolveResult,
    make_history,
    norm,
    resolve_tols,
    run_chunked,
    tolerance,
    with_highest_precision,
    vdot,
)

__all__ = ["pipelined_cg"]


class PipeCGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array   # M^{-1} r
    w: jax.Array   # A u
    z: jax.Array
    q: jax.Array
    s: jax.Array
    p: jax.Array
    gamma: jax.Array
    alpha: jax.Array
    residual: jax.Array
    tol: jax.Array
    k: jax.Array
    resnorm_log: jax.Array


def _pipecg_core(op, b, x0, Pl, reltol, abstol, maxiter, initially_zero):
    dtype = solve_dtype(op.dtype, b.dtype)
    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    u = Pl.ldiv(r)
    w = op.mv(u)
    residual = norm(r)
    tol = tolerance(residual, reltol, abstol)
    zeros = jnp.zeros_like(x)
    state0 = PipeCGState(
        x=x, r=r, u=u, w=w,
        z=zeros, q=zeros, s=zeros, p=zeros,
        gamma=jnp.ones((), dtype),
        alpha=jnp.ones((), dtype),
        residual=residual,
        tol=tol,
        k=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max(maxiter, 1),), real_dtype(dtype)),
    )

    def body(st: PipeCGState) -> PipeCGState:
        # ONE fused reduction bundle per iteration (single psum on a mesh):
        # gamma, delta, and the convergence norm all reduce over vectors
        # already streaming.  The norm is therefore the LAGGED residual
        # ||r_k|| of the incoming state (the standard Ghysels-Vanroose
        # trade: a separate norm(r_new) at the end of the body cannot fuse
        # with this bundle across the loop-carried dependency and would pay
        # a second reduction latency per iteration) — convergence is
        # detected one iteration late.
        gamma = vdot(st.r, st.u)
        delta = vdot(st.w, st.u)
        residual = jnp.sqrt(vdot(st.r, st.r).real).astype(st.residual.dtype)
        # next SpMV issued before alpha/beta consume the reductions -> XLA
        # overlaps the allreduce with the matvec
        m = Pl.ldiv(st.w)
        nvec = op.mv(m)
        first = st.k == 0
        beta = jnp.where(first, 0.0, gamma / st.gamma)
        denom = delta - beta * gamma / st.alpha
        alpha = gamma / jnp.where(denom == 0, 1, denom)
        z = nvec + beta * st.z
        q = m + beta * st.q
        s = st.w + beta * st.s
        p = st.u + beta * st.p
        x = st.x + alpha * p
        r = st.r - alpha * s
        u = st.u - alpha * q
        w = st.w - alpha * z
        # residual is ||r_k|| (incoming state): slot k-1 keeps the series
        # aligned with the other solvers (slot i = residual after iter i+1);
        # the k=0 write lands out of bounds and is dropped (scatter-drop)
        log_idx = jnp.where(first, st.resnorm_log.shape[0], st.k - 1)
        return PipeCGState(
            x=x, r=r, u=u, w=w, z=z, q=q, s=s, p=p,
            gamma=gamma, alpha=alpha,
            residual=residual, tol=st.tol, k=st.k + 1,
            resnorm_log=st.resnorm_log.at[log_idx].set(residual),
        )

    final = run_chunked(
        body, lambda st: (st.k >= maxiter) | (st.residual <= st.tol), state0
    )
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        # k steps logged slots 0..k-2 (the k=0 lagged write is dropped)
        log={"resnorm": (final.resnorm_log,
                         jnp.maximum(final.k - 1, 0))},
    )


_pipecg_jit = jax.jit(with_highest_precision(_pipecg_core),
                      static_argnames=("maxiter", "initially_zero"))


def pipelined_cg(
    A,
    b,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
):
    """Communication-reduced CG for sharded operators: one fused reduction
    per iteration, overlapped with the SpMV.  Same API as ``cg``."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    maxiter = int(maxiter if maxiter is not None else op.shape[1])
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(op.shape[1], dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    res = _pipecg_jit(
        op, b, jnp.asarray(x0), Pl, reltol_, abstol_, maxiter, initially_zero
    )
    if not log:
        return res.x
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=1 + (0 if initially_zero else 1)
    )
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history
