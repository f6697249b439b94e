"""BiCGStab(l).

Functional analogue of ``src/bicgstabl.jl``: per cycle an l-step BiCG half
(2l SpMVs) followed by an l-dimensional minimal-residual polynomial step.
The rs/us panels are (n, l+1) matrices so the MR half is three rank-l GEMMs
(src/bicgstabl.jl:117-131) — MXU-friendly.  ``l`` is static, so the BiCG
half unrolls at trace time.

Reference semantics preserved:
  * termination counts **matrix-vector products** (``max_mv_products``),
    not iterations (src/bicgstabl.jl:77, docstring :156-157);
  * the stopping residual is the *preconditioned, recurrence* residual —
    the true residual is never formed (docstring :164-168);
  * the shadow residual is random (src/bicgstabl.jl:38); here it comes from
    ``jax.random`` under an explicit ``seed`` for reproducibility.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, live_print, make_history, norm, resolve_tols, tolerance, vdot, with_highest_precision, run_chunked, SolverIterator, random_like

__all__ = ["bicgstabl", "bicgstabl_iterator"]


class BiCGStabState(NamedTuple):
    x: jax.Array
    rs: jax.Array       # (n, l+1)
    us: jax.Array       # (n, l+1)
    omega: jax.Array
    sigma: jax.Array
    mv: jax.Array       # mat-vec product count
    residual: jax.Array
    tol: jax.Array
    k: jax.Array        # outer iterations
    resnorm_log: jax.Array


def _random_like(key, n, dtype):
    return random_like(key, (n,), dtype)


def _bicgstabl_prepare(op, b, x0, Pl, r_shadow, reltol, abstol, l, max_mv,
                       initially_zero, verbose=False):
    """(state0, step, done) shared by the jitted core and the eager iterator
    (~ bicgstabl_iterator!, src/bicgstabl.jl:55-76)."""
    dtype = solve_dtype(op.dtype, b.dtype)
    n = b.shape[0]
    x = x0.astype(dtype)
    r = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(x)
    r = Pl.ldiv(r)
    mv0 = 0 if initially_zero else 1
    nrm = norm(r)
    tol = tolerance(nrm, reltol, abstol)
    max_cycles = max(1, (max_mv // (2 * l)) + 2)

    # rs/us stored TRANSPOSED (l+1, n): rows are vectors, so the static
    # column indexing below is contiguous row access (a (n, l+1) panel with
    # l+1 << 128 lanes wastes most of each (8, 128) tile on TPU)
    rs = jnp.zeros((l + 1, n), dtype=dtype).at[0].set(r)
    state0 = BiCGStabState(
        x=x,
        rs=rs,
        us=jnp.zeros((l + 1, n), dtype=dtype),
        omega=jnp.ones((), dtype),
        sigma=jnp.ones((), dtype),
        mv=jnp.asarray(mv0, jnp.int32),
        residual=nrm,
        tol=tol,
        k=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max_cycles,), real_dtype(dtype)),
    )

    def body(s):
        x, rs, us = s.x, s.rs, s.us
        sigma = -s.omega * s.sigma
        # BiCG half (src/bicgstabl.jl:88-112); j is static -> unrolled
        for j in range(l):
            rho = vdot(r_shadow, rs[j])
            beta = rho / sigma
            us = us.at[: j + 1].set(rs[: j + 1] - beta * us[: j + 1])
            next_u = Pl.ldiv(op.mv(us[j]))
            us = us.at[j + 1].set(next_u)
            sigma = vdot(r_shadow, next_u)
            alpha = rho / sigma
            rs = rs.at[: j + 1].add(-alpha * us[1 : j + 2])
            next_r = Pl.ldiv(op.mv(rs[j]))
            rs = rs.at[j + 1].set(next_r)
            x = x + alpha * us[0]

        # MR half (src/bicgstabl.jl:117-131): small (l+1)^2 Gram + solve
        M = jnp.conj(rs) @ rs.T
        gamma = jnp.linalg.solve(M[1:, 1:], M[1:, 0])
        u0 = us[0] - jnp.tensordot(gamma, us[1:], axes=1)
        x = x + jnp.tensordot(gamma, rs[:l], axes=1)
        r0 = rs[0] - jnp.tensordot(gamma, rs[1:], axes=1)
        us = us.at[0].set(u0)
        rs = rs.at[0].set(r0)
        residual = norm(r0)
        if verbose:
            # live residual line per outer l-cycle (@printf parity)
            live = (s.mv < max_mv) & (s.residual > s.tol)
            live_print(live, s.k + 1, residual)
        return BiCGStabState(
            x=x, rs=rs, us=us,
            omega=gamma[l - 1],
            sigma=sigma,
            mv=s.mv + 2 * l,
            residual=residual,
            tol=s.tol,
            k=s.k + 1,
            resnorm_log=s.resnorm_log.at[s.k].set(residual),
        )

    def done(s):
        # ~isfinite: MR-solve / rho-sigma breakdown (measured: l=4 on the
        # 125k advection-diffusion problem in f32 NaNs mid-solve) — exit
        # with converged=False instead of burning the whole mv budget on
        # NaN cycles.  NaN compares false on both other clauses, so without
        # this the loop runs to max_mv.  Scalar-only cond (CLAUDE.md rule).
        return ((s.mv >= max_mv) | (s.residual <= s.tol)
                | ~jnp.isfinite(s.residual))

    return state0, body, done


def _bicgstabl_core(op, b, x0, Pl, r_shadow, reltol, abstol, l, max_mv,
                    initially_zero, verbose=False):
    state0, step, done = _bicgstabl_prepare(
        op, b, x0, Pl, r_shadow, reltol, abstol, l, max_mv, initially_zero,
        verbose
    )
    final = run_chunked(step, done, state0)
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= final.tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    ), final.mv


_bicgstabl_jit = jax.jit(
    with_highest_precision(_bicgstabl_core), static_argnames=("l", "max_mv", "initially_zero", "verbose")
)


def bicgstabl(
    A,
    b,
    l: int = 2,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    max_mv_products: int | None = None,
    seed: int = 0,
    log: bool = False,
    verbose: bool = False,
):
    """Solve A x = b with BiCGStab(l) (~ bicgstabl/bicgstabl!,
    src/bicgstabl.jl:142-219)."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    n = op.shape[1]
    max_mv = int(max_mv_products if max_mv_products is not None else n)
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    r_shadow = _random_like(jax.random.PRNGKey(seed), n, dtype)
    res, mv = _bicgstabl_jit(
        op, b, jnp.asarray(x0), Pl, r_shadow, reltol_, abstol_, int(l), max_mv,
        initially_zero, verbose=bool(verbose),
    )
    if not log:
        return res.x
    history = make_history(res, mv_per_iter=0.0, mv_initial=0)
    history.mvps = int(mv)
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def bicgstabl_iterator(
    A,
    b,
    l: int = 2,
    *,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    max_mv_products: int | None = None,
    seed: int = 0,
) -> SolverIterator:
    """Eager BiCGStab(l) iterator (~ ``bicgstabl_iterator!``,
    src/bicgstabl.jl:55-76): yields the residual norm per l-cycle."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    n = op.shape[1]
    max_mv = int(max_mv_products if max_mv_products is not None else n)
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    r_shadow = _random_like(jax.random.PRNGKey(seed), n, dtype)
    state0, step, done = _bicgstabl_prepare(
        op, b, jnp.asarray(x0), Pl, r_shadow, reltol_, abstol_, int(l), max_mv,
        initially_zero,
    )
    return SolverIterator(state0, step=step, done=done, extract=lambda s: s.residual)
