"""IDR(s) — Induced Dimension Reduction.

Functional analogue of ``src/idrs.jl``.  The reference's iterator state is the
tuple ``(iter, step)`` (src/idrs.jl:163): steps 1..s build the G_j space one
column at a time (each solving a shrinking lower-triangular system
``M[k:s,k:s] \\ f[k:s]``, src/idrs.jl:186), step s+1 is the dimension-reduction
step with the omega angle-safeguard sqrt(2)/2 (src/idrs.jl:70-81).

TPU-native formulation: all shapes static.  The shrinking triangular solve
becomes a full s x s solve on a masked matrix (identity rows/cols below k),
whose solution provably has zeros below k and the exact subsystem solution at
and above k.  Column updates use one-hot masks; the bi-orthogonalization loop
is a masked ``fori_loop``.  Shadow space P is drawn from ``jax.random`` under
an explicit seed (reference: ``rand!``, src/idrs.jl:132).

Optional residual ``smoothing`` mirrors src/idrs.jl:119-127,225-234.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, live_print, make_history, norm, resolve_tols, tolerance, vdot, with_highest_precision, run_chunked, SolverIterator, random_like

__all__ = ["idrs", "idrs_iterator"]

_ANGLE = 0.7071067811865476  # sqrt(2)/2 (src/idrs.jl:71)


def _omega(t, s_vec):
    """Minimal-residual omega with the angle safeguard (src/idrs.jl:70-81)."""
    ns = norm(s_vec)
    nt = norm(t)
    ts = vdot(t, s_vec)
    rho = jnp.abs(ts / (nt * ns))
    om = ts / (nt * nt)
    return jnp.where(rho < _ANGLE, om * _ANGLE / jnp.where(rho == 0, 1, rho), om)


class IDRSState(NamedTuple):
    X: jax.Array
    R: jax.Array
    X_s: jax.Array      # smoothing state (unused buffers when smoothing=False)
    R_s: jax.Array
    U: jax.Array        # (n, s)
    G: jax.Array        # (n, s)
    M: jax.Array        # (s, s)
    f: jax.Array        # (s,)
    omega: jax.Array
    normR: jax.Array
    tol: jax.Array
    it: jax.Array       # total steps taken (1 SpMV each)
    step: jax.Array     # 0..s-1: G-space build; s: dimension reduction
    resnorm_log: jax.Array


def _smooth(Xs, Rs, X, R):
    """Residual smoothing update (src/idrs.jl:225-234)."""
    Ts = Rs - R
    denom = vdot(Ts, Ts)
    gamma = vdot(Rs, Ts) / jnp.where(denom == 0, 1, denom)
    Rs = Rs - gamma * Ts
    Xs = Xs - gamma * (Xs - X)
    return Xs, Rs, norm(Rs)


def _idrs_prepare(op, b, x0, Pl, P, reltol, abstol, s, maxiter, smoothing,
                  initially_zero, verbose=False):
    """(state0, step, done) shared by the jitted core and the eager iterator
    (~ idrs_iterable!, src/idrs.jl:103-160)."""
    dtype = solve_dtype(op.dtype, b.dtype)
    X = x0.astype(dtype)
    R = b.astype(dtype) if initially_zero else b.astype(dtype) - op.mv(X)
    normR = norm(R)
    tol = tolerance(normR, reltol, abstol)
    n = b.shape[0]
    idx = jnp.arange(s)

    # U/G and the shadow space stored TRANSPOSED (s, n): rows are vectors
    # (lane-padding economics of (n, s) panels on TPU)
    state0 = IDRSState(
        X=X, R=R, X_s=X, R_s=R,
        U=jnp.zeros((s, n), dtype), G=jnp.zeros((s, n), dtype),
        M=jnp.eye(s, dtype=dtype), f=jnp.zeros(s, dtype),
        omega=jnp.ones((), dtype),
        normR=normR, tol=tol,
        it=jnp.zeros((), jnp.int32), step=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max(maxiter, 1),), real_dtype(dtype)),
    )

    def k_step(st: IDRSState) -> IDRSState:
        k = st.step
        f = jnp.where(k == 0, jnp.conj(P) @ st.R, st.f)

        # c = LowerTriangular(M[k:s,k:s]) \ f[k:s], zero-padded below k:
        # mask M to identity outside the active block, f to zero below k
        row = idx[:, None]
        col = idx[None, :]
        active_blk = (row >= k) & (col >= k)
        Mmask = jnp.where(active_blk, st.M, jnp.where(row == col, 1, 0).astype(st.M.dtype))
        fmask = jnp.where(idx >= k, f, 0)
        c = jax.scipy.linalg.solve_triangular(Mmask, fmask, lower=True)

        V = st.R - jnp.tensordot(c, st.G, axes=1)
        Q = jnp.tensordot(c, st.U, axes=1)
        V = Pl.ldiv(V)
        uk = Q + st.omega * V
        gk = op.mv(uk)

        # bi-orthogonalize against P_i, i < k (src/idrs.jl:206-210)
        def biortho(i, carry):
            gk, uk = carry
            P_i = jax.lax.dynamic_slice_in_dim(P, i, 1, axis=0)[0]
            G_i = jax.lax.dynamic_slice_in_dim(st.G, i, 1, axis=0)[0]
            U_i = jax.lax.dynamic_slice_in_dim(st.U, i, 1, axis=0)[0]
            alpha = jnp.where(i < k, vdot(P_i, gk) / st.M[i, i], 0)
            return gk - alpha * G_i, uk - alpha * U_i

        gk, uk = jax.lax.fori_loop(0, s, biortho, (gk, uk))

        # new column M[k:s, k] = P[k:s]' gk (src/idrs.jl:214-216)
        m_new = jnp.conj(P) @ gk
        M = jnp.where((col == k) & (row >= k), m_new[:, None], st.M)

        beta = f[k] / M[k, k]
        R = st.R - beta * gk
        X = st.X + beta * uk
        normR = norm(R)
        X_s, R_s = st.X_s, st.R_s
        if smoothing:
            X_s, R_s, normR = _smooth(X_s, R_s, X, R)
        f = jnp.where(idx > k, f - beta * jnp.take(M, k, axis=1), f)

        U = jax.lax.dynamic_update_slice_in_dim(st.U, uk[None, :], k, axis=0)
        G = jax.lax.dynamic_update_slice_in_dim(st.G, gk[None, :], k, axis=0)
        return st._replace(
            X=X, R=R, X_s=X_s, R_s=R_s, U=U, G=G, M=M, f=f,
            normR=normR, it=st.it + 1, step=k + 1,
            resnorm_log=st.resnorm_log.at[st.it].set(normR),
        )

    def reduction_step(st: IDRSState) -> IDRSState:
        # r already perpendicular to P, so v = r (src/idrs.jl:239-264)
        V = Pl.ldiv(st.R)
        Q = op.mv(V)
        om = _omega(Q, st.R)
        R = st.R - om * Q
        X = st.X + om * V
        normR = norm(R)
        X_s, R_s = st.X_s, st.R_s
        if smoothing:
            X_s, R_s, normR = _smooth(X_s, R_s, X, R)
        return st._replace(
            X=X, R=R, X_s=X_s, R_s=R_s, omega=om,
            normR=normR, it=st.it + 1, step=jnp.zeros((), jnp.int32),
            resnorm_log=st.resnorm_log.at[st.it].set(normR),
        )

    def body(st):
        new = jax.lax.cond(st.step < s, k_step, reduction_step, st)
        if verbose:
            # live residual line (@printf parity); scalar-operand cond only
            live = (st.it < maxiter) & (st.normR >= st.tol)
            live_print(live, new.it, new.normR)
        return new

    return state0, body, lambda st: (st.it >= maxiter) | (st.normR < st.tol)


def _idrs_core(op, b, x0, Pl, P, reltol, abstol, s, maxiter, smoothing,
               initially_zero, verbose=False):
    state0, step, done = _idrs_prepare(
        op, b, x0, Pl, P, reltol, abstol, s, maxiter, smoothing,
        initially_zero, verbose
    )
    final = run_chunked(step, done, state0)
    X_out = final.X_s if smoothing else final.X
    return SolveResult(
        x=X_out,
        iters=final.it,
        converged=final.normR < final.tol,
        resnorm=final.normR,
        log={"resnorm": (final.resnorm_log, final.it)},
    )


_idrs_jit = jax.jit(
    with_highest_precision(_idrs_core), static_argnames=("s", "maxiter", "smoothing", "initially_zero", "verbose")
)


def idrs(
    A,
    b,
    *,
    s: int = 8,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    smoothing: bool = False,
    seed: int = 0,
    log: bool = False,
    verbose: bool = False,
):
    """Solve A x = b with IDR(s) (~ idrs/idrs!, src/idrs.jl:11-64)."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    n = op.shape[1]
    maxiter = int(maxiter if maxiter is not None else n)
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    P = random_like(jax.random.PRNGKey(seed), (int(s), n), dtype)
    res = _idrs_jit(
        op, b, jnp.asarray(x0), Pl, P, reltol_, abstol_, int(s), maxiter,
        bool(smoothing), initially_zero, verbose=bool(verbose),
    )
    if not log:
        return res.x
    history = make_history(res, mv_per_iter=1.0, mv_initial=0 if initially_zero else 1)
    history["abstol"] = float(abstol_)
    history["reltol"] = float(reltol_)
    return res.x, history


def idrs_iterator(
    A,
    b,
    *,
    s: int = 8,
    x0=None,
    Pl=None,
    abstol: float | None = None,
    reltol: float | None = None,
    maxiter: int | None = None,
    smoothing: bool = False,
    seed: int = 0,
) -> SolverIterator:
    """Eager IDR(s) iterator (~ ``idrs_iterable!``, src/idrs.jl:103-160):
    yields the residual norm each (inner or dimension-reduction) step."""
    op = as_operator(A, b)
    Pl = as_preconditioner(Pl)
    b = jnp.asarray(b)
    n = op.shape[1]
    maxiter = int(maxiter if maxiter is not None else n)
    initially_zero = x0 is None
    dtype = solve_dtype(op.dtype, b.dtype)
    if x0 is None:
        x0 = jnp.zeros(n, dtype=dtype)
    reltol_, abstol_ = resolve_tols(dtype, reltol, abstol)
    P = random_like(jax.random.PRNGKey(seed), (int(s), n), dtype)
    state0, step, done = _idrs_prepare(
        op, b, jnp.asarray(x0), Pl, P, reltol_, abstol_, int(s), maxiter,
        bool(smoothing), initially_zero,
    )
    return SolverIterator(
        state0, step=step, done=done, extract=lambda st: st.normR,
        # with smoothing the yielded normR is norm(R_s), so .x must expose
        # the matching smoothed iterate X_s (what _idrs_core returns too)
        get_x=(lambda st: st.X_s) if smoothing else None,
    )
