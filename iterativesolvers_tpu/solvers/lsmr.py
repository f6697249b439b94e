"""LSMR — least squares via Golub-Kahan bidiagonalization, MINRES flavor.

TPU-native re-design of the reference ``src/lsmr.jl`` (Fong & Saunders;
equivalent to MINRES on the normal equations, src/lsmr.jl:18-21).  The
double-rotation scheme (Qhat eliminating the regularization λ, Q turning B to
R, Qbar to Rbar, Qtilde for the ‖r‖ recurrences — src/lsmr.jl:178-233) runs
as scalar carry state inside one ``lax.while_loop``.

istop protocol identical in structure to LSQR (src/lsmr.jl:274-281), but the
reference *breaks* at the first satisfied test (priority 7 down to 1) and
defines convergence as ``istop ∉ (3, 6, 7)`` (src/lsmr.jl:285).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.linear_operator import as_operator
from ..utils.dtypes import real_dtype, solve_dtype
from .common import SolveResult, make_history, norm, run_chunked, with_highest_precision, safe_inv as _safe_inv

__all__ = ["lsmr"]


class LSMRState(NamedTuple):
    x: jax.Array
    u: jax.Array
    v: jax.Array
    h: jax.Array
    hbar: jax.Array
    alpha: jax.Array
    alphabar: jax.Array
    zeta: jax.Array
    zetabar: jax.Array
    rho: jax.Array
    rhobar: jax.Array
    cbar: jax.Array
    sbar: jax.Array
    # ||r|| estimation (src/lsmr.jl:137-144)
    betadd: jax.Array
    betad: jax.Array
    rhodold: jax.Array
    tautildeold: jax.Array
    thetatilde: jax.Array
    d: jax.Array
    # ||A||, cond(A) estimation (src/lsmr.jl:146-150)
    normA2: jax.Array
    maxrbar: jax.Array
    minrbar: jax.Array
    iter: jax.Array
    istop: jax.Array
    mtvps: jax.Array
    normb: jax.Array
    test1_log: jax.Array   # :rnorm
    test2_log: jax.Array   # :anorm
    test3_log: jax.Array   # :cnorm


def _lsmr_step(op, lam, atol, btol, ctol, maxiter, s: LSMRState, verbose=False):
    rt = s.alpha.dtype
    it = s.iter + 1

    # bidiagonalization step (src/lsmr.jl:166-176)
    u = op.mv(s.v) - s.alpha * s.u
    beta = norm(u)
    bpos = beta > 0
    u = u * _safe_inv(beta)
    v_new = op.rmv(u) - beta * s.v
    alpha_new = norm(v_new)
    v = jnp.where(bpos, v_new * _safe_inv(alpha_new), s.v)
    alpha = jnp.where(bpos, alpha_new, s.alpha)
    mtvps = s.mtvps + jnp.where(bpos, 1, 0)

    # Qhat: eliminate lambda (src/lsmr.jl:178-181)
    alphahat = jnp.hypot(s.alphabar, lam)
    chat = s.alphabar / alphahat
    shat = lam / alphahat

    # Q: B -> R (src/lsmr.jl:183-189)
    rhoold = s.rho
    rho = jnp.hypot(alphahat, beta)
    c = alphahat / rho
    sn = beta / rho
    thetanew = sn * alpha
    alphabar = c * alpha

    # Qbar: R^T -> Rbar (src/lsmr.jl:191-200)
    rhobarold = s.rhobar
    zetaold = s.zeta
    thetabar = s.sbar * rho
    rhotemp = s.cbar * rho
    rhobar = jnp.hypot(s.cbar * rho, thetanew)
    cbar = s.cbar * rho / rhobar
    sbar = thetanew / rhobar
    zeta = cbar * s.zetabar
    zetabar = -sbar * s.zetabar

    # update h, hbar, x (src/lsmr.jl:202-205)
    hbar = s.hbar * (-thetabar * rho / (rhoold * rhobarold)) + s.h
    x = s.x + (zeta / (rho * rhobar)) * hbar
    h = s.h * (-thetanew / rho) + v

    # ||r|| estimate (src/lsmr.jl:207-233)
    betaacute = chat * s.betadd
    betacheck = -shat * s.betadd
    betahat = c * betaacute
    betadd = -sn * betaacute

    thetatildeold = s.thetatilde
    rhotildeold = jnp.hypot(s.rhodold, thetabar)
    ctildeold = s.rhodold / rhotildeold
    stildeold = thetabar / rhotildeold
    thetatilde = stildeold * rhobar
    rhodold = ctildeold * rhobar
    betad = -stildeold * s.betad + ctildeold * betahat

    tautildeold = (zetaold - thetatildeold * s.tautildeold) / rhotildeold
    taud = (zeta - thetatilde * tautildeold) / rhodold
    d = s.d + betacheck**2
    normr = jnp.sqrt(d + (betad - taud) ** 2 + betadd**2)

    # ||A||, cond(A) (src/lsmr.jl:235-245)
    normA2 = s.normA2 + beta**2
    normA = jnp.sqrt(normA2)
    normA2 = normA2 + alpha**2
    maxrbar = jnp.maximum(s.maxrbar, rhobarold)
    minrbar = jnp.where(it > 1, jnp.minimum(s.minrbar, rhobarold), s.minrbar)
    condA = jnp.maximum(maxrbar, rhotemp) / jnp.minimum(minrbar, rhotemp)

    # convergence tests (src/lsmr.jl:247-281)
    normAr = jnp.abs(zetabar)
    normx = norm(x)
    test1 = normr / s.normb
    test2 = normAr / (normA * normr)
    test3 = 1.0 / condA
    t1 = test1 / (1 + normA * normx / s.normb)
    rtol = btol + atol * normA * normx / s.normb

    one = jnp.asarray(1.0, rt)
    istop = jnp.zeros((), jnp.int32)
    # the reference breaks at the FIRST satisfied test in order 7,6,...,1
    # (src/lsmr.jl:274-281), so higher codes take priority — apply low-to-high
    # so later (higher) writes win.  (LSQR is the opposite: no breaks, so its
    # later/lower assignments win, src/lsqr.jl:256-269.)
    istop = jnp.where(test1 <= rtol, 1, istop)
    istop = jnp.where(test2 <= atol, 2, istop)
    istop = jnp.where(test3 <= ctol, 3, istop)
    istop = jnp.where(one + t1 <= one, 4, istop)
    istop = jnp.where(one + test2 <= one, 5, istop)
    istop = jnp.where(one + test3 <= one, 6, istop)
    istop = jnp.where(it >= maxiter, 7, istop)

    if verbose:
        # gate on liveness (s was not yet stopped) so run_chunked's frozen
        # re-steps don't duplicate the final line
        jax.lax.cond(
            (s.iter < maxiter) & (s.istop == 0),
            lambda i, t2, t3, t1: jax.debug.print(
                "{i:3d}\t{t2:.2e}\t{t3:.2e}\t{t1:.2e}",
                i=i, t2=t2, t3=t3, t1=t1,
            ),
            lambda i, t2, t3, t1: None,
            it, test2, test3, test1,
        )

    k = s.iter
    return LSMRState(
        x=x, u=u, v=v, h=h, hbar=hbar,
        alpha=alpha, alphabar=alphabar,
        zeta=zeta, zetabar=zetabar, rho=rho, rhobar=rhobar,
        cbar=cbar, sbar=sbar,
        betadd=betadd, betad=betad, rhodold=rhodold,
        tautildeold=tautildeold, thetatilde=thetatilde, d=d,
        normA2=normA2, maxrbar=maxrbar, minrbar=minrbar,
        iter=it, istop=istop, mtvps=mtvps, normb=s.normb,
        test1_log=s.test1_log.at[k].set(test1),
        test2_log=s.test2_log.at[k].set(test2),
        test3_log=s.test3_log.at[k].set(test3),
    )


@partial(jax.jit, static_argnames=("maxiter", "verbose"))
@with_highest_precision
def _lsmr_solve(op, b, x0, lam, atol, btol, ctol, maxiter, verbose):
    dtype = solve_dtype(op.dtype, b.dtype)
    rt = real_dtype(dtype)
    x0 = x0.astype(dtype)

    # beta*u = b - A x0 ; alpha*v = A'u (src/lsmr.jl:113-120)
    u = b.astype(dtype) - op.mv(x0)
    beta = norm(u)
    u = u * _safe_inv(beta)
    v = op.rmv(u)
    alpha = norm(v)
    v = v * _safe_inv(alpha)
    normAr0 = alpha * beta

    L = max(maxiter, 1)
    zero = jnp.zeros((), rt)
    one = jnp.ones((), rt)
    state0 = LSMRState(
        x=x0, u=u, v=v, h=v, hbar=jnp.zeros_like(x0),
        alpha=alpha, alphabar=alpha,
        zeta=zero, zetabar=alpha * beta,
        rho=one, rhobar=one, cbar=one, sbar=zero,
        betadd=beta, betad=zero, rhodold=one,
        tautildeold=zero, thetatilde=zero, d=zero,
        normA2=alpha**2, maxrbar=zero,
        minrbar=jnp.asarray(np.finfo(rt).max, rt),  # ~ 1e100 (src/lsmr.jl:150)
        iter=jnp.zeros((), jnp.int32),
        istop=jnp.zeros((), jnp.int32),
        mtvps=jnp.ones((), jnp.int32),
        normb=beta,
        test1_log=jnp.zeros((L,), rt),
        test2_log=jnp.zeros((L,), rt),
        test3_log=jnp.zeros((L,), rt),
    )

    def cond(s):
        return (s.iter < maxiter) & (s.istop == 0) & (normAr0 != 0)

    final = run_chunked(
        lambda s: _lsmr_step(op, lam, atol, btol, ctol, maxiter, s, verbose),
        lambda s: ~cond(s),
        state0,
    )
    # converged = istop not in (3, 6, 7) (src/lsmr.jl:285)
    converged = (final.istop != 3) & (final.istop != 6) & (final.istop != 7)
    return SolveResult(
        x=final.x,
        iters=final.iter,
        converged=converged,
        resnorm=final.test1_log[jnp.maximum(final.iter - 1, 0)] * final.normb,
        log={
            "rnorm": (final.test1_log, final.iter),
            "anorm": (final.test2_log, final.iter),
            "cnorm": (final.test3_log, final.iter),
        },
    ), final.istop, final.mtvps


def lsmr(
    A,
    b,
    *,
    x0=None,
    lam: float = 0.0,
    atol: float = 1e-6,
    btol: float = 1e-6,
    conlim: float = 1e8,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
):
    """Solve min ‖Ax − b‖² + λ²‖x‖² (~ ``lsmr(!)``, src/lsmr.jl:1-94).

    Defaults mirror the reference (src/lsmr.jl:60-67): ``atol=btol=1e-6``,
    ``conlim=1e8``, ``maxiter = max(m, n)`` (``maximum(size(A))``).
    """
    op = as_operator(A, b)
    b = jnp.asarray(b)
    m, n = op.shape
    maxiter = int(maxiter if maxiter is not None else max(m, n))
    dtype = solve_dtype(op.dtype, b.dtype)
    rt = real_dtype(dtype)
    if x0 is None:
        x0 = jnp.zeros(n, dtype)
    ctol = 1.0 / conlim if conlim > 0 else 0.0
    res, istop, mtvps = _lsmr_solve(
        op, b, jnp.asarray(x0),
        jnp.asarray(lam, rt), jnp.asarray(atol, rt), jnp.asarray(btol, rt),
        jnp.asarray(ctol, rt), maxiter, verbose,
    )
    if not log:
        return res.x
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=1,
        extra_counters={"mtvps": mtvps},
    )
    history["atol"] = float(atol)
    history["btol"] = float(btol)
    history["ctol"] = float(ctol)
    history["istop"] = int(istop)
    return res.x, history
