"""LSQR — least squares via Golub-Kahan bidiagonalization.

TPU-native re-design of the reference ``src/lsqr.jl`` (Paige & Saunders;
algorithmically equivalent to CG on the damped normal equations,
src/lsqr.jl:13-19).  The sequential loop with its 7-way ``istop`` protocol
(src/lsqr.jl:256-269) becomes a ``lax.while_loop`` whose carry holds the
bidiagonalization vectors (u, v, w), the rotation scalars, and the norm
estimators (Anorm/Acond/xnorm/rnorm/Arnorm, src/lsqr.jl:222-254).

istop codes (all computed each iteration; highest-priority last, matching the
reference's overwrite order src/lsqr.jl:256-269):
    7  itn >= maxiter
    6  1 + 1/Acond <= 1         (cond limit at machine precision)
    5  1 + test2  <= 1          (Arnorm test at machine precision)
    4  1 + t1     <= 1          (residual test at machine precision)
    3  1/Acond <= ctol
    2  Arnorm/(Anorm*rnorm) <= atol
    1  rnorm/bnorm <= btol + atol*Anorm*xnorm/bnorm

``isconverged`` is ``istop > 0`` exactly as the reference sets it
(src/lsqr.jl:271: ``setconv(log, istop > 0)``).

Parity note: the reference accumulates ``ddnorm += norm(w/rho)`` *unsquared*
(src/lsqr.jl:207 — a deviation from Paige-Saunders' ``+= norm^2``); we
replicate that so Acond estimates match.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.linear_operator import as_operator
from ..utils.dtypes import eps, real_dtype, solve_dtype
from .common import SolveResult, make_history, norm, run_chunked, with_highest_precision, safe_inv as _safe_inv

__all__ = ["lsqr"]


class LSQRState(NamedTuple):
    x: jax.Array
    u: jax.Array
    v: jax.Array
    w: jax.Array
    alpha: jax.Array
    beta: jax.Array
    rhobar: jax.Array
    phibar: jax.Array
    anorm: jax.Array
    ddnorm: jax.Array
    res2: jax.Array
    xxnorm: jax.Array
    z: jax.Array
    sn2: jax.Array
    cs2: jax.Array
    itn: jax.Array
    istop: jax.Array
    mtvps: jax.Array
    bnorm: jax.Array
    rnorm_true_log: jax.Array   # :resnorm — r1norm (‖b − Ax‖ estimate)
    test1_log: jax.Array        # :rnorm  — rnorm/bnorm
    test2_log: jax.Array        # :anorm  — Arnorm/(Anorm*rnorm)
    test3_log: jax.Array        # :cnorm  — 1/Acond


def _lsqr_step(op, damp, atol, btol, ctol, maxiter, s: LSQRState, verbose=False):
    rt = s.anorm.dtype
    dampsq = damp * damp
    itn = s.itn + 1

    # bidiagonalization: beta*u = A v - alpha*u ; alpha*v = A'u - beta*v
    u = op.mv(s.v) - s.alpha * s.u
    beta = norm(u)
    bpos = beta > 0
    u = u * _safe_inv(beta)
    anorm = jnp.where(
        bpos,
        jnp.sqrt(s.anorm**2 + s.alpha**2 + beta**2 + dampsq),
        s.anorm,
    )
    v_new = op.rmv(u) - beta * s.v
    alpha_new = norm(v_new)
    v_new = v_new * _safe_inv(alpha_new)
    v = jnp.where(bpos, v_new, s.v)
    alpha = jnp.where(bpos, alpha_new, s.alpha)
    mtvps = s.mtvps + jnp.where(bpos, 1, 0)

    # rotation eliminating damp (src/lsqr.jl:180-186)
    rhobar1 = jnp.sqrt(s.rhobar**2 + dampsq)
    cs1 = s.rhobar / rhobar1
    sn1 = damp / rhobar1
    psi = sn1 * s.phibar
    phibar = cs1 * s.phibar

    # rotation eliminating the subdiagonal beta (src/lsqr.jl:188-197)
    rho = jnp.sqrt(rhobar1**2 + beta**2)
    cs = rhobar1 / rho
    sn = beta / rho
    theta = sn * alpha
    rhobar = -cs * alpha
    phi = cs * phibar
    phibar = sn * phibar
    tau = sn * phi

    # update x, w (src/lsqr.jl:199-207)
    x = s.x + (phi / rho) * s.w
    w = (-theta / rho) * s.w + v
    ddnorm = s.ddnorm + norm(w / rho)  # reference parity: unsquared

    # right rotation for ||x|| estimate (src/lsqr.jl:209-221)
    gambar = -s.cs2 * rho
    rhs = phi - (s.sn2 * rho) * s.z
    zbar = rhs / gambar
    xnorm = jnp.sqrt(s.xxnorm + zbar**2)
    gamma = jnp.sqrt(gambar**2 + theta**2)
    cs2 = gambar / gamma
    sn2 = theta / gamma
    z = rhs / gamma
    xxnorm = s.xxnorm + z**2

    # norm estimates (src/lsqr.jl:223-254)
    acond = anorm * jnp.sqrt(ddnorm)
    res2 = s.res2 + psi**2
    rnorm = jnp.sqrt(phibar**2 + res2)
    arnorm = alpha * jnp.abs(tau)
    r1sq = rnorm**2 - dampsq * xxnorm
    r1norm = jnp.sign(r1sq) * jnp.sqrt(jnp.abs(r1sq))

    test1 = rnorm / s.bnorm
    test2 = arnorm / (anorm * rnorm)
    test3 = 1.0 / acond
    t1 = test1 / (1 + anorm * xnorm / s.bnorm)
    rtol = btol + atol * anorm * xnorm / s.bnorm

    one = jnp.asarray(1.0, rt)
    istop = jnp.zeros((), jnp.int32)
    istop = jnp.where(itn >= maxiter, 7, istop)
    istop = jnp.where(one + test3 <= one, 6, istop)
    istop = jnp.where(one + test2 <= one, 5, istop)
    istop = jnp.where(one + t1 <= one, 4, istop)
    istop = jnp.where(test3 <= ctol, 3, istop)
    istop = jnp.where(test2 <= atol, 2, istop)
    istop = jnp.where(test1 <= rtol, 1, istop)

    if verbose:
        # gate on liveness (s was not yet stopped) so run_chunked's frozen
        # re-steps don't duplicate the final line
        jax.lax.cond(
            (s.itn < maxiter) & (s.istop == 0),
            lambda i, r, t2, t3, t1: jax.debug.print(
                "{i:3d}\t{r:.2e}\t{t2:.2e}\t{t3:.2e}\t{t1:.2e}",
                i=i, r=r, t2=t2, t3=t3, t1=t1,
            ),
            lambda i, r, t2, t3, t1: None,
            itn, r1norm, test2, test3, test1,
        )

    k = s.itn
    return LSQRState(
        x=x, u=u, v=v, w=w, alpha=alpha, beta=beta,
        rhobar=rhobar, phibar=phibar, anorm=anorm, ddnorm=ddnorm,
        res2=res2, xxnorm=xxnorm, z=z, sn2=sn2, cs2=cs2,
        itn=itn, istop=istop, mtvps=mtvps, bnorm=s.bnorm,
        rnorm_true_log=s.rnorm_true_log.at[k].set(r1norm),
        test1_log=s.test1_log.at[k].set(test1),
        test2_log=s.test2_log.at[k].set(test2),
        test3_log=s.test3_log.at[k].set(test3),
    )


@partial(jax.jit, static_argnames=("maxiter", "verbose"))
@with_highest_precision
def _lsqr_solve(op, b, x0, damp, atol, btol, ctol, maxiter, verbose):
    dtype = solve_dtype(op.dtype, b.dtype)
    rt = real_dtype(dtype)
    x0 = x0.astype(dtype)

    u = b.astype(dtype) - op.mv(x0)
    beta = norm(u)
    bpos = beta > 0
    u = u * _safe_inv(beta)
    v_new = op.rmv(u)
    alpha_new = norm(v_new)
    v = jnp.where(bpos, v_new * _safe_inv(alpha_new), x0)
    alpha = jnp.where(bpos, alpha_new, jnp.zeros((), rt))
    arnorm0 = alpha * beta

    L = max(maxiter, 1)
    state0 = LSQRState(
        x=x0, u=u, v=v, w=v,
        alpha=alpha, beta=beta,
        rhobar=alpha, phibar=beta,
        anorm=jnp.zeros((), rt), ddnorm=jnp.zeros((), rt),
        res2=jnp.zeros((), rt), xxnorm=jnp.zeros((), rt),
        z=jnp.zeros((), rt), sn2=jnp.zeros((), rt),
        cs2=-jnp.ones((), rt),
        itn=jnp.zeros((), jnp.int32),
        istop=jnp.zeros((), jnp.int32),
        mtvps=jnp.where(bpos, 1, 0).astype(jnp.int32),
        bnorm=beta,
        rnorm_true_log=jnp.zeros((L,), rt),
        test1_log=jnp.zeros((L,), rt),
        test2_log=jnp.zeros((L,), rt),
        test3_log=jnp.zeros((L,), rt),
    )

    def cond(s):
        # reference: while itn < maxiter & !isconverged; plus the
        # Arnorm == 0 early return (src/lsqr.jl:141-144)
        return (s.itn < maxiter) & (s.istop == 0) & (arnorm0 != 0)

    final = run_chunked(
        lambda s: _lsqr_step(op, damp, atol, btol, ctol, maxiter, s, verbose),
        lambda s: ~cond(s),
        state0,
    )
    return SolveResult(
        x=final.x,
        iters=final.itn,
        converged=final.istop > 0,
        resnorm=final.rnorm_true_log[jnp.maximum(final.itn - 1, 0)],
        log={
            "resnorm": (final.rnorm_true_log, final.itn),
            "rnorm": (final.test1_log, final.itn),
            "anorm": (final.test2_log, final.itn),
            "cnorm": (final.test3_log, final.itn),
        },
    ), final.istop, final.mtvps


def lsqr(
    A,
    b,
    *,
    x0=None,
    damp: float = 0.0,
    atol: float | None = None,
    btol: float | None = None,
    conlim: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
):
    """Solve min ‖Ax − b‖² + damp²‖x‖² (~ ``lsqr(!)``, src/lsqr.jl:1-98).

    Defaults follow the reference and scale with the solve dtype
    (src/lsqr.jl:90-93): ``atol = btol = sqrt(eps(real(T)))``,
    ``conlim = 1/sqrt(eps(real(T)))``, ``maxiter = max(m, n)``
    (``maximum(size(A))``) — so float32 operators get attainable
    tolerances and terminate via istop 1-2, not the machine-precision
    guards.

    Returns ``x`` or ``(x, ConvergenceHistory)``; the history carries
    ``istop`` and the :resnorm/:rnorm/:anorm/:cnorm series
    (src/lsqr.jl:70-77,240-254).
    """
    op = as_operator(A, b)
    b = jnp.asarray(b)
    m, n = op.shape
    maxiter = int(maxiter if maxiter is not None else max(m, n))
    dtype = solve_dtype(op.dtype, b.dtype)
    rt = real_dtype(dtype)
    sqrt_eps = float(np.sqrt(eps(dtype)))
    if atol is None:
        atol = sqrt_eps
    if btol is None:
        btol = sqrt_eps
    if conlim is None:
        conlim = 1.0 / sqrt_eps
    if x0 is None:
        x0 = jnp.zeros(n, dtype)
    ctol = 1.0 / conlim if conlim > 0 else 0.0
    res, istop, mtvps = _lsqr_solve(
        op, b, jnp.asarray(x0),
        jnp.asarray(damp, rt), jnp.asarray(atol, rt), jnp.asarray(btol, rt),
        jnp.asarray(ctol, rt), maxiter, verbose,
    )
    if not log:
        return res.x
    # the reference counts 1 mvp per iteration and mtvps for the A'u products
    # (src/lsqr.jl:130,152,167); the initial b - A*x is not counted.
    history = make_history(
        res, mv_per_iter=1.0, mv_initial=0,
        extra_counters={"mtvps": mtvps},
    )
    history["atol"] = float(atol)
    history["btol"] = float(btol)
    history["ctol"] = float(ctol)
    history["istop"] = int(istop)
    return res.x, history
