"""Simple eigensolvers: (shifted/inverse) power method.

TPU-native re-design of the reference ``src/simple.jl``: the mutable
``PowerMethodIterable`` (src/simple.jl:6-48) becomes a pure step under
``lax.while_loop``.  Per iteration (src/simple.jl:28-48):

    Ax = B x
    theta = <x, Ax>          (Rayleigh quotient)
    r = Ax - theta x;  residual = |r|
    x = Ax / |Ax|

Shift-and-invert (src/simple.jl:50-51,85-90): the user passes an operator B
with the action of ``(A - shift I)^{-1}``; the returned eigenvalue is
transformed back as ``shift + 1/theta`` (``shift + theta`` when not inverted).

Defaults mirror the reference: ``tol = eps(real(T)) * n^3``,
``maxiter = size(B, 2)`` (src/simple.jl:53,120); the allocating form starts
from a random complex unit vector (src/simple.jl:64-68) — here via
``jax.random`` with an explicit ``key`` (SURVEY §7 PRNG conventions).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.linear_operator import as_operator
from ..utils.dtypes import eps, real_dtype
from .common import SolveResult, SolverIterator, make_history, norm, vdot, run_chunked, with_highest_precision

__all__ = ["powm", "invpowm", "powm_iterator"]


class PowerState(NamedTuple):
    x: jax.Array
    theta: jax.Array
    residual: jax.Array
    k: jax.Array
    resnorm_log: jax.Array


def _power_init(x0, maxiter):
    dtype = x0.dtype
    rt = real_dtype(dtype)
    return PowerState(
        x=x0,
        theta=jnp.zeros((), dtype),
        residual=jnp.asarray(np.finfo(rt).max, rt),
        k=jnp.zeros((), jnp.int32),
        # done is ``k > maxiter`` (src/simple.jl:26) so up to maxiter+1 steps
        # run and the final residual lands at index maxiter
        resnorm_log=jnp.zeros((maxiter + 1,), rt),
    )


def _power_step(op, state: PowerState, verbose: bool = False,
                tol=None, maxiter=None) -> PowerState:
    Ax = op.mv(state.x)
    theta = vdot(state.x, Ax)
    r = Ax - theta * state.x
    residual = norm(r)
    x = Ax / norm(Ax)
    if verbose:
        # gate on liveness: run_chunked re-steps the frozen state until the
        # chunk boundary, which would duplicate the final verbose line
        live = (
            ~_power_done(state, tol, maxiter)
            if maxiter is not None else True
        )
        jax.lax.cond(
            live,
            lambda k, res: jax.debug.print("{k:3d}\t{res:.2e}", k=k, res=res),
            lambda k, res: None,
            state.k + 1, residual,
        )
    return PowerState(
        x=x,
        theta=theta,
        residual=residual,
        k=state.k + 1,
        resnorm_log=state.resnorm_log.at[state.k].set(residual),
    )


def _power_done(state: PowerState, tol, maxiter: int):
    # reference: done when iteration > maxiter || residual <= tol
    # (src/simple.jl:26); the residual is from the *previous* x.
    return (state.k > maxiter) | (state.residual <= tol)


@partial(jax.jit, static_argnames=("maxiter", "verbose"))
@with_highest_precision
def _power_solve(op, x0, tol, maxiter, verbose):
    final = run_chunked(
        lambda s: _power_step(op, s, verbose, tol, maxiter),
        lambda s: _power_done(s, tol, maxiter),
        _power_init(x0, maxiter),
    )
    return SolveResult(
        x=final.x,
        iters=final.k,
        converged=final.residual <= tol,
        resnorm=final.residual,
        log={"resnorm": (final.resnorm_log, final.k)},
    ), final.theta


def _default_x0(op, key):
    """Random complex unit start vector (src/simple.jl:64-68)."""
    rt = real_dtype(op.dtype)
    cdtype = jnp.result_type(rt, jnp.complex64)
    n = op.shape[0]
    x0 = jax.random.normal(key, (n,), rt) + 1j * jax.random.normal(
        jax.random.fold_in(key, 1), (n,), rt
    )
    x0 = x0.astype(cdtype)
    return x0 / norm(x0)


def powm(
    B,
    *,
    x0=None,
    shift=0.0,
    inverse: bool = False,
    tol: float | None = None,
    maxiter: int | None = None,
    log: bool = False,
    verbose: bool = False,
    key=None,
):
    """Approximate the dominant eigenpair of ``B`` by power iteration.

    Mirrors ``powm`` / ``powm!`` (src/simple.jl:58-68,113-169).  With
    ``inverse=True`` and ``shift=sigma``, ``B`` must act as
    ``(A - sigma I)^{-1}`` and the returned eigenvalue is an eigenvalue of A.

    Returns ``(lam, x)`` or ``(lam, x, history)`` when ``log=True``.
    """
    op = as_operator(B, x0 if x0 is not None else None)
    if x0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = _default_x0(op, key)
    x0 = jnp.asarray(x0)
    n = op.shape[1]
    if tol is None:
        tol = eps(op.dtype) * n**3
    maxiter = int(maxiter if maxiter is not None else n)
    res, theta = _power_solve(
        op, x0, jnp.asarray(tol, real_dtype(x0.dtype)), maxiter, verbose
    )
    lam = shift + (1.0 / theta if inverse else theta)
    if not log:
        return lam, res.x
    history = make_history(res, mv_per_iter=1.0, mv_initial=0)
    history["tol"] = float(tol)
    return lam, res.x, history


def invpowm(B, *, shift=0.0, **kwargs):
    """Inverse power iteration (~ ``invpowm(!)``, src/simple.jl:171-185):
    ``B`` must act as ``(A - shift I)^{-1}``; finds the eigenvalue of A
    closest to ``shift``."""
    return powm(B, shift=shift, inverse=True, **kwargs)


def powm_iterator(B, x0, *, tol: float | None = None, maxiter: int | None = None):
    """Eager power-method iterator (~ ``powm_iterable!``, src/simple.jl:53-55):
    yields the residual norm; ``.state.theta`` holds the Rayleigh quotient."""
    op = as_operator(B, x0)
    x0 = jnp.asarray(x0)
    n = op.shape[1]
    if tol is None:
        tol = eps(op.dtype) * n**3
    maxiter = int(maxiter if maxiter is not None else op.shape[0])
    tol_ = jnp.asarray(tol, real_dtype(x0.dtype))
    return SolverIterator(
        _power_init(x0, maxiter),
        step=lambda s: _power_step(op, s),
        done=lambda s: _power_done(s, tol_, maxiter),
        extract=lambda s: s.residual,
    )
