"""svdl — partial SVD via Golub-Kahan-Lanczos with thick restart.

TPU-native re-design of the reference ``src/svdl.jl``.  Key re-designs:

* The reference grows ``P``/``Q`` by ``hcat`` every GKL step
  (src/svdl.jl:579,605) — here the panels are **pre-allocated (m, k) /
  (n, k+1) buffers** updated in place under jit (SURVEY §7 explicitly calls
  this out); stale columns are zeroed so full-panel reorthogonalization
  against them is a no-op.
* The reference's ``BrokenArrowBidiagonal`` type (diag + arrow column,
  src/svdl.jl:19-69) becomes a small dense (k, k+1) matrix — its SVD is a
  k x k device ``jnp.linalg.svd``, so no custom structured type is needed.
* Reorthogonalization: the reference does double classical Gram-Schmidt
  gated by the 1/sqrt(2) ARPACK criterion (src/svdl.jl:565-577).  Here both
  CGS passes always run (two tall-skinny gemvs on the MXU — cheaper than a
  data-dependent branch under jit), on both left and right vectors.

Macro-iteration (~ svdl_method!, src/svdl.jl:177-247):
    build GKL factorization to k columns
    loop: F = svd(B); convergence check (Wilkinson / Rayleigh-Ritz bounds,
          src/svdl.jl:290-350); thick restart to l columns
          (src/svdl.jl:376-405); extend back to k columns (src/svdl.jl:542-609)

Convergence bounds (isconverged, src/svdl.jl:290-350):
    dsig_i  = beta * |U[end, i]|                      (Wilkinson simple bound)
    delta_i = min(dsig_i, dsig_i^2 / gap)  if 2*dsig_i <= gap   (Rayleigh-Ritz)
    conv_i  = delta_i < max(tol, reltol * sigma_1)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.linear_operator import as_operator
from ..utils.dtypes import real_dtype
from ..utils.history import ConvergenceHistory
from .common import norm, with_highest_precision

__all__ = ["svdl", "svdl_iterator", "PartialFactorization"]


class PartialFactorization(NamedTuple):
    """~ ``PartialFactorization{P,Q,B,beta}`` (src/svdl.jl:76-81), with the
    Lanczos panels stored TRANSPOSED (rows = Lanczos vectors): on TPU a
    (n, k) column panel with k << 128 lanes tiles as (8, 128) and every
    dynamic column access gathers across all tiles — row layout keeps panel
    reads/writes contiguous and reorthogonalization on the MXU.
    In column terms: ``A Q[:j] = B[:j, :j]' P`` and
    ``A' P = B' Q + beta * q_{k+1} e_k'``."""

    P: jax.Array      # (k, m) left Lanczos panel (rows are vectors)
    Q: jax.Array      # (k+1, n) right Lanczos panel (rows are vectors)
    B: jax.Array      # (k, k+1): square part + trailing-beta column
    beta: jax.Array   # coupling scalar == B[k-1, k]


def _reorth(panel, v):
    """Double classical Gram-Schmidt of v against the ROWS of panel
    (zeros for stale rows).  ~ src/svdl.jl:565-577."""
    v = v - jnp.tensordot(jnp.conj(panel) @ v, panel, axes=1)
    v = v - jnp.tensordot(jnp.conj(panel) @ v, panel, axes=1)
    return v


def _gkl_extend(op, P, Q, B, j0: int, k: int):
    """Run GKL steps j = j0 .. k-1 (~ extend!, src/svdl.jl:542-609).
    Assumes Q[:, :j0+1], P[:, :j0], B rows/cols < j0 are valid and columns
    >= j0 are zero.  Returns updated (P, Q, B, beta)."""

    def step(j, carry):
        P, Q, B = carry
        q_j = jax.lax.dynamic_slice_in_dim(Q, j, 1, axis=0)[0]
        # p = A q_j - B[:, j]' P  (B column j carries the arrow after restart)
        p = op.mv(q_j) - jnp.tensordot(B[:, j], P, axes=1)
        p = _reorth(P, p)
        alpha = norm(p)
        inv_a = jnp.where(alpha > 0, 1.0 / jnp.where(alpha > 0, alpha, 1.0), 0.0)
        p = p * inv_a
        P = jax.lax.dynamic_update_slice_in_dim(P, p[None, :], j, axis=0)
        B = B.at[j, j].set(alpha)
        # r = A' p_j - alpha q_j
        r = op.rmv(p) - alpha * q_j
        r = _reorth(Q, r)
        beta = norm(r)
        inv_b = jnp.where(beta > 0, 1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
        Q = jax.lax.dynamic_update_slice_in_dim(Q, (r * inv_b)[None, :], j + 1, axis=0)
        B = B.at[j, j + 1].set(beta)
        return P, Q, B

    P, Q, B = jax.lax.fori_loop(j0, k, step, (P, Q, B))
    return P, Q, B, B[k - 1, k]


@partial(jax.jit, static_argnames=("op_k",))
@with_highest_precision
def _build(op, v0, op_k: int):
    """Bootstrap the factorization from a start vector (~ build,
    src/svdl.jl:353-363)."""
    k = op_k
    m, n = op.shape
    dtype = v0.dtype
    q0 = v0 / norm(v0)
    P = jnp.zeros((k, m), dtype)
    Q = jnp.zeros((k + 1, n), dtype).at[0].set(q0)
    B = jnp.zeros((k, k + 1), dtype)
    P, Q, B, beta = _gkl_extend(op, P, Q, B, 0, k)
    return PartialFactorization(P, Q, B, beta)


def _restart_core(op, L: PartialFactorization, U, s, V, conv_mask,
                  op_l: int, op_k: int, dolock: bool):
    """Thick restart to l columns then extend back to k
    (~ thickrestart! + extend!, src/svdl.jl:376-405,542-609)."""
    l, k = op_l, op_k
    m, n = op.shape
    dtype = L.P.dtype
    Ul = U[:, :l].astype(dtype)
    Vl = V[:, :l].astype(dtype)
    # row-panel updates: (P Ul)^T = Ul^T P_rows, etc.
    Pn = jnp.zeros((k, m), dtype).at[:l].set(Ul.T @ L.P)
    Qn = (
        jnp.zeros((k + 1, n), dtype)
        .at[:l].set(Vl.T @ L.Q[:k])
        .at[l].set(L.Q[k])
    )
    # arrow: rho_i = beta * U[k-1, i]  (src/svdl.jl:382-390)
    rho = (L.beta * U[k - 1, :l].conj()).astype(dtype)
    if dolock:
        # locking zeroes converged arrow entries (src/svdl.jl:215-221)
        rho = jnp.where(conv_mask[:l], jnp.zeros_like(rho), rho)
    Bn = (
        jnp.zeros((k, k + 1), dtype)
        .at[jnp.arange(l), jnp.arange(l)].set(s[:l].astype(dtype))
        .at[:l, l].set(rho)
    )
    Pn, Qn, Bn, beta = _gkl_extend(op, Pn, Qn, Bn, l, k)
    return PartialFactorization(Pn, Qn, Bn, beta)


def _harmonic_restart_core(op, L: PartialFactorization, U0, s, V0,
                           op_l: int, op_k: int):
    """Thick restart with harmonic Ritz values, then extend back to k
    (~ harmonicrestart!, src/svdl.jl:424-494; Baglama & Reichel 2005).

    Real dtypes only (the reference constrains F::SVD{Tr,Tr} likewise).
    The restarted factorization has l+1 complete (P, Q) column pairs and an
    upper-triangular leading block in B; a GKL half-step then produces
    q_{l+2} so the standard extension loop can take over at j0 = l+1.
    """
    l, k = op_l, op_k
    m, n = op.shape
    dtype = L.P.dtype
    beta = L.beta
    Bsq = L.B[:, :k]

    rho = beta * U0[k - 1, :]                              # (k,)
    BA = jnp.concatenate([jnp.diag(s), rho[:, None]], axis=1)   # (k, k+1)
    U2, S2, V2t = jnp.linalg.svd(BA, full_matrices=True)
    V2 = V2t.T                                              # (k+1, k+1)
    Sig = S2[:l]
    Unew = U0 @ U2[:, :l]                                   # (k, l)

    M = jnp.zeros((k + 1, k + 1), dtype).at[:k, :k].set(V0).at[k, k].set(1.0)
    M = M @ V2                                              # (k+1, k+1)
    Mend = M[k, :l]                                         # (l,)

    e_last = jnp.zeros((k,), dtype).at[k - 1].set(1.0)
    # scaled residual r = beta * B^{-1} e_k; lstsq ~ the reference's pinv
    # fallback on singular B (src/svdl.jl:451-459)
    r = jnp.linalg.lstsq(Bsq, e_last[:, None])[0][:, 0] * beta
    Mm = M[:k, :] + r[:, None] * M[k:k + 1, :]              # (k, k+1)

    M2 = (
        jnp.zeros((k + 1, l + 1), dtype)
        .at[:k, :l].set(Mm[:, :l])
        .at[:k, l].set(-r)
        .at[k, l].set(1.0)
    )
    Qf, Rf = jnp.linalg.qr(M2, mode="reduced")              # (k+1,l+1), (l+1,l+1)
    Qn = Qf.T @ L.Q                                         # (l+1, n) rows
    Pn = Unew.T @ L.P                                       # (l, m) rows
    R = Rf[:, :l] + Rf[:, l:l + 1] @ Mend[None, :]          # (l+1, l)

    # continue the factorization: f = A q_{l+1} orthogonalized against P
    f = op.mv(Qn[l])
    f = f - jnp.tensordot(jnp.conj(Pn) @ f, Pn, axes=1)
    alpha = norm(f)
    inv_a = jnp.where(alpha > 0, 1.0 / jnp.where(alpha > 0, alpha, 1.0), 0.0)
    f = f * inv_a

    Bsmall = jnp.vstack([
        jnp.diag(Sig) @ jnp.triu(R.T),                      # (l, l+1)
        jnp.zeros((1, l + 1), dtype).at[0, l].set(alpha),
    ])                                                      # (l+1, l+1)

    P = jnp.zeros((k, m), dtype).at[:l].set(Pn).at[l].set(f)
    Q = jnp.zeros((k + 1, n), dtype).at[:l + 1].set(Qn)
    B = jnp.zeros((k, k + 1), dtype).at[:l + 1, :l + 1].set(Bsmall)

    # GKL half-step: q_{l+2} from A'f, then the standard loop at j0 = l+1
    g = op.rmv(f)
    g = _reorth(Q, g)
    beta2 = norm(g)
    inv_b = jnp.where(beta2 > 0, 1.0 / jnp.where(beta2 > 0, beta2, 1.0), 0.0)
    Q = Q.at[l + 1].set(g * inv_b)
    B = B.at[l, l + 1].set(beta2)

    P, Q, B, beta_out = _gkl_extend(op, P, Q, B, l + 1, k)
    return PartialFactorization(P, Q, B, beta_out)


def _ritz_and_bounds_core(L: PartialFactorization):
    """SVD of the projected matrix + error bounds (~ isconverged,
    src/svdl.jl:290-350).  Returns (U, s, V, dsig, delta)."""
    Bsq = L.B[:, : L.B.shape[0]]
    U, s, Vt = jnp.linalg.svd(Bsq, full_matrices=False)
    V = Vt.conj().T
    dsig = L.beta * jnp.abs(U[-1, :])
    # smallest empirical spectral gap
    diff = jnp.abs(s[:, None] - s[None, :])
    k = s.shape[0]
    diff = diff + jnp.eye(k, dtype=diff.dtype) * jnp.inf
    gap = jnp.min(diff)
    # gap == 0 (exactly coincident Ritz values, e.g. two locked ones) would
    # make dsig^2/gap NaN even when dsig == 0; fall back to the raw bound
    safe_gap = jnp.where(gap > 0, gap, 1)
    refined = jnp.minimum(dsig, dsig**2 / safe_gap)
    delta = jnp.where((2 * dsig <= gap) & (gap > 0), refined, dsig)
    return U, s, V, dsig, delta


class _SvdlState(NamedTuple):
    L: PartialFactorization
    U: jax.Array          # (k, k) left singular vecs of the projected matrix
    s: jax.Array          # (k,)
    V: jax.Array          # (k, k)
    conv: jax.Array       # (k,) per-value convergence at the last check
    converged: jax.Array  # bool scalar: leading nsv all converged
    it: jax.Array         # int32 macro-iterations completed
    ritz_log: jax.Array   # (maxiter, k)
    res_log: jax.Array    # (maxiter, k)
    beta_log: jax.Array   # (maxiter,)
    conv_log: jax.Array   # (maxiter,) bool
    B_log: jax.Array      # (maxiter, k, k+1) when log else (1, 1, 1) dummy


def _tree_select(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jax.lax.select(jnp.broadcast_to(pred, y.shape), x, y), a, b
    )


def _svdl_step(op, tol, reltol, nsv: int, op_j: int, op_k: int,
               dolock: bool, method: str, log: bool,
               S: _SvdlState) -> _SvdlState:
    """One macro-iteration: Ritz + bounds + convergence log + thick restart
    (the body of the reference's host loop, src/svdl.jl:188-226).  Shared by
    the fused ``_svdl_run`` while_loop and the eager ``svdl_iterator``."""
    j, k = op_j, op_k
    rt = real_dtype(S.L.P.dtype)
    U, s, V, dsig, delta = _ritz_and_bounds_core(S.L)
    thresh = jnp.maximum(tol, reltol * s[0])
    conv = delta < thresh
    all_conv = jnp.all(conv[:nsv])
    ritz_log = S.ritz_log.at[S.it].set(s)
    res_log = S.res_log.at[S.it].set(delta)
    beta_log = S.beta_log.at[S.it].set(jnp.abs(S.L.beta).astype(rt))
    conv_log = S.conv_log.at[S.it].set(all_conv)
    B_log = S.B_log.at[S.it].set(S.L.B) if log else S.B_log
    if method == "harmonic":
        L_new = _harmonic_restart_core(op, S.L, U, s, V, j, k)
    else:
        L_new = _restart_core(op, S.L, U, s, V, conv, j, k, dolock)
    # on the converging iteration the reference breaks before restarting
    L_out = _tree_select(all_conv, S.L, L_new)
    return _SvdlState(
        L=L_out, U=U, s=s, V=V, conv=conv, converged=all_conv,
        it=S.it + 1, ritz_log=ritz_log, res_log=res_log,
        beta_log=beta_log, conv_log=conv_log, B_log=B_log,
    )


def _svdl_state0(L0, maxiter: int, log: bool) -> _SvdlState:
    rt = real_dtype(L0.P.dtype)
    mi = max(maxiter, 1)
    k_ = L0.B.shape[0]
    return _SvdlState(
        L=L0,
        U=jnp.zeros((k_, k_), L0.P.dtype),
        s=jnp.zeros((k_,), rt),
        V=jnp.zeros((k_, k_), L0.P.dtype),
        conv=jnp.zeros((k_,), bool),
        converged=jnp.zeros((), bool),
        it=jnp.zeros((), jnp.int32),
        ritz_log=jnp.zeros((mi, k_), rt),
        res_log=jnp.zeros((mi, k_), rt),
        beta_log=jnp.zeros((mi,), rt),
        conv_log=jnp.zeros((mi,), bool),
        B_log=jnp.zeros((mi, k_, k_ + 1), L0.B.dtype) if log
        else jnp.zeros((1, 1, 1), L0.B.dtype),
    )


@partial(jax.jit, static_argnames=("nsv", "op_j", "op_k", "dolock", "method",
                                   "maxiter", "log"))
@with_highest_precision
def _svdl_run(op, L0, tol, reltol, nsv: int, op_j: int, op_k: int,
              dolock: bool, method: str, maxiter: int, log: bool):
    """The whole restart loop as one device program (~ the reference's host
    loop src/svdl.jl:188-226, fused so the O(maxiter) jit dispatches and
    convergence-check syncs collapse into one while_loop)."""
    from .common import run_chunked

    step = partial(_svdl_step, op, tol, reltol, nsv, op_j, op_k, dolock,
                   method, log)

    def done(S: _SvdlState):
        return S.converged | (S.it >= maxiter)

    S0 = _svdl_state0(L0, maxiter, log)
    return run_chunked(step, done, S0, chunk=4)


def svdl(
    A,
    *,
    nsv: int = 6,
    k: Optional[int] = None,
    j: Optional[int] = None,
    v0=None,
    tol: float | None = None,
    reltol: float | None = None,
    maxiter: Optional[int] = None,
    method: str = "ritz",
    vecs: str = "none",
    dolock: bool = False,
    log: bool = False,
    key=None,
):
    """Largest ``nsv`` singular values (optionally vectors) of ``A``.

    Mirrors ``svdl`` (src/svdl.jl:157-171): ``k = 2*nsv`` subspace columns,
    restart rank ``j = nsv``, ``tol = reltol = sqrt(eps)``, ``maxiter =
    min(m, n)``, ``vecs in ('none', 'left', 'right', 'both')``.

    ``method='ritz'`` is the thick restart of Wu & Simon; ``'harmonic'``
    restarts with harmonic Ritz values (Baglama & Reichel,
    src/svdl.jl:424-494; real operators only).

    Returns ``(values, fact)`` for ``vecs='none'``, else
    ``((leftvecs, values, rightvecs_T), fact)``; append history when
    ``log=True``.
    """
    if method not in ("ritz", "harmonic"):
        raise ValueError(f"unknown restart method {method!r}")
    op = as_operator(A)
    if method == "harmonic" and np.issubdtype(np.dtype(op.dtype), np.complexfloating):
        raise ValueError(
            "harmonic restart supports real operators only "
            "(the reference constrains F::SVD{Tr,Tr}, src/svdl.jl:425-426)"
        )
    m, n = op.shape
    l = int(nsv)
    k = int(k if k is not None else 2 * l)
    j = int(j if j is not None else l)
    if k <= 1:
        raise ValueError("k must be > 1 (src/svdl.jl:184)")
    if k > min(m, n):
        raise ValueError("k must be <= min(size(A))")
    maxiter = int(maxiter if maxiter is not None else min(m, n))
    rt = real_dtype(op.dtype)
    if tol is None:
        tol = float(np.sqrt(np.finfo(rt).eps))
    if reltol is None:
        reltol = float(np.sqrt(np.finfo(rt).eps))
    if v0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, (n,), rt).astype(op.dtype)
    v0 = jnp.asarray(v0)

    L = _build(op, v0, k)
    rt_ = real_dtype(op.dtype)
    S = _svdl_run(
        op, L,
        jnp.asarray(tol, rt_), jnp.asarray(reltol, rt_),
        l, j, k, dolock, method, maxiter, log,
    )
    L, U, s, V = S.L, S.U, S.s, S.V
    iters = int(S.it)
    converged = bool(S.converged)

    values = s[:l]
    history = None
    if log:
        history = ConvergenceHistory(partial=not log)
        history.iters = iters
        history.isconverged = converged
        history["tol"] = tol
        history.data["ritz"] = np.asarray(S.ritz_log)[:iters]
        history.data["resnorm"] = np.asarray(S.res_log)[:iters]
        history.data["betas"] = np.asarray(S.beta_log)[:iters]
        history.data["conv"] = np.asarray(S.conv_log)[:iters]
        history.data["Bs"] = np.asarray(S.B_log)[:iters]  # ~ push!(log, :Bs) src/svdl.jl:212
        history.mvps = iters * (k - j) + k
        history.mtvps = iters * (k - j) + k

    if vecs == "none":
        out = (values, L)
    else:
        left = (U[:, :l].T @ L.P).T if vecs in ("left", "both") else None
        right = jnp.conj(V[:, :l].T @ L.Q[:k]) if vecs in ("right", "both") else None
        out = ((left, values, right), L)
    if log:
        return (*out, history)
    return out


def svdl_iterator(
    A,
    *,
    nsv: int = 6,
    k: Optional[int] = None,
    j: Optional[int] = None,
    v0=None,
    tol: float | None = None,
    reltol: float | None = None,
    maxiter: Optional[int] = None,
    method: str = "ritz",
    dolock: bool = False,
    key=None,
):
    """Eager macro-iteration stepper over svdl's restart loop (the step-wise
    control the reference's iterator docs promise for all solvers,
    docs/src/iterators.md:1-77; one ``next()`` = one Ritz + convergence
    check + thick restart, ~ one trip of the host loop src/svdl.jl:188-226).

    Yields the leading-``nsv`` max error bound after each macro-iteration;
    ``.state`` is a checkpoint (an ``_SvdlState`` pytree) that can be held,
    inspected (``.state.s`` = current Ritz values, ``.state.L`` = the
    partial factorization) or restored; ``.x`` is the current ``nsv``
    singular-value estimate vector.
    """
    from .common import SolverIterator

    if method not in ("ritz", "harmonic"):
        raise ValueError(f"unknown restart method {method!r}")
    op = as_operator(A)
    m, n = op.shape
    l = int(nsv)
    k = int(k if k is not None else 2 * l)
    j = int(j if j is not None else l)
    if k <= 1:
        raise ValueError("k must be > 1 (src/svdl.jl:184)")
    if k > min(m, n):
        raise ValueError("k must be <= min(size(A))")
    maxiter = int(maxiter if maxiter is not None else min(m, n))
    rt = real_dtype(op.dtype)
    if tol is None:
        tol = float(np.sqrt(np.finfo(rt).eps))
    if reltol is None:
        reltol = float(np.sqrt(np.finfo(rt).eps))
    if v0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, (n,), rt).astype(op.dtype)
    v0 = jnp.asarray(v0)

    L0 = _build(op, v0, k)
    state0 = _svdl_state0(L0, maxiter, log=True)
    tol_ = jnp.asarray(tol, rt)
    reltol_ = jnp.asarray(reltol, rt)
    step = jax.jit(with_highest_precision(partial(
        _svdl_step, op, tol_, reltol_, l, j, k, dolock, method, True)))

    def done(S):
        return bool(S.converged) or int(S.it) >= maxiter

    return SolverIterator(
        state0, step, done,
        extract=lambda S: jnp.max(S.res_log[S.it - 1, :l]),
        jit=False,
        get_x=lambda S: S.s[:l],
    )
