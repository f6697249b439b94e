"""LOBPCG — Locally Optimal Block Preconditioned Conjugate Gradient.

TPU-native re-design of the reference ``src/lobpcg.jl`` (itself derived from
SciPy's lobpcg).  Solves ``A X = lambda B X`` for the ``nev`` smallest or
largest eigenpairs, blocked.

Design differences from the reference, chosen for TPU/XLA:

* The reference soft-locks converged columns by compressing the active block
  (``update_active!``/``currentBlockSize``, src/lobpcg.jl:549-562) — a dynamic
  shape.  Here all blocks stay full-size (static shapes; converged columns
  keep iterating, which only costs flops in already-batched MXU gemms).
* The reference assembles a generalized 3k x 3k Gram problem and calls LAPACK
  ``eigen!(Hermitian, Hermitian)`` (``BlockGram``/``sub_problem!``,
  src/lobpcg.jl:244-338,607-627).  Here the search basis S = [X W P] is fully
  B-orthonormalized every iteration (CholQR, the reference's own primitive,
  src/lobpcg.jl:341-393), so the subproblem reduces to a plain device ``eigh``
  of S'AS — no generalized solve, better conditioning (the "ortho" LOBPCG
  variant).  Same subspace, same Ritz pairs in exact arithmetic.
* The 3-phase schedule (it=1 span{X,W}, it>=2 span{X,W,P},
  src/lobpcg.jl:692-749) is realized by peeling the first iteration out of
  the ``lax.while_loop`` instead of branching on iteration count inside it.

Per iteration: 2 block SpMMs (A@W, B@W) + ~12 tall-skinny gemms — all MXU
work; the k x k and 3k x 3k factorizations run on device via ``jnp.linalg``.

All panels are stored with VECTORS AS ROWS, (k, n) — a (n, k) column panel
pads its minor dimension to the 128-lane TPU tile, an 8-32x HBM bloat for
typical block sizes (CLAUDE.md layout rule).  Gram matrices contract the
minor dim via einsum (no transposed copies); SpMMs go through the
operators' ``mv_rows``; the public API keeps the reference's (n, k)
column convention at the boundary.

Constraints (deflation against given Y, ~ ``Constraint``,
src/lobpcg.jl:144-224) B-project the search directions out of span(Y);
``nev > blocksize`` accumulates converged pairs in an outer host loop exactly
like the reference (src/lobpcg.jl:928-961).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.linear_operator import as_operator
from ..operators.preconditioners import as_preconditioner
from ..utils.dtypes import real_dtype
from ..utils.history import ConvergenceHistory

__all__ = ["lobpcg", "lobpcg_iterator", "LOBPCGResults", "default_tolerance"]


def default_tolerance(dtype) -> float:
    """``eps(real(T))^(3/10)`` (src/lobpcg.jl:751)."""
    return float(np.finfo(real_dtype(dtype)).eps ** 0.3)


class LOBPCGResults(NamedTuple):
    """~ ``LOBPCGResults`` (src/lobpcg.jl:36-64)."""

    lam: jax.Array             # (nev,) eigenvalues
    X: jax.Array               # (n, nev) eigenvectors
    tolerance: float
    residual_norms: jax.Array  # (nev,)
    iterations: int            # total across nev>blocksize batches
    maxiter: int
    converged: bool
    history: Optional[ConvergenceHistory] = None
    # per-batch iteration counts, ~ the reference's ``iterations`` vector
    # (one entry per nev>blocksize batch, src/lobpcg.jl:71,86)
    batch_iterations: tuple = ()


# ---------------------------------------------------------------------------
# B-orthonormalization primitives (CholQR, ~ src/lobpcg.jl:341-393)
# ---------------------------------------------------------------------------


def _gram(Vr, Wr):
    """(k, k) Gram G[i, j] = <v_i, w_j> of two row panels (vectors as rows,
    CLAUDE.md layout rule: a (n, k) column panel pads its minor dim to the
    128-lane tile on TPU).  einsum contracts the minor dim directly — no
    transposed copy is materialized."""
    return jnp.einsum("in,jn->ij", jnp.conj(Vr), Wr)


def _chol_factor(Vr, BVr):
    """Lower Cholesky factor of the (jittered, Hermitized) B-gram V'BV."""
    G = _gram(Vr, BVr)
    G = 0.5 * (G + G.conj().T)
    eps = jnp.finfo(real_dtype(Vr.dtype)).eps
    jitter = 10.0 * eps * jnp.abs(jnp.trace(G)) / G.shape[1] + jnp.finfo(
        real_dtype(Vr.dtype)
    ).tiny
    G = G + jitter * jnp.eye(G.shape[0], dtype=G.dtype)
    return jnp.linalg.cholesky(G)


def _orthonormalize_masked(Vr, BVr, *images):
    """B-orthonormalize (V, BV, images...) by vector-scaled CholQR, zeroing
    vectors that are numerically dependent (the static-shape analogue of the
    reference's dynamic block compression, src/lobpcg.jl:549-562).  All
    panels are (k, n) rows.

    Returns ``(V, BV, *images, alive)`` where ``alive`` is a boolean row
    mask.  Dead rows are exactly zero, so they decouple *exactly* in any
    downstream Gram matrix — no ill-conditioned directions leak into the
    Rayleigh-Ritz basis (critical in f32).
    """
    rt = real_dtype(Vr.dtype)
    eps = jnp.finfo(rt).eps
    # scale vectors to unit B-norm so Cholesky diag measures independence
    bn = jnp.sqrt(jnp.maximum(jnp.real(jnp.sum(jnp.conj(Vr) * BVr, axis=1)), 0.0))
    ref = jnp.maximum(jnp.max(bn), jnp.finfo(rt).tiny)
    nonzero = bn > (eps * ref)
    scale = jnp.where(nonzero, 1.0 / jnp.where(nonzero, bn, 1.0), 0.0)
    Vr = Vr * scale[:, None]
    BVr = BVr * scale[:, None]
    images = tuple(M * scale[:, None] for M in images)
    R = _chol_factor(Vr, BVr)
    # diag(R) in (0, 1]: sin of the angle to the span of previous vectors
    alive = nonzero & (jnp.real(jnp.diagonal(R)) > 10.0 * jnp.sqrt(eps))
    mask = alive.astype(Vr.dtype)[:, None]
    outs = _apply_rinv(R, Vr, BVr, *images)
    return tuple(o * mask for o in outs) + (alive,)


def _apply_rinv(R, *mats):
    """Apply the CholQR basis transform V <- V R^{-H} in row layout:
    Vr_new = conj(R)^{-1} Vr (solve conj(R) X = M, lower-triangular left
    side).  Because the transform acts on the vectors, the A/B images of a
    block transform the same way — pass them together to keep (V, AV, BV)
    consistent."""
    out = tuple(
        jax.lax.linalg.triangular_solve(
            R, M, left_side=True, lower=True, conjugate_a=True,
            transpose_a=False,
        )
        for M in mats
    )
    return out if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# Core run
# ---------------------------------------------------------------------------


class _LState(NamedTuple):
    X: jax.Array
    AX: jax.Array
    BX: jax.Array
    P: jax.Array
    AP: jax.Array
    BP: jax.Array
    lam: jax.Array
    resnorms: jax.Array
    it: jax.Array
    resnorm_log: jax.Array  # (maxiter, k)


def _rayleigh_ritz(G, k, largest: bool, alive=None):
    """k extremal eigenpairs of the (m, m) Hermitian projected operator
    (~ sub_problem!, src/lobpcg.jl:607-627).

    ``alive`` marks valid basis coordinates; dead coordinates correspond to
    exactly-zero basis columns, whose (exactly decoupled) spurious zero
    eigenpairs must not be selected.  A Ritz pair is valid iff its eigvec
    weight on alive coordinates exceeds 1/2 (exact split up to degeneracy)."""
    w, C = jnp.linalg.eigh(G)  # ascending
    if alive is not None:
        weight = jnp.sum(alive[:, None] * jnp.abs(C) ** 2, axis=0)
        ok = weight > 0.5
        big = jnp.asarray(np.finfo(w.dtype).max, w.dtype)
        w = jnp.where(ok, w, -big if largest else big)
        order = jnp.argsort(-w if largest else w)
        idx = order[:k]
        return w[idx], C[:, idx]
    if largest:
        return w[::-1][:k], C[:, ::-1][:, :k]
    return w[:k], C[:, :k]


from .common import with_highest_precision as _with_highest_precision  # noqa: E402


def _bmv(opB, Vr):
    return opB.mv_rows(Vr) if opB is not None else Vr


def _deflate(Yr, BYr, Vr):
    """B-project span(Y) out of the row panel: V - Y (BY^H V) in row layout
    is Vr - (Vr conj(BYr)^T) Yr."""
    if Yr is None:
        return Vr
    return Vr - jnp.einsum("kn,mn->km", Vr, jnp.conj(BYr)) @ Yr


def _project_out(Vr, Xr, BXr):
    """Vr minus its B-projection onto the rows of Xr (assumed B-orthonormal
    against BXr): V - X (BX^H V) in row layout."""
    return Vr - jnp.einsum("kn,jn->kj", Vr, jnp.conj(BXr)) @ Xr


def _ritz_and_split(Sbr, ASbr, BSbr, alive, k, largest):
    """Rayleigh-Ritz on a B-orthonormal (possibly row-masked) basis;
    return new (X, AX, BX) and the B-orthonormalized direction block
    (P, AP, BP) from the W/P coefficients only (~ update_X_P!,
    src/lobpcg.jl:629-690).  All panels (rows = vectors)."""
    G = _gram(Sbr, ASbr)
    G = 0.5 * (G + G.conj().T)
    lam, C = _rayleigh_ritz(G, k, largest, alive=alive)
    # column update X = Sb C is the row update Xr = C^T Sbr
    Ct = C.T
    X, AX, BX = Ct @ Sbr, Ct @ ASbr, Ct @ BSbr
    # restore exact unit B-norm (selected pairs can carry a tiny dead-
    # coordinate weight in degenerate clusters)
    xn = jnp.sqrt(jnp.maximum(jnp.real(jnp.sum(jnp.conj(X) * BX, axis=1)), 0.0))
    s = jnp.where(xn > 0, 1.0 / jnp.where(xn > 0, xn, 1.0), 0.0)[:, None]
    X, AX, BX = X * s, AX * s, BX * s
    Cpt = C[k:, :].T
    P = Cpt @ Sbr[k:]
    AP = Cpt @ ASbr[k:]
    BP = Cpt @ BSbr[k:]
    P, BP, AP, _ = _orthonormalize_masked(P, BP, AP)
    return X, AX, BX, P, AP, BP, lam


def _make_w(opA, opB, prec, Yr, BYr, S, extra_proj=None):
    R_blk = S.AX - S.BX * S.lam[:, None]
    resn = jnp.linalg.norm(R_blk, axis=1)
    W = prec.ldiv_rows(R_blk)
    W = _deflate(Yr, BYr, W)
    W = _project_out(W, S.X, S.BX)
    if extra_proj is not None:
        Pb, BPb = extra_proj
        W = _project_out(W, Pb, BPb)
    BW = _bmv(opB, W)
    W, BW, alive_w = _orthonormalize_masked(W, BW)
    AW = opA.mv_rows(W)
    return W, AW, BW, alive_w, resn


@partial(jax.jit, static_argnames=("largest", "maxiter"))
@_with_highest_precision
def _lobpcg_init(opA, opB, prec, Y, BY, X0r, largest, maxiter):
    # all panels (k, n): vectors as rows (CLAUDE.md layout rule)
    k = X0r.shape[0]
    X = _deflate(Y, BY, X0r)
    BX = _bmv(opB, X)
    X, BX, _ = _orthonormalize_masked(X, BX)
    AX = opA.mv_rows(X)
    G = _gram(X, AX)
    G = 0.5 * (G + G.conj().T)
    lam, C = _rayleigh_ritz(G, k, largest)
    Ct = C.T
    X, AX, BX = Ct @ X, Ct @ AX, Ct @ BX
    rt = real_dtype(X.dtype)
    return _LState(
        X=X, AX=AX, BX=BX,
        P=jnp.zeros_like(X), AP=jnp.zeros_like(X), BP=jnp.zeros_like(X),
        lam=lam,
        resnorms=jnp.full((k,), jnp.finfo(rt).max, rt),
        it=jnp.zeros((), jnp.int32),
        resnorm_log=jnp.zeros((max(maxiter, 1), k), rt),
    )


@partial(jax.jit, static_argnames=("largest",))
@_with_highest_precision
def _lobpcg_first(opA, opB, prec, Y, BY, S, largest):
    # span{X, W} (src/lobpcg.jl:692-711)
    k = S.X.shape[0]
    W, AW, BW, alive_w, resn = _make_w(opA, opB, prec, Y, BY, S)
    Sb = jnp.concatenate([S.X, W], axis=0)
    ASb = jnp.concatenate([S.AX, AW], axis=0)
    BSb = jnp.concatenate([S.BX, BW], axis=0)
    alive = jnp.concatenate([jnp.ones((k,), bool), alive_w])
    X, AX, BX, P, AP, BP, lam = _ritz_and_split(Sb, ASb, BSb, alive, k, largest)
    return _LState(
        X=X, AX=AX, BX=BX, P=P, AP=AP, BP=BP, lam=lam, resnorms=resn,
        it=S.it + 1, resnorm_log=S.resnorm_log.at[S.it].set(resn),
    )


@_with_highest_precision
def _lobpcg_main_step(opA, opB, prec, Y, BY, S, largest):
    # span{X, W, P} (src/lobpcg.jl:712-749).  P from the previous Ritz
    # step is B-orthonormal but not B-orthogonal to the new X (they mix
    # through C), so re-orthogonalize P against X first — keeping the
    # A/B images consistent under the same basis transforms.  Row layout:
    # the column transform P -= X Cxp with Cxp = BX^H P becomes
    # Pr -= Cxp^T Xr with Cxp^T = Pr conj(BXr)^T.
    k = S.X.shape[0]
    Cxpt = jnp.einsum("kn,jn->kj", S.P, jnp.conj(S.BX))
    P = S.P - Cxpt @ S.X
    AP = S.AP - Cxpt @ S.AX
    BP = S.BP - Cxpt @ S.BX
    P, BP, AP, alive_p = _orthonormalize_masked(P, BP, AP)
    W, AW, BW, alive_w, resn = _make_w(opA, opB, prec, Y, BY, S,
                                       extra_proj=(P, BP))
    Sb = jnp.concatenate([S.X, W, P], axis=0)
    ASb = jnp.concatenate([S.AX, AW, AP], axis=0)
    BSb = jnp.concatenate([S.BX, BW, BP], axis=0)
    alive = jnp.concatenate([jnp.ones((k,), bool), alive_w, alive_p])
    X, AX, BX, Pn, APn, BPn, lam = _ritz_and_split(Sb, ASb, BSb, alive, k, largest)
    return _LState(
        X=X, AX=AX, BX=BX, P=Pn, AP=APn, BP=BPn, lam=lam, resnorms=resn,
        it=S.it + 1, resnorm_log=S.resnorm_log.at[S.it].set(resn),
    )


@partial(jax.jit, static_argnames=("largest", "maxiter"))
def _lobpcg_main(opA, opB, prec, Y, BY, S, tol, largest, maxiter):
    from .common import run_chunked

    def cond(S):
        return (S.it < maxiter) & jnp.any(S.resnorms > tol)

    S = run_chunked(
        lambda s: _lobpcg_main_step(opA, opB, prec, Y, BY, s, largest),
        lambda s: ~cond(s),
        S,
        chunk=8,
    )
    R_blk = S.AX - S.BX * S.lam[:, None]
    return S, jnp.linalg.norm(R_blk, axis=1)


def _lobpcg_run(opA, opB, prec, X0r, Y, BY, largest, tol, maxiter):
    S = _lobpcg_init(opA, opB, prec, Y, BY, X0r, largest, maxiter)
    if maxiter >= 1:
        S = _lobpcg_first(opA, opB, prec, Y, BY, S, largest)
    if maxiter >= 2 and bool(jnp.any(S.resnorms > tol)):
        S, final_resn = _lobpcg_main(opA, opB, prec, Y, BY, S, tol, largest, maxiter)
    else:
        R_blk = S.AX - S.BX * S.lam[:, None]
        final_resn = jnp.linalg.norm(R_blk, axis=1)
    return S, final_resn


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def lobpcg(
    A,
    X0,
    *,
    B=None,
    largest: bool = False,
    nev: int | None = None,
    P=None,
    C=None,
    tol: float | None = None,
    maxiter: int = 200,
    log: bool = False,
) -> LOBPCGResults:
    """Find the ``nev`` smallest/largest eigenpairs of ``A x = lam B x``.

    Mirrors ``lobpcg(A, [B,] largest, X0, nev; ...)`` (src/lobpcg.jl:799-961):
    ``X0`` is the (n, blocksize) initial block; ``P`` a preconditioner;
    ``C`` an (n, m) basis the iterates stay B-orthogonal to (deflation);
    ``nev > blocksize`` accumulates converged pairs batch-by-batch, adding
    each converged batch to the constraints (src/lobpcg.jl:944-960).
    Requires ``3 * blocksize <= n`` (src/lobpcg.jl:834,934).
    """
    X0 = jnp.asarray(X0)
    if X0.ndim != 2:
        raise ValueError("X0 must be (n, blocksize)")
    n, bs = X0.shape
    if 3 * bs > n:
        raise ValueError("3 * blocksize must be <= n (src/lobpcg.jl:834)")
    nev = int(nev if nev is not None else bs)
    opA = as_operator(A)
    opB = as_operator(B) if B is not None else None
    prec = as_preconditioner(P)
    if tol is None:
        tol = default_tolerance(X0.dtype)
    rt = real_dtype(X0.dtype)
    tol_ = jnp.asarray(tol, rt)

    def _orthonormal_constraint(Yr):
        BYr = opB.mv_rows(Yr) if opB is not None else Yr
        Rc = _chol_factor(Yr, BYr)
        return _apply_rinv(Rc, Yr, BYr)

    Y = BY = None
    if C is not None:
        Y, BY = _orthonormal_constraint(jnp.asarray(C).T)

    lam_out, X_out, res_out = [], [], []
    batch_iters: list[int] = []
    batch_traces: list[np.ndarray] = []
    converged_all = True
    key = jax.random.PRNGKey(42)
    Xcur = X0.T  # internal layout: vectors as rows (bs, n)
    remaining = nev
    while remaining > 0:
        S, final_resn = _lobpcg_run(
            opA, opB, prec, Xcur, Y, BY, largest, tol_, maxiter
        )
        batch_iters.append(int(S.it))
        if log:
            batch_traces.append(
                np.asarray(S.resnorm_log)[: int(S.it)].max(axis=1)
            )
        take = min(bs, remaining)
        lam_out.append(S.lam[:take])
        X_out.append(S.X[:take])
        res_out.append(final_resn[:take])
        # convergence is judged on the loop's stored residuals, like the
        # reference (src/lobpcg.jl:890) — final_resn is the (slightly
        # different) post-update residual reported to the user
        converged_all &= bool(jnp.all(S.resnorms[:take] <= tol_))
        remaining -= take
        if remaining > 0:
            newY = S.X[:take]
            Yfull = newY if Y is None else jnp.concatenate([Y, newY], axis=0)
            Y, BY = _orthonormal_constraint(Yfull)
            key, sub = jax.random.split(key)
            Xcur = jax.random.normal(sub, (bs, n), rt).astype(X0.dtype)

    lam = jnp.concatenate(lam_out)
    X = jnp.concatenate(X_out, axis=0).T  # back to the (n, nev) public layout
    resn = jnp.concatenate(res_out)

    iterations = int(sum(batch_iters))
    history = None
    if log:
        history = ConvergenceHistory()
        history.iters = iterations
        history.isconverged = converged_all
        # per-iteration max residual norm, every batch's trace concatenated
        # (the reference keeps one trace per nev>blocksize batch,
        # src/lobpcg.jl:74,88; batch boundaries in :batch_iters)
        trace = (
            np.concatenate(batch_traces) if batch_traces
            else np.zeros((0,), np.asarray(resn).dtype)
        )
        history.set_series("resnorm", trace, trace.size)
        history["batch_iters"] = tuple(batch_iters)
        history["tol"] = float(tol)
    return LOBPCGResults(
        lam=lam, X=X, tolerance=float(tol), residual_norms=resn,
        iterations=iterations, maxiter=maxiter, converged=converged_all,
        history=history, batch_iterations=tuple(batch_iters),
    )


def lobpcg_iterator(
    A,
    X0,
    *,
    B=None,
    largest: bool = False,
    P=None,
    C=None,
    tol: float | None = None,
    maxiter: int = 200,
):
    """Eager step-wise LOBPCG — the reusable first-class iterator the
    reference exports as ``LOBPCGIterator`` (src/lobpcg.jl:497-522; step-wise
    control per docs/src/iterators.md:1-77).

    One ``next()`` = one LOBPCG iteration (the first spans {X, W}, later
    ones {X, W, P}, exactly the classic ``lobpcg``'s schedule) and yields
    the max residual norm of the block.  ``.state`` is a checkpoint pytree
    (``.state.lam`` = current Ritz values); ``.x`` is the (n, blocksize)
    eigenvector block in the public column layout.  Covers one block
    (``nev == blocksize``) — the ``nev > blocksize`` batching of ``lobpcg``
    is a host accumulation loop over exactly this object.
    """
    from .common import SolverIterator

    X0 = jnp.asarray(X0)
    if X0.ndim != 2:
        raise ValueError("X0 must be (n, blocksize)")
    n, bs = X0.shape
    if 3 * bs > n:
        raise ValueError("3 * blocksize must be <= n (src/lobpcg.jl:834)")
    opA = as_operator(A)
    opB = as_operator(B) if B is not None else None
    prec = as_preconditioner(P)
    if tol is None:
        tol = default_tolerance(X0.dtype)
    rt = real_dtype(X0.dtype)
    tol_ = jnp.asarray(tol, rt)

    Y = BY = None
    if C is not None:
        Yr = jnp.asarray(C).T
        BYr = opB.mv_rows(Yr) if opB is not None else Yr
        Rc = _chol_factor(Yr, BYr)
        Y, BY = _apply_rinv(Rc, Yr, BYr)

    state0 = _lobpcg_init(opA, opB, prec, Y, BY, X0.T, largest, maxiter)
    main = jax.jit(lambda S: _lobpcg_main_step(opA, opB, prec, Y, BY, S,
                                               largest))

    def step(S):
        if int(S.it) == 0:
            return _lobpcg_first(opA, opB, prec, Y, BY, S, largest)
        return main(S)

    def done(S):
        return int(S.it) >= maxiter or bool(jnp.all(S.resnorms <= tol_))

    return SolverIterator(
        state0, step, done,
        extract=lambda S: jnp.max(S.resnorms),
        jit=False,
        get_x=lambda S: S.X.T,
    )
