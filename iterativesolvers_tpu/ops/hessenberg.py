"""Hessenberg least-squares via Givens QR.

Functional analogue of ``FastHessenberg`` / ``ldiv!`` (src/hessenberg.jl:4-46):
solve ``min |H y - rhs|`` for an (m+1) x m Hessenberg H, leaving the residual
norm as ``|rhs[m]|`` after rotation.  Shapes are static (m = restart window);
the *active* column count ``k`` may be traced — unused columns of H must be
zero (GMRES keeps its H buffer zero-initialized), so rotations computed for
them are identities and the back-substitution is masked.

All O(m^2) scalar work; stays replicated and off the sharded data path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .givens import apply_givens, givens

__all__ = ["hessenberg_lstsq", "back_substitute"]


def back_substitute(R, g, k=None):
    """Solve R[:k,:k] y = g[:k] for upper-triangular R (m x m, zero-padded
    beyond k).  Returns y of static length m with zeros beyond k."""
    m = R.shape[1]
    if k is None:
        k = m
    y0 = jnp.zeros(m, dtype=jnp.result_type(R.dtype, g.dtype))

    def body(i_rev, y):
        i = m - 1 - i_rev
        active = i < k
        num = g[i] - jnp.dot(R[i], y)
        den = jnp.where(active, R[i, i], 1)
        yi = jnp.where(active, num / den, 0)
        return y.at[i].set(yi)

    return jax.lax.fori_loop(0, m, body, y0)


def hessenberg_lstsq(H, rhs, k=None, method: str = "auto"):
    """min |H[:k+1,:k] y - rhs[:k+1]|.

    H: (m+1, m) Hessenberg with columns >= k zero.  rhs: (m+1,).
    Returns (y, residual) where y has static length m (zeros beyond k) and
    residual = |rotated rhs[k]| (the reference leaves it in rhs[end],
    src/hessenberg.jl:40-46).

    ``method``: ``"dense"`` solves by one batched Householder QR + masked
    triangular solve, with the residual taken as ``|rhs_masked - H y|`` —
    the same minimum by QR invariance.  ``"givens"`` is the
    reference-shaped sequential Givens QR (src/hessenberg.jl:17-46).
    ``"auto"`` picks dense: the m new rotations are data-dependent through
    the R updates, so the Givens sweep is an m-step sequential scan of
    scalar-ish ops — measured 2.3-9x SLOWER than one batched dense solve at
    every m in 10..100 on TPU (benchmarks/tpu_hessenberg_ab.py, round 5;
    VERDICT r4 item 7).  GMRES never calls this: its rotations are
    incremental (one per iteration) where the sequential form is free.
    """
    m = H.shape[1]
    if k is None:
        k = m
    if method == "auto":
        method = "dense"
    if method == "dense":
        # rows beyond k+1 of H[:, :k] are structurally zero (Hessenberg with
        # zero columns >= k), so they never influence y; mask rhs there so
        # they don't pollute the residual either.
        full = isinstance(k, int) and k == m  # static: no masking at all
        if full:
            rhs_m = rhs
        else:
            row_mask = jnp.arange(H.shape[0]) <= k
            rhs_m = jnp.where(row_mask, rhs, 0)
        # ONE Q-free QR of the augmented [H | rhs]: column m of R is
        # Q^H rhs, and the rows >= k of that column hold the least-squares
        # residual components — no Q materialization, no H @ y matvec.
        # Any sign convention of R works (same orthogonal transform on
        # both sides; the residual is read as a norm).
        Raug = jnp.linalg.qr(jnp.concatenate([H, rhs_m[:, None]], axis=1),
                             mode="r")
        R = Raug[:m, :m]
        g_full = Raug[:, m]
        if full:
            y = jax.scipy.linalg.solve_triangular(R, g_full[:m],
                                                  lower=False)
            return y, jnp.abs(g_full[m])
        # columns >= k of H are zero, hence so are those of R (incl. the
        # diagonal); put 1s there and zero the matching g rows so the
        # static-shape triangular solve returns exact y[:k] and y[k:] = 0
        col_act = jnp.arange(m) < k
        R = R + jnp.diag(jnp.where(col_act, 0, 1).astype(R.dtype))
        g = jnp.where(col_act, g_full[:m], 0)
        y = jax.scipy.linalg.solve_triangular(R, g, lower=False)
        tail = jnp.where(jnp.arange(g_full.shape[0]) >= k, g_full, 0)
        residual = jnp.sqrt(jnp.real(jnp.vdot(tail, tail)))
        return y, residual
    if method != "givens":
        raise ValueError(f"unknown method {method!r}")

    def qr_col(carry, j):
        R, g = carry
        col = R[:, j]

        # zero sub-diagonal entry j+1 of column j with one new rotation;
        # previous rotations were already applied column-by-column below.
        c, s, r = givens(col[j], col[j + 1])
        col = col.at[j].set(r).at[j + 1].set(0)
        R = R.at[:, j].set(col)
        gj, gj1 = apply_givens(c, s, g[j], g[j + 1])
        g = g.at[j].set(gj).at[j + 1].set(gj1)

        # apply this rotation to the remaining columns' rows (j, j+1)
        rowj, rowj1 = apply_givens(c, s, R[j, :], R[j + 1, :])
        mask = jnp.arange(m) > j
        R = R.at[j, :].set(jnp.where(mask, rowj, R[j, :]))
        R = R.at[j + 1, :].set(jnp.where(mask, rowj1, R[j + 1, :]))
        return (R, g), None

    (R, g), _ = jax.lax.scan(qr_col, (H, rhs), jnp.arange(m))
    y = back_substitute(R[:m, :], g[:m], k)
    residual = jnp.abs(g[jnp.minimum(k, m)])
    return y, residual
