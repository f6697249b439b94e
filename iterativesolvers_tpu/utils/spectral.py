"""Spectral-bound helpers for Chebyshev iteration.

The reference requires the user to supply ``(lmin, lmax)`` positionally
(src/chebyshev.jl:59,141) and leaves estimation to the user.  These helpers
make the common cases one call:

* :func:`gershgorin_bounds` — rigorous enclosure from diagonal dominance
  (host-side, once; works on any operator with a CSR form or a stencil).
* :func:`power_bound` — a power-method estimate of ``lambda_max`` (device,
  jittable) with a safety factor, for matrices whose Gershgorin radius is
  too pessimistic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gershgorin_bounds", "power_bound"]


def gershgorin_bounds(A) -> tuple[float, float]:
    """Rigorous spectral enclosure [min(d - r), max(d + r)] over the
    Gershgorin discs (real symmetric reading).  Accepts any operator with
    ``to_csr()`` (stored formats), a ``StencilOperator``, or a CSRMatrix.
    For Chebyshev the lower bound must be positive — raise otherwise so the
    caller shifts or estimates differently."""
    from ..operators.stencil import StencilOperator

    if isinstance(A, StencilOperator):
        i = np.arange(A.n)
        d = np.full(A.n, float(np.asarray(A.center)))
        r = np.zeros(A.n)
        for (o, s, e), c in zip(A.terms, A.coeffs):
            pos = (i // s) % e
            step = o // s
            valid = (pos + step >= 0) & (pos + step < e)
            r += np.where(valid, abs(float(np.asarray(c))), 0.0)
    else:
        csr = A if type(A).__name__ == "CSRMatrix" else A.to_csr()
        rows = np.asarray(csr._host("row_ids"))
        cols = np.asarray(csr._host("indices"))
        vals = np.asarray(csr._host("data"))
        n = csr.shape[0]
        d = np.zeros(n, np.float64)
        diag_mask = rows == cols
        d[rows[diag_mask]] = vals[diag_mask].real
        r = np.zeros(n, np.float64)
        off = ~diag_mask
        np.add.at(r, rows[off], np.abs(vals[off]))
    return float((d - r).min()), float((d + r).max())


def power_bound(A, iters: int = 30, *, key=None, safety: float = 1.05):
    """Power-method estimate of ``lambda_max(A)`` (symmetric A), scaled by
    ``safety`` — a jittable device computation (one matvec per step)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n = A.shape[1]
    v0 = jax.random.normal(key, (n,), dtype=A.dtype)

    def body(_, v):
        w = A.mv(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v0 / jnp.linalg.norm(v0))
    lam = jnp.vdot(v, A.mv(v)).real
    return lam * safety
