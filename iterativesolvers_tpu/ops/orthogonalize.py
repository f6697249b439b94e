"""Orthogonalization kernels (the analogue of src/orthogonalize.jl).

``orthogonalize_and_normalize(V, w, method)`` orthogonalizes ``w`` against the
columns of ``V`` and normalizes it, returning ``(w, h, nrm)`` with
``w_original = V h + nrm * w``.

The basis panel V has a *static* column count (the restart/window size);
inactive columns must be zero, so their coefficients vanish naturally — no
dynamic shapes.  Methods:

  * ``"mgs"``  — modified Gram-Schmidt, column-wise dots (src/orthogonalize.jl:67-79).
    Default, like the reference.  Sequential in the column index.
  * ``"cgs"``  — classical Gram-Schmidt: two tall-skinny GEMVs
    (src/orthogonalize.jl:41-51) — the MXU-friendly choice.
  * ``"dgks"`` — CGS with conditional re-orthogonalization while
    ``nrm < eta * |h|`` with eta = 1/sqrt(2), the ARPACK constant
    (src/orthogonalize.jl:15-39); iteration-capped for bounded compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..solvers.common import norm

__all__ = ["orthogonalize_and_normalize", "ORTH_METHODS"]

ORTH_METHODS = ("mgs", "cgs", "dgks")
_DGKS_ETA = 1.0 / jnp.sqrt(2.0)  # src/orthogonalize.jl:19 ("used by ARPACK")
_DGKS_MAX_REPEATS = 4


def _project_cgs(V, w):
    h = jnp.conj(V).T @ w
    return h, w - V @ h


def _mgs(V, w):
    m = V.shape[1]

    def body(j, carry):
        w, h = carry
        vj = V[:, j]
        hj = jnp.sum(jnp.conj(vj) * w)
        return w - hj * vj, h.at[j].set(hj)

    h0 = jnp.zeros(m, dtype=jnp.result_type(V.dtype, w.dtype))
    w, h = jax.lax.fori_loop(0, m, body, (w, h0))
    return h, w


def orthogonalize_and_normalize(V, w, method: str = "mgs"):
    if method == "mgs":
        h, w = _mgs(V, w)
    elif method == "cgs":
        h, w = _project_cgs(V, w)
    elif method == "dgks":
        h, w = _project_cgs(V, w)

        def cond(state):
            w, h, nrm, it = state
            return (nrm < _DGKS_ETA * norm(h)) & (it < _DGKS_MAX_REPEATS)

        def body(state):
            w, h, nrm, it = state
            correction, w = _project_cgs(V, w)
            return w, h + correction, norm(w), it + 1

        w, h, _, _ = jax.lax.while_loop(
            cond, body, (w, h, norm(w), jnp.zeros((), jnp.int32))
        )
    else:
        raise ValueError(f"unknown orthogonalization method {method!r}")

    nrm = norm(w)
    safe = jnp.where(nrm == 0, 1, nrm)
    return w / safe, h, nrm
