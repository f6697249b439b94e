"""Givens rotations (complex-safe), the analogue of LAPACK's
``givensAlgorithm`` used by the reference (src/hessenberg.jl:24,
src/minres.jl:131, src/qmr.jl).

Convention: ``givens(a, b) -> (c, s, r)`` with c real, s same dtype as a/b,
such that::

    [  c        s ] [a]   [r]
    [ -conj(s)  c ] [b] = [0]

All scalar ops — these run as replicated scalar work inside the jitted solver
step, never on the sharded data path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["givens"]


def givens(a, b):
    dtype = jnp.result_type(a, b)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    d = jnp.sqrt(abs_a * abs_a + abs_b * abs_b)
    safe_d = jnp.where(d == 0, 1, d)
    safe_abs_a = jnp.where(abs_a == 0, 1, abs_a)
    sign_a = jnp.where(abs_a == 0, jnp.ones((), dtype), a / safe_abs_a)
    c = jnp.where(d == 0, jnp.ones((), d.dtype), abs_a / safe_d)
    s = jnp.where(
        d == 0,
        jnp.zeros((), dtype),
        jnp.where(abs_a == 0, jnp.ones((), dtype), sign_a * jnp.conj(b) / safe_d),
    )
    r = jnp.where(abs_a == 0, b, sign_a * d)
    r = jnp.where(d == 0, jnp.zeros((), dtype), r)
    return c, s, r


def apply_givens(c, s, x, y):
    """Apply the rotation to a pair (x, y) -> (c*x + s*y, -conj(s)*x + c*y)."""
    return c * x + s * y, -jnp.conj(s) * x + c * y
