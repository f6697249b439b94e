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


def apply_givens_chain(cs, ss, col):
    """Apply stored rotations G_0..G_{m-1} pairwise-sequentially to a new
    Hessenberg column: the incremental-QR update loop

        for j in 0..m-1:  (col[j], col[j+1]) = G_j (col[j], col[j+1])

    vectorized.  The carry t_{j+1} = -conj(s_j) t_j + c_j col[j+1] is a
    first-order affine recurrence, so the whole chain is one parallel
    ``associative_scan`` over (m,) scalars instead of m sequential scalar
    rotations (measured: the fori_loop form costs ~90 us/iter of op-launch
    latency at m=20 on TPU — ~6% of a GMRES iteration).

    ``cs`` may be real while ``ss``/``col`` are complex (the storage split
    the solvers use); rotations beyond the active k must be identities
    (c=1, s=0), which make the recurrence a no-op there — same contract as
    the loop form.
    """
    import jax

    h = col[1:]                       # col[j+1] for j = 0..m-1
    dtype = jnp.result_type(cs, ss, col)
    A = (-jnp.conj(ss)).astype(dtype)
    B = cs.astype(dtype) * h.astype(dtype)

    def comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    cumA, cumB = jax.lax.associative_scan(comb, (A, B))
    # t_0 = col[0]; t_j (j >= 1) = cumA[j-1] * t_0 + cumB[j-1]
    t = jnp.concatenate([col[:1].astype(dtype),
                         cumA * col[0].astype(dtype) + cumB])
    out = cs.astype(dtype) * t[:-1] + ss.astype(dtype) * h.astype(dtype)
    return jnp.concatenate([out, t[-1:]]).astype(col.dtype)
