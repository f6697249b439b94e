"""Preconditioner protocol.

Reference contract (docs/src/preconditioning.md:5-10): a preconditioner must
support ``ldiv!(y, P, x)`` — i.e. apply P^{-1}.  Here the protocol is a single
functional method ``ldiv(x) -> P^{-1} x`` on a pytree, usable inside jit.

``IdentityPreconditioner`` mirrors ``Identity`` (src/common.jl:28-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linear_operator import LinearOperator

__all__ = [
    "Preconditioner",
    "IdentityPreconditioner",
    "DiagonalPreconditioner",
    "DensePreconditioner",
    "FunctionPreconditioner",
    "as_preconditioner",
    "is_identity",
]


class Preconditioner:
    def ldiv(self, x):
        raise NotImplementedError

    def __call__(self, x):
        return self.ldiv(x)


@jax.tree_util.register_pytree_node_class
class IdentityPreconditioner(Preconditioner):
    def ldiv(self, x):
        return x

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls()


@jax.tree_util.register_pytree_node_class
class DiagonalPreconditioner(Preconditioner):
    """Jacobi preconditioner: P = diag(d); ldiv divides elementwise."""

    def __init__(self, diag):
        self.diag = jnp.asarray(diag)

    def ldiv(self, x):
        return x / self.diag

    def tree_flatten(self):
        return (self.diag,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@jax.tree_util.register_pytree_node_class
class DensePreconditioner(Preconditioner):
    """Dense P, LU-factorized once at construction (host-trace time); applies
    via two triangular solves on device.  Matches the reference tests' use of
    exact factorizations as preconditioners (test/cg.jl:43-47)."""

    def __init__(self, mat=None, *, lu_and_piv=None):
        if lu_and_piv is None:
            lu_and_piv = jax.scipy.linalg.lu_factor(jnp.asarray(mat))
        self.lu_and_piv = lu_and_piv

    def ldiv(self, x):
        return jax.scipy.linalg.lu_solve(self.lu_and_piv, x)

    def tree_flatten(self):
        return (self.lu_and_piv,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(lu_and_piv=leaves[0])


@jax.tree_util.register_pytree_node_class
class FunctionPreconditioner(Preconditioner):
    """Matrix-free preconditioner from a jittable callable x -> P^{-1} x."""

    def __init__(self, ldiv_fn, params=()):
        self._ldiv = ldiv_fn
        self.params = tuple(params)

    def ldiv(self, x):
        return self._ldiv(*self.params, x) if self.params else self._ldiv(x)

    def tree_flatten(self):
        return self.params, self._ldiv

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux, params=leaves)


def as_preconditioner(P) -> Preconditioner:
    if P is None:
        return IdentityPreconditioner()
    if isinstance(P, Preconditioner):
        return P
    if callable(P) and not hasattr(P, "ndim") and not isinstance(P, LinearOperator):
        return FunctionPreconditioner(P)
    arr = jnp.asarray(P)
    if arr.ndim == 1:
        return DiagonalPreconditioner(arr)
    if arr.ndim == 2:
        return DensePreconditioner(arr)
    raise ValueError(f"cannot interpret preconditioner of type {type(P)}")


def is_identity(P) -> bool:
    return P is None or isinstance(P, IdentityPreconditioner)
