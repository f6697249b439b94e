"""Linear operator protocol.

The reference's operator contract is duck-typed Julia: ``A*v``, ``mul!(y,A,v)``,
``adjoint(A)``, ``eltype``, ``size`` (docs/src/getting_started.md:22-31).  The
TPU-native analogue is a **pytree** with ``mv``/``rmv`` methods so operators can
flow through ``jit``/``lax.while_loop``/``shard_map`` carries: array data are
leaves, shapes/callables are static aux data.

Matrix-free operators (reference tests use LinearMaps.jl, e.g. test/cg.jl:71-77)
are ``FunctionOperator``s holding jittable callables.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LinearOperator",
    "MatrixOperator",
    "FunctionOperator",
    "AdjointOperator",
    "ScaledIdentityPlusOperator",
    "as_operator",
]


class LinearOperator:
    """Abstract operator: knows ``shape``, ``dtype``, ``mv`` and (optionally) ``rmv``."""

    shape: Tuple[int, int]

    @property
    def dtype(self):
        raise NotImplementedError

    def mv(self, x):
        """y = A @ x"""
        raise NotImplementedError

    def rmv(self, x):
        """y = A^H @ x (adjoint matvec). Solvers needing it: QMR/LSQR/LSMR/svdl."""
        raise NotImplementedError(
            f"{type(self).__name__} does not provide an adjoint matvec"
        )

    def mv_dot(self, x):
        """(A x, <x, A x>) — the SpMV + first CG reduction (src/cg.jl:54-55)
        as one bundle so operators with a fused kernel (StencilOperator on
        TPU) can produce both in a single HBM pass."""
        y = self.mv(x)
        return y, jnp.sum(jnp.conj(x) * y)

    def mv_rows(self, Xr):
        """Row-panel SpMM: ``Xr`` is (k, n) with VECTORS AS ROWS; returns the
        (k, m) row panel of ``A @ x`` per row.  Block solvers (LOBPCG) keep
        panels in this layout because a (n, k) column panel pads its minor
        dim to the 128-lane tile on TPU (8-32x HBM bloat for small k).  The
        default transposes through ``mv`` (correct for any operator,
        including shard_map-distributed ones); concrete formats override
        with a vmapped kernel that never materializes the padded layout."""
        return jnp.swapaxes(self.mv(jnp.swapaxes(Xr, 0, 1)), 0, 1)

    # Conveniences mirroring the Julia surface.
    def __matmul__(self, x):
        return self.mv(x)

    @property
    def H(self) -> "LinearOperator":
        return AdjointOperator(self)

    @property
    def T(self) -> "LinearOperator":
        # For real operators T == H; complex users should use .H explicitly.
        return AdjointOperator(self)

    def to_dense(self):
        n, m = self.shape
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(
            jnp.eye(m, dtype=self.dtype)
        )


@jax.tree_util.register_pytree_node_class
class MatrixOperator(LinearOperator):
    """Dense matrix operator (falls onto the MXU via ``jnp.dot``)."""

    def __init__(self, mat):
        self.mat = mat

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def mv(self, x):
        return self.mat @ x

    def rmv(self, x):
        return jnp.conj(self.mat).T @ x

    def mv_rows(self, Xr):
        # (A X)^T = X^T A^T: one GEMM, minor dim stays n
        return Xr @ self.mat.T

    def to_dense(self):
        return self.mat

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@jax.tree_util.register_pytree_node_class
class FunctionOperator(LinearOperator):
    """Matrix-free operator from jittable callables.

    ``matvec``/``rmatvec`` are static aux data (must be hashable, e.g. module
    functions or stable closures); captured array constants should instead be
    passed via ``params`` so they remain pytree leaves.
    """

    def __init__(
        self,
        matvec: Callable,
        shape: Tuple[int, int],
        dtype,
        rmatvec: Optional[Callable] = None,
        params=(),
    ):
        self._matvec = matvec
        self._rmatvec = rmatvec
        self._shape = tuple(int(s) for s in shape)
        self._dtype = np.dtype(dtype)
        self.params = tuple(params)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    def mv(self, x):
        return self._matvec(*self.params, x) if self.params else self._matvec(x)

    def rmv(self, x):
        if self._rmatvec is None:
            return super().rmv(x)
        return self._rmatvec(*self.params, x) if self.params else self._rmatvec(x)

    def mv_rows(self, Xr):
        # a user matvec typically handles a single (n,) vector only (e.g.
        # reshapes to a grid internally) — vmap it rather than feeding it a
        # 2-D array through the transpose default
        return jax.vmap(self.mv)(Xr)

    def tree_flatten(self):
        return self.params, (self._matvec, self._rmatvec, self._shape, self._dtype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        matvec, rmatvec, shape, dtype = aux
        return cls(matvec, shape, dtype, rmatvec=rmatvec, params=leaves)


@jax.tree_util.register_pytree_node_class
class AdjointOperator(LinearOperator):
    def __init__(self, inner: LinearOperator):
        self.inner = inner

    @property
    def shape(self):
        n, m = self.inner.shape
        return (m, n)

    @property
    def dtype(self):
        return self.inner.dtype

    def mv(self, x):
        return self.inner.rmv(x)

    def rmv(self, x):
        return self.inner.mv(x)

    @property
    def H(self):
        return self.inner

    def tree_flatten(self):
        return (self.inner,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


@jax.tree_util.register_pytree_node_class
class ScaledIdentityPlusOperator(LinearOperator):
    """(A + sigma*I) — used for shifts (e.g. inverse iteration helpers)."""

    def __init__(self, inner: LinearOperator, sigma):
        self.inner = inner
        self.sigma = sigma

    @property
    def shape(self):
        return self.inner.shape

    @property
    def dtype(self):
        return self.inner.dtype

    def mv(self, x):
        return self.inner.mv(x) + self.sigma * x

    def rmv(self, x):
        return self.inner.rmv(x) + jnp.conj(self.sigma) * x

    def tree_flatten(self):
        return (self.inner, self.sigma), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def as_operator(A, b=None) -> LinearOperator:
    """Coerce user input (operator / dense array / callable) to a LinearOperator."""
    if isinstance(A, LinearOperator):
        return A
    if callable(A) and not hasattr(A, "ndim"):
        if b is None:
            raise ValueError("matrix-free callable needs `b` to infer shape/dtype")
        n = b.shape[0]
        return FunctionOperator(A, (n, n), b.dtype)
    arr = jnp.asarray(A)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D matrix, got shape {arr.shape}")
    return MatrixOperator(arr)
