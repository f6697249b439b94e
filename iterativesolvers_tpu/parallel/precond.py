"""Distributed preconditioning: shard-local block-Jacobi ILU(0)/IC(0).

The classic distributed preconditioner (SURVEY §2.5 distributed row;
reference contract docs/src/preconditioning.md:5-10 — any ``ldiv``): drop
couplings across shard boundaries and incomplete-factor each shard's
diagonal block independently.  The apply is then embarrassingly parallel —
each device runs its own level-scheduled triangular sweeps on its own rows,
ZERO communication — which is exactly what a preconditioner application
inside a distributed Krylov iteration must be (the dots/SpMV already own
the collective budget).

Equivalence: with ``nblocks = D`` contiguous row blocks this is the same
operator as ``ILUPreconditioner.block_jacobi(A, D)`` applied on one device
(tests pin iterate equality); here the factors are STORED per shard
(stacked leading block axis, sharded over the mesh) and applied per shard
under ``shard_map``.

Composes with ``ordering="multicolor"`` per block: each shard's sweep
collapses to its block's color count — the production configuration for
large distributed solves (parallel apply across AND within shards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..operators.preconditioners import (
    ICPreconditioner,
    ILUPreconditioner,
    Preconditioner,
)
from ..ops.triangular import LevelScheduledTriangular

__all__ = ["ShardedBlockJacobiPreconditioner"]


def _pad_stack(tris, nloc, dtype):
    """Stack per-block LevelScheduledTriangular leaves to common shapes.

    Padding levels/slots write the sentinel row ``nloc`` (the solve's
    scratch slot), so they are semantic no-ops."""
    nlev = max(t.rows.shape[0] for t in tris)
    wmax = max(t.rows.shape[1] for t in tris)
    kmax = max(t.cols.shape[2] for t in tris)
    D = len(tris)
    rows = np.full((D, nlev, wmax), nloc, np.int32)
    cols = np.zeros((D, nlev, wmax, kmax), np.int32)
    vals = np.zeros((D, nlev, wmax, kmax), dtype)
    diag = np.ones((D, nloc), dtype)
    for b, t in enumerate(tris):
        l, w, k = t.rows.shape[0], t.rows.shape[1], t.cols.shape[2]
        rows[b, :l, :w] = np.asarray(t.rows)
        cols[b, :l, :w, :k] = np.asarray(t.cols)
        vals[b, :l, :w, :k] = np.asarray(t.vals)
        diag[b] = np.asarray(t.diag)
    return (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(diag))


@jax.tree_util.register_pytree_node_class
class ShardedBlockJacobiPreconditioner(Preconditioner):
    """Shard-local block-Jacobi ILU(0)/IC(0) over a row mesh (see module
    docstring).  Build with :meth:`ilu` (nonsymmetric solvers) or :meth:`ic`
    (SPD solvers; symmetric apply)."""

    def __init__(self, mesh, axes, nloc, lower, upper, perm, inv, nlevels):
        self.mesh = mesh
        self.axes = axes
        self.nloc = nloc
        self.lower = lower        # (rows, cols, vals, diag) stacked tuples
        self.upper = upper
        self.perm = perm          # (D, nloc) int32 or None
        self.inv = inv
        self._nlevels = nlevels

    @property
    def nlevels(self):
        """Max sequential fronts per shard sweep (parallel across shards)."""
        return self._nlevels

    # -- construction ---------------------------------------------------------
    @classmethod
    def _build(cls, factory, A, mesh: Mesh, ordering: str):
        from ..operators.sparse import CSRMatrix

        csr = A if isinstance(A, CSRMatrix) else A.to_csr()
        n, m = csr.shape
        if n != m:
            raise ValueError("block-Jacobi factorization needs a square operator")
        axes = tuple(mesh.axis_names)
        D = int(np.prod([mesh.shape[a] for a in axes]))
        if n % D != 0:
            raise ValueError(f"n={n} must divide evenly over {D} devices")
        nloc = n // D
        rows = np.asarray(csr._host("row_ids")).astype(np.int64)
        cols = np.asarray(csr._host("indices")).astype(np.int64)
        vals = np.asarray(csr._host("data"))
        lowers, uppers, perms, invs = [], [], [], []
        for b in range(D):
            keep = ((rows // nloc) == b) & ((cols // nloc) == b)
            blk = CSRMatrix.from_coo(rows[keep] - b * nloc,
                                     cols[keep] - b * nloc,
                                     vals[keep], (nloc, nloc))
            p = factory(blk, ordering=ordering)
            lowers.append(p.lower_solve)
            uppers.append(p.upper_solve)
            if p.perm is not None:
                perms.append(np.asarray(p.perm))
                invs.append(np.asarray(p.inv))
        fdtype = np.asarray(lowers[0].vals).dtype
        lower = _pad_stack(lowers, nloc, fdtype)
        upper = _pad_stack(uppers, nloc, fdtype)
        perm = inv = None
        if perms:
            perm = jnp.asarray(np.stack(perms).astype(np.int32))
            inv = jnp.asarray(np.stack(invs).astype(np.int32))
        nlev = max(int(lower[0].shape[1]), int(upper[0].shape[1]))
        return cls(mesh, axes, nloc, lower, upper, perm, inv, nlev)

    @classmethod
    def ilu(cls, A, mesh: Mesh, *, ordering: str = "natural"):
        """Shard-local block-Jacobi ILU(0) (nonsymmetric apply)."""
        return cls._build(ILUPreconditioner.from_operator, A, mesh, ordering)

    @classmethod
    def ic(cls, A, mesh: Mesh, *, ordering: str = "natural"):
        """Shard-local block-Jacobi IC(0) (symmetric apply — safe for
        cg/minres/lobpcg as long as A's block-diagonal part is SPD)."""
        return cls._build(ICPreconditioner.from_operator, A, mesh, ordering)

    # -- apply ----------------------------------------------------------------
    def ldiv(self, x):
        nloc, axes = self.nloc, self.axes
        permuted = self.perm is not None

        def tri(parts):
            rows, cols, vals, diag = (a[0] for a in parts)
            return LevelScheduledTriangular(rows, cols, vals, diag, nloc)

        def local(lower, upper, x_loc):
            y = tri(upper).solve(tri(lower).solve(x_loc))
            return y.astype(x_loc.dtype)

        def local_perm(lower, upper, perm, inv, x_loc):
            y = tri(upper).solve(tri(lower).solve(x_loc[perm[0]]))
            return y[inv[0]].astype(x_loc.dtype)

        spec4 = (P(axes, None, None), P(axes, None, None, None),
                 P(axes, None, None, None), P(axes, None))
        if permuted:
            pspec = P(axes, None)
            return jax.shard_map(
                local_perm,
                mesh=self.mesh,
                in_specs=(spec4, spec4, pspec, pspec, P(axes)),
                out_specs=P(axes),
            )(self.lower, self.upper, self.perm, self.inv, x)
        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(spec4, spec4, P(axes)),
            out_specs=P(axes),
        )(self.lower, self.upper, x)

    # -- pytree ---------------------------------------------------------------
    def tree_flatten(self):
        return (self.lower, self.upper, self.perm, self.inv), (
            self.mesh, self.axes, self.nloc, self._nlevels)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        lower, upper, perm, inv = leaves
        mesh, axes, nloc, nlev = aux
        return cls(mesh, axes, nloc, lower, upper, perm, inv, nlev)
