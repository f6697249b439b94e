"""Sparse triangular solves via level scheduling.

The reference's Gauss-Seidel/SOR sweeps are sequential CSC column loops
(``forward_sub!``/``backward_sub!``, src/stationary_sparse.jl:67-143) —
inherently row-ordered and the main algorithmic obstacle on TPU (SURVEY §7).

TPU-native design: **level scheduling**.  At construction (host side) the rows
of the triangular matrix are topologically grouped into levels — row r is in
level 1 + max(level of its off-diagonal dependencies) — so all rows inside a
level solve in parallel.  The device sweep is a ``fori_loop`` over levels of
gather → fused multiply → masked scatter, with rows stored in padded ELL
layout per level.  The dependency order of the sequential sweep is preserved
exactly (row r solves only after all rows it depends on), so the result
matches the reference sweep to rounding (summation order within a row may
differ).

For 2/3-D stencil matrices the levels are grid anti-diagonals: O(sqrt(n)) or
O(n^{1/3}) sequential steps with wide parallel fronts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.compat import mark_varying

__all__ = ["LevelScheduledTriangular"]


@jax.tree_util.register_pytree_node_class
class LevelScheduledTriangular:
    """Solver for (D + T) y = rhs with T strictly triangular, given in
    host-side CSR-like arrays.  ``unit_scale`` entries multiply the diagonal.

    Leaves:
      rows    (nlev, wmax)        row index per slot (n = padding)
      cols    (nlev, wmax, kmax)  dependency column per row slot
      vals    (nlev, wmax, kmax)  off-diagonal value (0 = padding)
      diag    (n,)                diagonal entries
    """

    def __init__(self, rows, cols, vals, diag, n):
        self.rows = rows
        self.cols = cols
        self.vals = vals
        self.diag = diag
        self.n = int(n)

    # -- host-side construction ---------------------------------------------
    @classmethod
    def from_csr(cls, indptr, indices, data, diag, lower: bool):
        """Build from the strict-triangular part (rows' off-diagonal deps).

        indptr/indices/data describe ONLY the strict off-diagonal entries of
        the triangle being solved; ``diag`` is the length-n diagonal.
        """
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        data = np.asarray(data)
        diag = np.asarray(diag)
        n = diag.shape[0]

        from ..native import level_schedule

        level = level_schedule(indptr, indices, n, lower)  # O(nnz) native pass
        nlev = int(level.max()) + 1 if n else 1

        by_level = [np.where(level == l)[0] for l in range(nlev)]
        wmax = max((len(v) for v in by_level), default=1) or 1
        kmax = max((int(np.diff(indptr).max()) if n else 1), 1)

        rows = np.full((nlev, wmax), n, dtype=np.int32)
        cols = np.zeros((nlev, wmax, kmax), dtype=np.int32)
        vals = np.zeros((nlev, wmax, kmax), dtype=data.dtype)
        for l, rws in enumerate(by_level):
            rows[l, : len(rws)] = rws
            for slot, r in enumerate(rws):
                lo, hi = indptr[r], indptr[r + 1]
                w = hi - lo
                cols[l, slot, :w] = indices[lo:hi]
                vals[l, slot, :w] = data[lo:hi]
        return cls(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(diag), n,
        )

    @property
    def nlevels(self):
        return int(self.rows.shape[0])

    # -- device-side solve ----------------------------------------------------
    def solve(self, rhs, omega=None):
        """Solve (D/omega + T) y = rhs (omega=None means omega=1, i.e.
        (D + T) y = rhs).  The SOR sweep is
        (D/w + L) x_new = (b - U x) + (1/w - 1) d*x  — see solvers/stationary.py."""
        n = self.n
        # diag (and omega) participate in the division below — include them
        # so a complex diagonal with real off-diagonals/rhs is not truncated
        dtype = jnp.result_type(self.vals.dtype, rhs.dtype, self.diag.dtype)
        if omega is not None:
            dtype = jnp.result_type(dtype, jnp.asarray(omega).dtype)
        # pad slot n for masked scatter writes
        y = jnp.zeros(n + 1, dtype=dtype)
        diag = self.diag if omega is None else self.diag / omega
        diag_pad = jnp.concatenate([diag, jnp.ones(1, diag.dtype)])
        rhs_pad = jnp.concatenate([rhs, jnp.zeros(1, rhs.dtype)])
        # under shard_map (per-shard apply, parallel/precond.py) the loop
        # carry must already be marked varying over the mesh axes the data
        # varies over, or the fori_loop carry types mismatch
        def _vma(a):
            return set(getattr(jax.typeof(a), "vma", ()) or ())

        vma = _vma(rhs) | _vma(self.vals) | _vma(self.diag)
        if vma:
            missing = tuple(vma - _vma(y))
            if missing:
                y = mark_varying(y, missing)
            missing = tuple(vma - _vma(diag_pad))
            if missing:
                diag_pad = mark_varying(diag_pad, missing)
            missing = tuple(vma - _vma(rhs_pad))
            if missing:
                rhs_pad = mark_varying(rhs_pad, missing)

        rows, cols, vals = self.rows, self.cols, self.vals

        def level_body(l, y):
            r = rows[l]                      # (wmax,)
            c = cols[l]                      # (wmax, kmax)
            v = vals[l]                      # (wmax, kmax)
            acc = jnp.sum(v * y[c], axis=1)  # deps are in earlier levels
            yr = (rhs_pad[r] - acc) / diag_pad[r]
            return y.at[r].set(yr)           # padding rows write slot n

        y = jax.lax.fori_loop(0, rows.shape[0], level_body, y)
        return y[:n]

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals, self.diag), self.n

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        rows, cols, vals, diag = leaves
        obj = object.__new__(cls)
        obj.rows, obj.cols, obj.vals, obj.diag = rows, cols, vals, diag
        obj.n = aux
        return obj
