"""TPU-first sparse matrix formats.

The reference hand-writes CSC column kernels because Julia stores CSC
(src/stationary_sparse.jl, rationale docs/src/linear_systems/stationary.md:5-8).
TPU wants the opposite: contiguous, lane-aligned, row-major access with static
shapes.  We therefore provide:

  * ``DIAMatrix`` — diagonal (stencil) storage.  SpMV = sum of shifted
    elementwise products: pure VPU traffic, zero gathers — the speed-of-light
    format for the Laplace / advection-diffusion benchmark matrices
    (test/laplace_matrix.jl:1-13, benchmark/advection_diffusion.jl:3-31).
  * ``ELLMatrix`` — padded fixed-width rows (n, k).  SpMV = one gather +
    multiply + row-sum; the general-matrix workhorse.
  * ``CSRMatrix`` — canonical interchange format; SpMV via sorted segment-sum.
    Construction-side only on the hot path (convert to ELL/DIA for speed).

All classes are pytrees (array leaves, static aux) and LinearOperators.
Construction happens host-side in numpy; SpMV is jit/pjit-traceable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linear_operator import LinearOperator


def _keep_host(x, dtype=None):
    """Retain a host-side numpy copy when the input is already on the host.

    Conversion/structure methods (to_ell/to_hyb/to_dia/diagonal/...) run in
    numpy.  On the remote-attached TPU backend a device->host readback is
    pathologically slow (minutes for MBs), so formats cache the numpy arrays
    they were constructed from and conversions prefer them; ``None`` means
    the data only exists on device and will be read back on demand."""
    if isinstance(x, jax.Array):
        return None
    return np.asarray(x, dtype=dtype) if dtype is not None else np.asarray(x)

def _validate_coo_indices(rows, cols, shape):
    """Raise ValueError on out-of-range COO indices (hostile/malformed input
    would otherwise corrupt memory in the native counting sort)."""
    n_rows, n_cols = int(shape[0]), int(shape[1])
    if rows.size and (
        int(rows.min()) < 0 or int(rows.max()) >= n_rows
        or int(cols.min()) < 0 or int(cols.max()) >= n_cols
    ):
        raise ValueError(
            f"COO indices out of range for shape ({n_rows}, {n_cols}): "
            f"rows in [{rows.min()}, {rows.max()}], "
            f"cols in [{cols.min()}, {cols.max()}]"
        )


__all__ = [
    "CSRMatrix",
    "ELLMatrix",
    "HYBMatrix",
    "DIAMatrix",
    "BSRMatrix",
    "csr_from_dense",
    "dia_from_dense",
]


@jax.tree_util.register_pytree_node_class
class CSRMatrix(LinearOperator):
    """Compressed sparse row.  ``row_ids`` (nnz,) is precomputed so the device
    SpMV is a sorted segment-sum, with no indptr expansion inside jit."""

    def __init__(self, data, indices, indptr, shape, row_ids=None):
        self._h_data = _keep_host(data)
        self._h_indices = _keep_host(indices, np.int32)
        self._h_indptr = _keep_host(indptr, np.int64)
        self.data = jnp.asarray(data)
        self.indices = jnp.asarray(indices, dtype=jnp.int32)
        self.indptr = jnp.asarray(indptr, dtype=jnp.int32)
        self._shape = (int(shape[0]), int(shape[1]))
        if row_ids is None:
            counts = np.diff(np.asarray(indptr).astype(np.int64))
            row_ids = np.repeat(np.arange(self._shape[0], dtype=np.int32), counts)
        self._h_row_ids = _keep_host(row_ids, np.int32)
        self.row_ids = jnp.asarray(row_ids, dtype=jnp.int32)

    def _host(self, name):
        h = getattr(self, "_h_" + name)
        return h if h is not None else np.asarray(getattr(self, name))

    # -- construction --------------------------------------------------------
    @classmethod
    def from_coo(cls, rows, cols, vals, shape):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        # indices may come from untrusted files (MatrixMarket); validate
        # before they reach the native counting sort, which indexes raw
        # buffers with them.
        _validate_coo_indices(rows, cols, shape)
        if not np.iscomplexobj(vals):
            # native O(nnz) counting-sort path (itsolvers_native.cpp)
            from ..native import coo_to_csr

            indptr, indices, data64 = coo_to_csr(rows, cols, vals, shape[0])
            return cls(data64.astype(vals.dtype), indices, indptr, shape)
        # complex values: the numpy sort/merge fallback is dtype-generic —
        # share one implementation with the native module so the
        # duplicate-merge/indptr logic cannot drift
        from ..native import _coo_to_csr_numpy

        indptr, indices, data = _coo_to_csr_numpy(rows, cols, vals, shape[0])
        return cls(data, indices, indptr, shape)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return int(self.data.shape[0])

    def astype(self, dtype) -> "CSRMatrix":
        """Copy with the stored values in ``dtype`` (structure unchanged).
        See :func:`compress_values` for the exactness-checked form."""
        return CSRMatrix(
            self._host("data").astype(dtype), self._host("indices"),
            self._host("indptr"), self._shape, row_ids=self._host("row_ids"),
        )

    def mv(self, x):
        # x: (m,) or (m, k)
        d = self.data if x.ndim == 1 else self.data[:, None]
        vals = d * x[self.indices]
        return jax.ops.segment_sum(
            vals, self.row_ids, num_segments=self._shape[0], indices_are_sorted=True
        )

    def rmv(self, x):
        # A^H x via scatter-add onto column ids (no transposed copy needed).
        d = jnp.conj(self.data) if x.ndim == 1 else jnp.conj(self.data)[:, None]
        vals = d * x[self.row_ids]
        return jax.ops.segment_sum(vals, self.indices, num_segments=self._shape[1])

    def mv_rows(self, Xr):
        return jax.vmap(self.mv)(Xr)

    def to_dense(self):
        out = jnp.zeros(self._shape, dtype=self.dtype)
        return out.at[self.row_ids, self.indices].add(self.data)

    def to_ell(self, row_width: int | None = None) -> "ELLMatrix":
        indptr = self._host("indptr")
        counts = np.diff(indptr)
        k = int(counts.max()) if row_width is None else int(row_width)
        k = max(k, 1)
        n = self._shape[0]
        host_data = self._host("data")
        host_idx = self._host("indices")
        if not np.iscomplexobj(host_data):
            from ..native import csr_to_ell

            cols, data64 = csr_to_ell(indptr, host_idx, host_data, n, k)
            return ELLMatrix(data64.astype(host_data.dtype), cols, self._shape)
        data = np.zeros((n, k), dtype=host_data.dtype)
        cols = np.zeros((n, k), dtype=np.int32)
        for i in range(n):
            lo, hi = indptr[i], indptr[i + 1]
            w = min(hi - lo, k)
            data[i, :w] = host_data[lo : lo + w]
            cols[i, :w] = host_idx[lo : lo + w]
        return ELLMatrix(data, cols, self._shape)

    def to_hyb(self, row_width: int | None = None,
               tail_cost: float = 4.0) -> "HYBMatrix":
        """Convert to hybrid ELL + COO-tail form (see :class:`HYBMatrix`).

        ``row_width`` defaults to the w minimizing the modeled SpMV cost
        ``n*w + tail_cost * tail_nnz(w)`` over the distinct row degrees —
        gathered ELL elements cost 1, tail elements cost ``tail_cost``
        (gather + sorted scatter-add).
        """
        indptr = self._host("indptr").astype(np.int64)
        counts = np.diff(indptr)
        n = self._shape[0]
        if row_width is None:
            cands = np.unique(np.concatenate([[1], counts[counts > 0]]))
            # tail(w) = sum(max(counts - w, 0)) — O(#cands * n) is fine on host
            best_w, best_cost = int(counts.max() or 1), float("inf")
            for w in cands:
                tail = int(np.maximum(counts - w, 0).sum())
                cost = n * int(w) + tail_cost * tail
                if cost < best_cost:
                    best_w, best_cost = int(w), cost
            row_width = best_w
        w = max(int(row_width), 1)
        ell = self.to_ell(row_width=w)  # keeps the first w entries per row
        data = self._host("data")
        idx = self._host("indices")
        # vectorized tail extraction: an nnz entry is tail iff its within-row
        # position >= w (CSR order makes positions a range per row)
        row_ids = self._host("row_ids")
        pos = np.arange(row_ids.size, dtype=np.int64) - indptr[row_ids]
        tail = pos >= w
        tail_rows = row_ids[tail].astype(np.int32)
        tail_cols = idx[tail].astype(np.int32)
        tail_vals = data[tail]
        return HYBMatrix(ell, tail_rows, tail_cols, tail_vals, self._shape)

    def to_dia(self) -> "DIAMatrix":
        rows = self._host("row_ids").astype(np.int64)
        cols = self._host("indices").astype(np.int64)
        vals = self._host("data")
        offsets = np.unique(cols - rows)
        n = self._shape[0]
        data = np.zeros((offsets.size, n), dtype=vals.dtype)
        # vectorized one-pass scatter (this is the auto_format RCM->DIA path
        # for large matrices; a per-nonzero Python loop would take minutes)
        off_idx = np.searchsorted(offsets, cols - rows)
        data[off_idx, rows] = vals
        return DIAMatrix(data, tuple(int(o) for o in offsets), self._shape)

    def diagonal(self):
        """Main diagonal as a dense vector (raises if a diagonal entry is
        structurally absent — mirrors DiagonalIndices' SingularException check,
        src/stationary_sparse.jl:18-20, checked at the call site)."""
        rows = self._host("row_ids")
        cols = self._host("indices")
        vals = self._host("data")
        mask = rows == cols
        d = np.zeros(min(self._shape), dtype=vals.dtype)
        present = np.zeros(min(self._shape), dtype=bool)
        d[rows[mask]] = vals[mask]
        present[rows[mask]] = True
        return d, present

    # -- reordering / format selection ---------------------------------------
    def permute(self, perm) -> "CSRMatrix":
        """Symmetric permutation ``B = A[perm, :][:, perm]`` (square only):
        ``B[i, j] = A[perm[i], perm[j]]``.  To solve ``A x = b`` with the
        permuted operator, solve ``B y = b[perm]`` and scatter back
        ``x[perm] = y``."""
        n, m = self._shape
        if n != m:
            raise ValueError("symmetric permutation requires a square matrix")
        perm = np.asarray(perm, np.int64)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        rows = inv[self._host("row_ids").astype(np.int64)]
        cols = inv[self._host("indices").astype(np.int64)]
        return CSRMatrix.from_coo(rows, cols, self._host("data"), self._shape)

    def rcm(self):
        """(perm, bandwidth): reverse Cuthill-McKee ordering of the
        symmetrized pattern — the bandwidth-reducing preprocessing that
        exposes banded/DIA structure for the gather-free TPU SpMV formats."""
        from ..native import rcm_order

        n = self._shape[0]
        if n != self._shape[1]:
            raise ValueError("RCM requires a square matrix")
        # symmetrize the pattern (values irrelevant)
        r = self._host("row_ids").astype(np.int64)
        c = self._host("indices").astype(np.int64)
        rs = np.concatenate([r, c])
        cs = np.concatenate([c, r])
        sym = CSRMatrix.from_coo(rs, cs, np.ones(rs.size, np.float64), self._shape)
        return rcm_order(sym._host("indptr"), sym._host("indices"), n)

    def structure_stats(self) -> dict:
        """Host-side structure metrics feeding :func:`auto_format`."""
        indptr = self._host("indptr").astype(np.int64)
        counts = np.diff(indptr)
        rows = self._host("row_ids").astype(np.int64)
        cols = self._host("indices").astype(np.int64)
        offsets = cols - rows
        ndiag = int(np.unique(offsets).size)
        bw = int(np.abs(offsets).max()) if offsets.size else 0
        return {
            "n": self._shape[0],
            "nnz": int(rows.size),
            "max_degree": int(counts.max()) if counts.size else 0,
            "mean_degree": float(counts.mean()) if counts.size else 0.0,
            "ndiag": ndiag,
            "bandwidth": bw,
        }

    def auto_format(self, *, tail_cost: float = 4.0, try_rcm: bool = True):
        """Pick the fastest TPU SpMV format by cost model (VERDICT r1 #5).

        Modeled per-SpMV cost in streamed/gathered elements (the TPU SpMV
        is gather-bound at ~7 ns/gathered element for random patterns and
        bandwidth-bound for streamed ones — memory/tpu pitfalls #9):

          DIA  : ndiag * n           streamed   (weight 1)
          ELL  : n * maxdeg          gathered   (weight ``tail_cost``..)
          HYB  : n * w + tail(w)     gathered
          BSR  : nblk * bs^2         streamed + one small gather per block

        Square matrices optionally test an RCM reordering first: if it
        shrinks the diagonal count enough that DIA wins, returns the
        permuted operator.  Returns ``(op, perm)`` where ``perm`` is None
        when no reordering was applied."""
        stats = self.structure_stats()
        n, nnz = stats["n"], stats["nnz"]
        square = self._shape[0] == self._shape[1]

        GATHER = tail_cost  # relative cost of a gathered vs streamed element

        candidates = {}  # name -> (cost, builder)
        if stats["ndiag"] > 0:
            candidates["dia"] = (
                float(stats["ndiag"]) * n,
                lambda: (self.to_dia(), None),
            )
        candidates["ell"] = (
            GATHER * float(max(stats["max_degree"], 1)) * n,
            lambda: (self.to_ell(), None),
        )
        # HYB cost: the SAME objective to_hyb minimizes (ELL element = one
        # gather, tail element = tail_cost gathers for the gather +
        # scatter-add), scaled by GATHER into this model's streamed units —
        # and the argmin w is passed to to_hyb so the built operator is
        # exactly the one that was costed
        indptr = self._host("indptr").astype(np.int64)
        counts = np.diff(indptr)
        if counts.size:
            cands = np.unique(np.concatenate([[1], counts[counts > 0]]))
            hyb_w, hyb_cost = 1, float("inf")
            for w in cands:
                tail = float(np.maximum(counts - w, 0).sum())
                c = GATHER * (n * int(w) + tail_cost * tail)
                if c < hyb_cost:
                    hyb_w, hyb_cost = int(w), c
            candidates["hyb"] = (
                hyb_cost,
                lambda: (self.to_hyb(row_width=hyb_w,
                                     tail_cost=tail_cost), None),
            )
        # BSR: estimate block fill for a few block sizes
        rows = self._host("row_ids").astype(np.int64)
        cols = self._host("indices").astype(np.int64)
        for bs in (2, 4, 8):
            if self._shape[0] % bs or self._shape[1] % bs:
                continue
            nblk = np.unique(
                (rows // bs) * (self._shape[1] // bs) + cols // bs
            ).size
            # streamed block data + one gathered x block per block
            cost = float(nblk) * bs * bs + GATHER * float(nblk) * bs
            candidates[f"bsr{bs}"] = (
                cost,
                (lambda b: (lambda: (BSRMatrix.from_csr(self, b), None)))(bs),
            )
        best_name = min(candidates, key=lambda k: candidates[k][0])

        if try_rcm and square and stats["ndiag"] > 48:
            perm, bw_after = self.rcm()
            # after RCM the matrix is banded with <= 2*bw+1 diagonals; only
            # worth it if the banded DIA beats the best unpermuted format
            ndiag_bound = 2 * bw_after + 1
            # real diagonal count can be far below the bound; compute it
            inv = np.empty(n, np.int64)
            inv[perm] = np.arange(n)
            ndiag_rcm = int(np.unique(inv[cols] - inv[rows]).size)
            dia_rcm_cost = float(ndiag_rcm) * n
            if dia_rcm_cost < candidates[best_name][0]:
                B = self.permute(perm)
                return B.to_dia(), perm

        op, _ = candidates[best_name][1]()
        return op, None

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr, self.row_ids), self._shape

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, indices, indptr, row_ids = leaves
        obj = object.__new__(cls)
        obj.data, obj.indices, obj.indptr, obj.row_ids = data, indices, indptr, row_ids
        obj._h_data = obj._h_indices = obj._h_indptr = obj._h_row_ids = None
        obj._shape = aux
        return obj


@jax.tree_util.register_pytree_node_class
class ELLMatrix(LinearOperator):
    """Padded fixed-width-row format: ``data``/``cols`` are (n, k); padding has
    ``cols = 0, data = 0`` so the gather stays in-bounds and contributes 0.

    ``rmv`` is scatter-based (segment-sum onto unsorted column ids) — slow on
    TPU.  Solvers that use the adjoint every iteration (lsqr/lsmr/qmr/svdl)
    should call :meth:`with_adjoint` once: it precomputes A^H in ELL form so
    the adjoint matvec is the same fast gather kernel (2x storage)."""

    def __init__(self, data, cols, shape, adj: "ELLMatrix | None" = None,
                 gather_chunk_rows: int | None = None):
        self._h_data = _keep_host(data)
        self._h_cols = _keep_host(cols, np.int32)
        self.data = jnp.asarray(data)
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self._shape = (int(shape[0]), int(shape[1]))
        self.adj = adj
        # optional gather chunking: bound the size of any single gather op
        # by splitting the (n, w) gather into row chunks (sequential ops).
        # Mitigation knob for backend faults under sustained monolithic
        # gather load at 1e7+-element gathers (BENCH_NOTES round 2: the
        # 1,048,576 x 262,144 svdl workload reproducibly crashed the
        # remote TPU worker); part of the pytree aux so traces are stable.
        self._gather_chunk_rows = (int(gather_chunk_rows)
                                   if gather_chunk_rows else None)

    def _host(self, name):
        h = getattr(self, "_h_" + name)
        return h if h is not None else np.asarray(getattr(self, name))

    def with_adjoint(self) -> "ELLMatrix":
        """Return a copy carrying a precomputed ELL-form adjoint."""
        if self.adj is not None:
            return self
        csr = self.to_csr()
        rows = csr._host("row_ids")
        cols = csr._host("indices")
        vals = np.conj(csr._host("data"))
        n, m = self._shape
        adj = CSRMatrix.from_coo(cols, rows, vals, (m, n)).to_ell()
        if self._gather_chunk_rows:
            adj = adj.with_chunked_gather(self._gather_chunk_rows)
        return ELLMatrix(self.data, self.cols, self._shape, adj=adj,
                         gather_chunk_rows=self._gather_chunk_rows)

    def with_chunked_gather(self, chunk_rows: int) -> "ELLMatrix":
        """Copy whose SpMV splits the row gather into ``chunk_rows`` chunks
        (see ``__init__``; adjoint, if present, is chunked too)."""
        adj = (self.adj.with_chunked_gather(chunk_rows)
               if self.adj is not None else None)
        return ELLMatrix(self.data, self.cols, self._shape, adj=adj,
                         gather_chunk_rows=chunk_rows)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def row_width(self):
        return int(self.data.shape[1])

    def astype(self, dtype) -> "ELLMatrix":
        """Copy with the stored values in ``dtype`` (structure unchanged)."""
        adj = self.adj.astype(dtype) if self.adj is not None else None
        return ELLMatrix(
            self._host("data").astype(dtype), self._host("cols"), self._shape,
            adj=adj, gather_chunk_rows=self._gather_chunk_rows,
        )

    def mv(self, x):
        # x: (m,) or (m, k) — gathered rows broadcast against the (n, w) data
        ck = self._gather_chunk_rows
        n = self.cols.shape[0]
        if ck and ck < n:
            outs = []
            for r0 in range(0, n, ck):
                hi = min(r0 + ck, n)
                c = jax.lax.slice_in_dim(self.cols, r0, hi)
                d = jax.lax.slice_in_dim(self.data, r0, hi)
                dd = d if x.ndim == 1 else d[..., None]
                outs.append(jnp.sum(dd * x[c], axis=1))
            return jnp.concatenate(outs)
        g = x[self.cols]  # (n, w) or (n, w, k)
        d = self.data if x.ndim == 1 else self.data[..., None]
        return jnp.sum(d * g, axis=1)

    def mv_rows(self, Xr):
        # ONE k-wide gather instead of k one-wide gathers: gather cost on
        # this part is ~8 ns per INDEX regardless of the fetched row width
        # (BENCH_NOTES r4 forensics), so gathering from the (n, k) layout
        # amortizes the dominant SpMV cost k-fold.  The two transposes are
        # bandwidth-trivial next to the index stream.
        return self.mv(Xr.T).T

    def rmv(self, x):
        if self.adj is not None:
            return self.adj.mv(x)
        d = jnp.conj(self.data) if x.ndim == 1 else jnp.conj(self.data)[..., None]
        vals = d * x[:, None]  # (n, w) or (n, w, k)
        flat = vals.reshape((-1,) + vals.shape[2:])
        return jax.ops.segment_sum(
            flat, self.cols.ravel(), num_segments=self._shape[1]
        )

    def to_dense(self):
        out = jnp.zeros(self._shape, dtype=self.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(self._shape[0])[:, None], self.cols.shape
        )
        return out.at[rows, self.cols].add(self.data)

    def to_csr(self) -> "CSRMatrix":
        data = self._host("data")
        cols = self._host("cols")
        n = self._shape[0]
        rows = np.broadcast_to(np.arange(n)[:, None], cols.shape)
        mask = data != 0
        return CSRMatrix.from_coo(rows[mask], cols[mask], data[mask], self._shape)

    def tree_flatten(self):
        return (self.data, self.cols, self.adj), (self._shape,
                                                  self._gather_chunk_rows)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.data, obj.cols, obj.adj = leaves
        obj._h_data = obj._h_cols = None
        obj._shape, obj._gather_chunk_rows = aux
        return obj


@jax.tree_util.register_pytree_node_class
class HYBMatrix(LinearOperator):
    """Hybrid ELL + COO-tail format for skewed row-degree distributions.

    Plain ELL pads every row to the **maximum** degree, so a handful of heavy
    rows multiply the gathered-element count of the whole SpMV (on the
    symmetrized-sprand GMRES benchmark matrix, ELL gathers 2.7x nnz — the
    gather is the TPU SpMV bottleneck, ~7 ns/element).  HYB keeps the first
    ``w`` entries of each row in ELL form (uniform gather, full VPU lanes)
    and spills the overflow into a small row-sorted COO tail combined with a
    sorted ``segment_sum``.  :meth:`CSRMatrix.to_hyb` picks ``w`` by cost
    model.  ``with_adjoint`` precomputes A^H in HYB form so the adjoint
    matvec is the same fast kernel (mirrors :class:`ELLMatrix`).
    """

    def __init__(self, ell: ELLMatrix, tail_rows, tail_cols, tail_vals,
                 shape, adj: "HYBMatrix | None" = None):
        self.ell = ell
        self._h_tail_rows = _keep_host(tail_rows, np.int32)
        self._h_tail_cols = _keep_host(tail_cols, np.int32)
        self._h_tail_vals = _keep_host(tail_vals)
        self.tail_rows = jnp.asarray(tail_rows, dtype=jnp.int32)
        self.tail_cols = jnp.asarray(tail_cols, dtype=jnp.int32)
        self.tail_vals = jnp.asarray(tail_vals)
        self._shape = (int(shape[0]), int(shape[1]))
        self.adj = adj

    def _host(self, name):
        h = getattr(self, "_h_" + name)
        return h if h is not None else np.asarray(getattr(self, name))

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.ell.dtype

    @property
    def tail_nnz(self):
        return int(self.tail_vals.shape[0])

    def astype(self, dtype) -> "HYBMatrix":
        """Copy with the stored values in ``dtype`` (structure unchanged)."""
        adj = self.adj.astype(dtype) if self.adj is not None else None
        return HYBMatrix(
            self.ell.astype(dtype), self._host("tail_rows"),
            self._host("tail_cols"), self._host("tail_vals").astype(dtype),
            self._shape, adj=adj,
        )

    def mv(self, x):
        y = self.ell.mv(x)
        if self.tail_vals.shape[0] == 0:
            return y
        v = self.tail_vals if x.ndim == 1 else self.tail_vals[:, None]
        contrib = v * x[self.tail_cols]
        return y + jax.ops.segment_sum(
            contrib, self.tail_rows, num_segments=self._shape[0],
            indices_are_sorted=True,
        )

    def mv_rows(self, Xr):
        # k-wide amortized gather, see ELLMatrix.mv_rows
        return self.mv(Xr.T).T

    def rmv(self, x):
        if self.adj is not None:
            return self.adj.mv(x)
        y = self.ell.rmv(x)
        if self.tail_vals.shape[0] == 0:
            return y
        v = jnp.conj(self.tail_vals)
        v = v if x.ndim == 1 else v[:, None]
        contrib = v * x[self.tail_rows]
        return y + jax.ops.segment_sum(
            contrib, self.tail_cols, num_segments=self._shape[1]
        )

    def with_adjoint(self) -> "HYBMatrix":
        """Return a copy carrying a precomputed HYB-form adjoint."""
        if self.adj is not None:
            return self
        csr = self.to_csr()
        rows = csr._host("row_ids")
        cols = csr._host("indices")
        vals = np.conj(csr._host("data"))
        n, m = self._shape
        adj = CSRMatrix.from_coo(cols, rows, vals, (m, n)).to_hyb()
        return HYBMatrix(self.ell, self.tail_rows, self.tail_cols,
                         self.tail_vals, self._shape, adj=adj)

    def to_dense(self):
        out = self.ell.to_dense()
        if self.tail_vals.shape[0] == 0:
            return out
        return out.at[self.tail_rows, self.tail_cols].add(self.tail_vals)

    def to_csr(self) -> "CSRMatrix":
        data = self.ell._host("data")
        cols = self.ell._host("cols")
        n = self._shape[0]
        rows = np.broadcast_to(np.arange(n)[:, None], cols.shape)
        mask = data != 0
        all_rows = np.concatenate([rows[mask], self._host("tail_rows")])
        all_cols = np.concatenate([cols[mask], self._host("tail_cols")])
        all_vals = np.concatenate([data[mask], self._host("tail_vals")])
        return CSRMatrix.from_coo(all_rows, all_cols, all_vals, self._shape)

    def tree_flatten(self):
        leaves = (self.ell, self.tail_rows, self.tail_cols, self.tail_vals, self.adj)
        return leaves, self._shape

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.ell, obj.tail_rows, obj.tail_cols, obj.tail_vals, obj.adj = leaves
        obj._h_tail_rows = obj._h_tail_cols = obj._h_tail_vals = None
        obj._shape = aux
        return obj


@jax.tree_util.register_pytree_node_class
class DIAMatrix(LinearOperator):
    """Diagonal storage: ``data[k, i] = A[i, i + offsets[k]]`` (0 where the
    column index falls outside the matrix).  ``offsets`` is static, so the
    SpMV unrolls into `ndiag` shifted multiply-adds that XLA fuses into a
    single VPU pass — no gathers, pure streaming HBM traffic.

    The diagonals are stored as a **tuple of 1-D arrays**, not one
    (ndiag, n) array: TPU tiles 2-D f32 arrays (8, 128), so row-slicing a
    (7, n) argument reads all 8 sublanes of every tile — each diagonal read
    would pull the entire array (measured 6.5x slowdown in the CG loop).
    1-D leaves are contiguous and stream at full HBM bandwidth."""

    def __init__(self, data, offsets: Tuple[int, ...], shape):
        if isinstance(data, (tuple, list)):
            self._h_diags = tuple(_keep_host(d) for d in data)
            self.diags = tuple(jnp.asarray(d) for d in data)
        else:
            host = np.asarray(data) if not isinstance(data, jax.Array) else data
            self._h_diags = tuple(
                _keep_host(host[k]) for k in range(host.shape[0])
            )
            self.diags = tuple(jnp.asarray(host[k]) for k in range(host.shape[0]))
        self.offsets = tuple(int(o) for o in offsets)
        self._shape = (int(shape[0]), int(shape[1]))

    def _host_diag(self, k):
        h = self._h_diags[k]
        return h if h is not None else np.asarray(self.diags[k])

    @property
    def data(self):
        """(ndiag, n) view for host-side inspection (not the storage)."""
        return jnp.stack(self.diags)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.diags[0].dtype

    def astype(self, dtype) -> "DIAMatrix":
        """Copy with the diagonals stored in ``dtype``.  The SpMV promotes
        each product to ``result_type(dtype, x.dtype)``, so a bf16-valued
        matrix applied to an f32 vector still accumulates in f32 — only the
        HBM value stream narrows (the point: the diagonals are the dominant
        stream of the DIA SpMV)."""
        return DIAMatrix(
            tuple(self._host_diag(k).astype(dtype)
                  for k in range(len(self.diags))),
            self.offsets, self._shape,
        )

    def mv(self, x):
        # x: (m,) or (m, k) — shifted multiply-adds along axis 0
        n, m = self._shape
        pad = max(max((abs(o) for o in self.offsets), default=0), 1)
        xp = jnp.pad(x, ((pad, pad + max(n - m, 0)),) + ((0, 0),) * (x.ndim - 1))
        y = jnp.zeros((n,) + x.shape[1:], dtype=jnp.result_type(self.dtype, x.dtype))
        for k, off in enumerate(self.offsets):
            # row i reads x[i + off]  ->  slice xp starting at pad + off
            d = self.diags[k] if x.ndim == 1 else self.diags[k][:, None]
            y = y + d * jax.lax.dynamic_slice_in_dim(xp, pad + off, n, axis=0)
        return y

    def mv_rows(self, Xr):
        return jax.vmap(self.mv)(Xr)

    def rmv(self, x):
        n, m = self._shape
        pad = max(max((abs(o) for o in self.offsets), default=0), 1)
        y = jnp.zeros(
            (m + 2 * pad + max(n - m, 0),) + x.shape[1:],
            dtype=jnp.result_type(self.dtype, x.dtype),
        )
        for k, off in enumerate(self.offsets):
            # (A^H x)[i + off] += conj(data[k, i]) * x[i]
            dk = self.diags[k]
            d = jnp.conj(dk) if x.ndim == 1 else jnp.conj(dk)[:, None]
            contrib = d * x
            y = jax.lax.dynamic_update_slice_in_dim(
                y,
                jax.lax.dynamic_slice_in_dim(y, pad + off, n, axis=0) + contrib,
                pad + off,
                axis=0,
            )
        return y[pad : pad + m]

    def to_dense(self):
        n, m = self._shape
        out = jnp.zeros(self._shape, dtype=self.dtype)
        rows = jnp.arange(n)
        for k, off in enumerate(self.offsets):
            cols = rows + off
            valid = (cols >= 0) & (cols < m)
            out = out.at[rows, jnp.clip(cols, 0, m - 1)].add(
                jnp.where(valid, self.diags[k], 0)
            )
        return out

    def to_csr(self) -> "CSRMatrix":
        n, m = self._shape
        all_rows, all_cols, all_vals = [], [], []
        i = np.arange(n)
        for k, off in enumerate(self.offsets):
            dk = self._host_diag(k)
            cols = i + off
            mask = (cols >= 0) & (cols < m) & (dk != 0)
            all_rows.append(i[mask])
            all_cols.append(cols[mask])
            all_vals.append(dk[mask])
        return CSRMatrix.from_coo(
            np.concatenate(all_rows), np.concatenate(all_cols),
            np.concatenate(all_vals), self._shape,
        )

    def diagonal(self):
        """DIA storage cannot distinguish a structurally-missing diagonal
        entry from an explicit zero (to_dia stores 0 either way), so the
        presence mask is ``d != 0`` — which matches the check's purpose
        exactly: the reference's DiagonalIndices throws SingularException
        for missing OR zero entries alike (src/stationary_sparse.jl:18-28)."""
        if 0 not in self.offsets:
            d = np.zeros(min(self._shape), dtype=self.dtype)
            return d, np.zeros(min(self._shape), dtype=bool)
        k = self.offsets.index(0)
        d = self._host_diag(k)[: min(self._shape)]
        return d, np.asarray(d) != 0

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self._shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        (obj.diags,) = leaves
        obj._h_diags = tuple(None for _ in obj.diags)
        obj.offsets, obj._shape = aux
        return obj


@jax.tree_util.register_pytree_node_class
class BSRMatrix(LinearOperator):
    """Block compressed sparse row: ``blocks`` (nblk, bs, bs) dense blocks,
    ``block_cols`` (nblk,) block-column ids, ``block_row_ids`` (nblk,) sorted
    block-row ids.  SpMV gathers x blocks and runs one batched (nblk, bs, bs)
    x (nblk, bs) matmul on the MXU, then a segment-sum over block rows —
    the TPU-native format for FEM/multi-dof stencil matrices (SURVEY §2.5
    lists BSR among the native-op equivalents)."""

    def __init__(self, blocks, block_cols, block_row_ids, shape):
        self.blocks = jnp.asarray(blocks)
        self.block_cols = jnp.asarray(block_cols, jnp.int32)
        self.block_row_ids = jnp.asarray(block_row_ids, jnp.int32)
        self._shape = (int(shape[0]), int(shape[1]))
        bs = int(self.blocks.shape[1])
        if shape[0] % bs or shape[1] % bs:
            raise ValueError("matrix shape must be divisible by the block size")

    @classmethod
    def from_csr(cls, csr: "CSRMatrix", block_size: int) -> "BSRMatrix":
        n, m = csr.shape
        bs = int(block_size)
        if n % bs or m % bs:
            raise ValueError("matrix shape must be divisible by the block size")
        rows = csr._host("row_ids").astype(np.int64)
        cols = csr._host("indices").astype(np.int64)
        vals = csr._host("data")
        brows = rows // bs
        bcols = cols // bs
        keys = brows * (m // bs) + bcols
        uniq, inv = np.unique(keys, return_inverse=True)
        nblk = uniq.size
        blocks = np.zeros((nblk, bs, bs), vals.dtype)
        blocks[inv, rows % bs, cols % bs] = vals
        return cls(blocks, (uniq % (m // bs)), (uniq // (m // bs)), (n, m))

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def block_size(self):
        return int(self.blocks.shape[1])

    @property
    def nnz(self):
        return int(np.prod(self.blocks.shape))

    def astype(self, dtype) -> "BSRMatrix":
        """Copy with the stored blocks in ``dtype`` (structure unchanged)."""
        return BSRMatrix(
            np.asarray(self.blocks).astype(dtype), self.block_cols,
            self.block_row_ids, self._shape,
        )

    def mv(self, x):
        bs = self.block_size
        nb_rows = self._shape[0] // bs
        xb = x.reshape(self._shape[1] // bs, bs, *x.shape[1:])
        g = xb[self.block_cols]                       # (nblk, bs[, k])
        # batched block matmul on the MXU
        prod = jnp.einsum("nij,nj...->ni...", self.blocks, g)
        yb = jax.ops.segment_sum(
            prod, self.block_row_ids, num_segments=nb_rows,
            indices_are_sorted=True,
        )
        return yb.reshape(self._shape[0], *x.shape[1:])

    def mv_rows(self, Xr):
        # k-wide amortized block gather, see ELLMatrix.mv_rows
        return self.mv(Xr.T).T

    def rmv(self, x):
        bs = self.block_size
        nb_cols = self._shape[1] // bs
        xb = x.reshape(self._shape[0] // bs, bs, *x.shape[1:])
        g = xb[self.block_row_ids]
        prod = jnp.einsum("nji,nj...->ni...", jnp.conj(self.blocks), g)
        yb = jax.ops.segment_sum(prod, self.block_cols, num_segments=nb_cols)
        return yb.reshape(self._shape[1], *x.shape[1:])

    def to_dense(self):
        bs = self.block_size
        out = jnp.zeros(self._shape, self.dtype)
        for i in range(self.blocks.shape[0]):
            r = self.block_row_ids[i] * bs
            c = self.block_cols[i] * bs
            out = jax.lax.dynamic_update_slice(out, self.blocks[i], (r, c))
        return out

    def tree_flatten(self):
        return (self.blocks, self.block_cols, self.block_row_ids), self._shape

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.blocks, obj.block_cols, obj.block_row_ids = leaves
        obj._shape = aux
        return obj


def csr_from_dense(mat, tol: float = 0.0) -> CSRMatrix:
    mat = np.asarray(mat)
    rows, cols = np.nonzero(np.abs(mat) > tol)
    return CSRMatrix.from_coo(rows, cols, mat[rows, cols], mat.shape)


def dia_from_dense(mat) -> DIAMatrix:
    return csr_from_dense(mat).to_dia()


def _host_value_arrays(A):
    """The stored value arrays of a sparse-format operator, as host arrays."""
    if isinstance(A, DIAMatrix):
        return [A._host_diag(k) for k in range(len(A.diags))]
    if isinstance(A, HYBMatrix):
        return [A.ell._host("data"), A._host("tail_vals")]
    if isinstance(A, ELLMatrix):
        return [A._host("data")]
    if isinstance(A, CSRMatrix):
        return [A._host("data")]
    if isinstance(A, BSRMatrix):
        return [np.asarray(A.blocks)]
    raise TypeError(f"not a stored sparse format: {type(A).__name__}")


def values_representable(A, dtype) -> bool:
    """True iff every stored value of ``A`` round-trips
    ``A.dtype -> dtype -> A.dtype`` bit-exactly.

    Constant-coefficient discretizations (Laplacians, advection stencils,
    graph Laplacians with small-integer weights) typically store values that
    are exact in bfloat16 — for those matrices :func:`compress_values` is a
    pure bandwidth optimization with zero numerical effect, since every
    SpMV product promotes back to the vector dtype before accumulating."""
    dt = np.dtype(dtype)
    for v in _host_value_arrays(A):
        w = np.asarray(v)
        if np.issubdtype(w.dtype, np.complexfloating) and not np.issubdtype(
                dt, np.complexfloating):
            # complex -> real narrowing silently drops imaginary parts in
            # numpy casts; never treat it as representable
            return False
        if not np.array_equal(w.astype(dt).astype(w.dtype), w):
            return False
    return True


def compress_values(A, dtype=None, require_exact: bool = True):
    """Narrow the stored-value stream of a sparse-format operator.

    With ``dtype=None`` (default) picks the NARROWEST exact dtype from the
    ladder int8 -> bfloat16 (integer-valued matrices quarter the stream,
    bf16-representable ones halve it) and returns ``A`` unchanged when
    neither is exact.  With an explicit ``dtype``, returns ``A.astype(dtype)``
    when the values are exactly representable in it (or when
    ``require_exact=False`` — an explicit opt-in to a perturbed matrix),
    otherwise ``A`` unchanged.

    The matvec output dtype is unaffected: products promote to
    ``result_type(value_dtype, x.dtype)``, so f32 solves stay f32 end to end
    while the dominant HBM stream (the matrix values) narrows.  Measured on
    the 10M-row 3-D Laplacian: CG 746 (f32) -> 582 (bf16) -> 486 us/iter
    (int8), identical solutions (BENCH_NOTES round 3).  No reference
    analogue — this exploits the TPU's native low-precision datapaths; the
    reference's CSC kernels are eltype-generic but never mix value/vector
    precision (src/stationary_sparse.jl)."""
    if dtype is None:
        for cand in (jnp.int8, jnp.bfloat16):
            if values_representable(A, cand):
                return A.astype(cand)
        return A
    if require_exact and not values_representable(A, dtype):
        return A
    return A.astype(dtype)
