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
    "ILUPreconditioner",
    "ICPreconditioner",
    "RedBlackICPreconditioner",
    "EisenstatSSOROperator",
    "as_preconditioner",
    "is_identity",
]


class Preconditioner:
    def ldiv(self, x):
        raise NotImplementedError

    def ldiv_rows(self, Xr):
        """Apply to a (k, n) ROW panel (vectors as rows — the TPU block
        layout).  Default: vmap the single-vector apply; preconditioners
        with a cheaper native block form override (RedBlackIC: one fused
        pass over the panel instead of k separate shift pipelines)."""
        return jax.vmap(self.ldiv)(Xr)

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


def _multicolor_perm(csr):
    """Greedy-multicolor permutation of a CSR pattern: rows grouped by color
    (stable within a color).  An ILU(0)/IC(0) factor of the PERMUTED matrix
    has no fill, and rows of one color share no edge, so every row's
    triangular-solve dependencies sit in earlier colors — the level schedule
    of the factor collapses to <= ncolors parallel fronts (2 for red-black
    grids) instead of the O(n^{1/3}) anti-diagonal fronts natural ordering
    yields on 3-D stencils.  The permuted factorization is a (well-known)
    slightly weaker preconditioner per iteration; it exists to make the
    APPLY wall-clock-parallel on TPU (VERDICT r3 item 4)."""
    import numpy as np

    from ..solvers.stationary import _color_classes

    color, nc = _color_classes(csr)
    perm = np.argsort(np.asarray(color), kind="stable").astype(np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm, inv, nc


@jax.tree_util.register_pytree_node_class
class ILUPreconditioner(Preconditioner):
    """ILU(0): incomplete LU with zero fill on A's sparsity pattern.

    The reference ships no incomplete factorizations (its docs point users
    at external ILU packages, docs/src/preconditioning.md; its tests build
    an inexact LU via ``lu(droptol!(...))``, test/idrs.jl:54-60) — this is
    the TPU-native equivalent capability.  Factorization runs once on the
    host (native C++ IKJ pass, numpy fallback for complex); the apply is
    two level-scheduled triangular sweeps on device, the same kernel the
    sparse Gauss-Seidel/SOR solvers use (ops/triangular.py).

    ``ordering="multicolor"`` factors the multicolor-permuted matrix instead
    (see ``_multicolor_perm``): the level count of the apply collapses to
    the color count, trading a few extra Krylov iterations for a
    wall-clock-parallel sweep — the right default at n >= ~1e6 on TPU.

    For matrices whose exact LU has no fill (e.g. tridiagonal), ILU(0) IS
    the exact factorization and preconditioned solvers converge in O(1)
    iterations.  Note the ILU apply is nonsymmetric even for SPD A — use
    :class:`ICPreconditioner` with ``cg``/``minres``.
    """

    def __init__(self, lower_solve, upper_solve, perm=None, inv=None):
        self.lower_solve = lower_solve
        self.upper_solve = upper_solve
        self.perm = perm
        self.inv = inv

    @property
    def nlevels(self):
        """Sequential fronts per triangular sweep (the apply's depth)."""
        return max(self.lower_solve.nlevels, self.upper_solve.nlevels)

    @classmethod
    def from_operator(cls, A, ordering: str = "natural") -> "ILUPreconditioner":
        import numpy as np

        from ..native import ilu0
        from ..ops.triangular import LevelScheduledTriangular
        from .sparse import CSRMatrix

        csr = A if isinstance(A, CSRMatrix) else A.to_csr()
        n, m = csr.shape
        if n != m:
            raise ValueError("ILU(0) needs a square operator")
        perm = inv = None
        if ordering == "multicolor":
            perm, inv, _nc = _multicolor_perm(csr)
            csr = csr.permute(perm)
        elif ordering != "natural":
            raise ValueError(f"unknown ordering {ordering!r}")
        indptr = np.asarray(csr._host("indptr"))
        indices = np.asarray(csr._host("indices"))
        rows = np.asarray(csr._host("row_ids"))
        f = ilu0(indptr, indices, np.asarray(csr._host("data")), n)

        lmask = indices < rows
        umask = indices > rows
        dmask = indices == rows
        lcsr = CSRMatrix.from_coo(rows[lmask], indices[lmask], f[lmask], (n, n))
        ucsr = CSRMatrix.from_coo(rows[umask], indices[umask], f[umask], (n, n))
        lower = LevelScheduledTriangular.from_csr(
            np.asarray(lcsr._host("indptr")), np.asarray(lcsr._host("indices")),
            np.asarray(lcsr._host("data")), np.ones(n, f.dtype), lower=True)
        upper = LevelScheduledTriangular.from_csr(
            np.asarray(ucsr._host("indptr")), np.asarray(ucsr._host("indices")),
            np.asarray(ucsr._host("data")), f[dmask], lower=False)
        return cls(lower, upper,
                   None if perm is None else jnp.asarray(perm, jnp.int32),
                   None if inv is None else jnp.asarray(inv, jnp.int32))

    @classmethod
    def block_jacobi(cls, A, nblocks: int) -> "ILUPreconditioner":
        """Block-Jacobi ILU(0): drop every entry crossing a block boundary
        (contiguous row blocks of ~n/nblocks) and ILU(0)-factor the
        block-diagonal remainder.  The factorization decouples per block, so
        the level schedule runs all blocks' levels in parallel — the level
        count drops from O(depth(A)) to O(depth(largest block)), and with
        ``nblocks`` equal to the device count the apply is shard-local (the
        classic distributed preconditioner; weaker than global ILU(0) by the
        dropped couplings, cheaper and communication-free per application)."""
        import numpy as np

        from .sparse import CSRMatrix

        csr = A if isinstance(A, CSRMatrix) else A.to_csr()
        n = csr.shape[0]
        rows = np.asarray(csr._host("row_ids")).astype(np.int64)
        cols = np.asarray(csr._host("indices")).astype(np.int64)
        vals = np.asarray(csr._host("data"))
        bs = -(-n // int(nblocks))
        keep = (rows // bs) == (cols // bs)
        blockdiag = CSRMatrix.from_coo(rows[keep], cols[keep], vals[keep],
                                       csr.shape)
        return cls.from_operator(blockdiag)

    def ldiv(self, x):
        # both orderings return the promoted solve dtype (the triangular
        # sweeps promote x with the factor dtype) — no downcast on either
        # branch, so f64 factors on f32 x behave identically permuted or not
        if self.perm is not None:
            xp = x[self.perm]
            y = self.upper_solve.solve(self.lower_solve.solve(xp))
            return y[self.inv]
        return self.upper_solve.solve(self.lower_solve.solve(x))

    def tree_flatten(self):
        return (self.lower_solve, self.upper_solve, self.perm, self.inv), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
class ICPreconditioner(Preconditioner):
    """IC(0): incomplete Cholesky on the lower-triangular pattern of an SPD
    (or Hermitian positive-definite) A, applied as L^{-H} L^{-1} — a
    symmetric preconditioner safe for ``cg``/``minres``/``lobpcg``.
    Raises ``ZeroDivisionError`` on breakdown (non-positive pivot); shifted
    variants can be built by passing ``A + alpha*I``.

    ``ordering="multicolor"`` factors the multicolor-permuted matrix: the
    symmetric permutation preserves SPD-ness, and the apply's level count
    collapses to the color count (see :class:`ILUPreconditioner`)."""

    def __init__(self, lower_solve, upper_solve, perm=None, inv=None):
        self.lower_solve = lower_solve
        self.upper_solve = upper_solve
        self.perm = perm
        self.inv = inv

    @property
    def nlevels(self):
        """Sequential fronts per triangular sweep (the apply's depth)."""
        return max(self.lower_solve.nlevels, self.upper_solve.nlevels)

    @classmethod
    def from_operator(cls, A, ordering: str = "natural") -> "ICPreconditioner":
        import numpy as np

        from ..native import ic0
        from ..ops.triangular import LevelScheduledTriangular
        from .sparse import CSRMatrix

        csr = A if isinstance(A, CSRMatrix) else A.to_csr()
        n, m = csr.shape
        if n != m:
            raise ValueError("IC(0) needs a square operator")
        perm = inv = None
        if ordering == "multicolor":
            perm, inv, _nc = _multicolor_perm(csr)
            csr = csr.permute(perm)
        elif ordering != "natural":
            raise ValueError(f"unknown ordering {ordering!r}")
        indptr = np.asarray(csr._host("indptr"))
        indices = np.asarray(csr._host("indices"))
        rows = np.asarray(csr._host("row_ids"))
        vals = np.asarray(csr._host("data"))
        keep = indices <= rows     # lower triangle incl. diagonal; CSR column
        lrows, lcols, lvals = rows[keep], indices[keep], vals[keep]
        lp = np.zeros(n + 1, np.int64)
        np.add.at(lp, lrows + 1, 1)
        lp = np.cumsum(lp)         # order preserved: sorted, diagonal last
        g = ic0(lp, lcols.astype(np.int32), lvals, n)

        strict = lcols < lrows
        gdiag = g[~strict]         # one per row, row order
        lcsr = CSRMatrix.from_coo(lrows[strict], lcols[strict], g[strict],
                                  (n, n))
        # L^H: transpose + conjugate of the strict part; diag is real
        ucsr = CSRMatrix.from_coo(lcols[strict], lrows[strict],
                                  np.conj(g[strict]), (n, n))
        lower = LevelScheduledTriangular.from_csr(
            np.asarray(lcsr._host("indptr")), np.asarray(lcsr._host("indices")),
            np.asarray(lcsr._host("data")), gdiag, lower=True)
        upper = LevelScheduledTriangular.from_csr(
            np.asarray(ucsr._host("indptr")), np.asarray(ucsr._host("indices")),
            np.asarray(ucsr._host("data")), gdiag, lower=False)
        return cls(lower, upper,
                   None if perm is None else jnp.asarray(perm, jnp.int32),
                   None if inv is None else jnp.asarray(inv, jnp.int32))

    def ldiv(self, x):
        # same dtype policy on both orderings (see ILUPreconditioner.ldiv)
        if self.perm is not None:
            xp = x[self.perm]
            y = self.upper_solve.solve(self.lower_solve.solve(xp))
            return y[self.inv]
        return self.upper_solve.solve(self.lower_solve.solve(x))

    def tree_flatten(self):
        return (self.lower_solve, self.upper_solve, self.perm, self.inv), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
class RedBlackICPreconditioner(Preconditioner):
    """GATHER-FREE IC(0) for symmetric axis-aligned stencil operators.

    In red-black (checkerboard) ordering, a unit-step stencil has no
    same-color couplings, so the IC(0) factor of the RB-ordered matrix has
    a closed form: red rows of L are purely diagonal (sqrt of the center),
    black rows couple only to red — the factorization AND both triangular
    solves reduce to masked SHIFTED READS of full-length vectors, the same
    access pattern as the stencil SpMV itself.  No host factorization, no
    level schedule, no gathers: the apply is ~2 stencil passes, which on
    this TPU worker is ~1000x cheaper than a gather/scatter level sweep at
    n = 1e6 (BENCH_NOTES round 4: the level-scheduled IC apply is
    gather-bound at ~8 ns per nnz, making large preconditioned solves
    SLOWER than unpreconditioned; this class is the fix).

    Algebra (A = C·I + sum_o a_o S_o with S_o the masked unit shifts,
    parity(f+o) != parity(f) for every term):
      L_rr = sqrt(C)                       (red diagonal)
      L_br = a_o / sqrt(C)                 (black-red couplings)
      L_bb = sqrt(C - sum_o a_o^2 m_o / C) (black diagonal; m_o = Dirichlet
                                            mask — the only data computed)
    This IS the exact IC(0) of the RB-ordered matrix (equality with the
    native sequential ic0 factorization is tested), i.e. the multicolor
    variant of :class:`ICPreconditioner` specialized to stencils — same
    preconditioner quality, none of the apply cost.

    Supports :class:`~.stencil.StencilOperator` whose terms are symmetric
    unit steps (|offset| == stride, matching +/- coefficients) — the
    Laplacian / diffusion fixture family.  ``shift`` adds ``shift*I``
    to the operator before factorization (diagonal compensation).
    """

    def __init__(self, terms, mcs, center, s_inv, red):
        self.terms = terms          # static ((offset, stride, extent), ...)
        self.mcs = mcs              # (n,) PRE-MASKED coefficient per term:
        # mc_o = a_o where the shifted read stays on-grid, 0 at Dirichlet
        # boundaries — stored instead of recomputing the index-arithmetic
        # masks per apply (integer div/mod over n per term measured ~12 ms
        # per vector ldiv at n = 1e6 on v5e; streaming 4 MB/term is ~6 us)
        self.center = center
        self.s_inv = s_inv          # (n,) 1/sqrt(diag of L)^2 pointwise
        self.red = red              # (n,) bool parity mask

    @classmethod
    def from_stencil(cls, st, shift: float = 0.0) -> "RedBlackICPreconditioner":
        from .stencil import StencilOperator

        import numpy as np

        if not isinstance(st, StencilOperator):
            raise TypeError("RedBlackICPreconditioner wraps a StencilOperator")
        n = st.n
        by_axis = {}
        for (o, s, e), c in zip(st.terms, st.coeffs):
            if abs(o) != s:
                raise ValueError(
                    f"term (offset={o}, stride={s}): only unit steps "
                    "(|offset| == stride) alternate parity")
            by_axis.setdefault((s, e), {})[int(np.sign(o))] = c
        for (s, e), pair in by_axis.items():
            if set(pair) != {-1, 1}:
                raise ValueError("stencil must have symmetric +/- terms")
            if float(pair[1]) != float(pair[-1]):
                raise ValueError("stencil must be symmetric (a_+o == a_-o)")
        i = jax.lax.iota(jnp.int32, n)
        p = jnp.zeros(n, jnp.int32)
        for (s, e) in by_axis:
            p = p + (i // s) % e
        red = (p % 2) == 0
        center = st.center + jnp.asarray(shift, st.center.dtype)
        # e_black = C - sum_o a_o^2 m_o / C ; m_o masks off-grid neighbors;
        # mc_o = a_o m_o is stored as the per-term masked coefficient stream
        acc = jnp.zeros(n, center.dtype)
        mcs = []
        for (o, s, e), c in zip(st.terms, st.coeffs):
            pos = (i // s) % e
            step = o // s
            valid = (pos + step >= 0) & (pos + step < e)
            acc = acc + jnp.where(valid, c * c, 0)
            mcs.append(jnp.where(valid, c, 0).astype(center.dtype))
        e_vec = jnp.where(red, center, center - acc / center)
        if bool(jnp.any(e_vec <= 0)):
            raise ZeroDivisionError(
                "red-black IC(0) breakdown: non-positive pivot; increase "
                "`shift`")
        return cls(st.terms, tuple(mcs), center,
                   1.0 / jnp.sqrt(e_vec), red)

    @classmethod
    def from_dia(cls, dia, side: int, dims: int,
                 shift: float = 0.0) -> "RedBlackICPreconditioner":
        """Variable-coefficient form: the same closed-form RB IC(0) for a
        unit-step :class:`~.sparse.DIAMatrix` on a ``side^dims`` grid (the
        :func:`~..utils.fixtures.variable_diffusion` family).  The only
        change vs :meth:`from_stencil` is that the coefficient streams and
        the center are per-row arrays, and the black pivot divides by the
        NEIGHBOR's center: ``e_b = D_b - sum_o a_o(b)^2 / D_{b+o}`` (for a
        constant center the two coincide).  The apply is unchanged — it
        already reads the neighbor's scale through the shifted pass."""
        import numpy as np

        from .sparse import DIAMatrix

        if not isinstance(dia, DIAMatrix):
            raise TypeError("from_dia wraps a DIAMatrix")
        n = dia.shape[0]
        if side**dims != n:
            raise ValueError(f"side^dims = {side**dims} != n = {n}")
        strides = {side**k for k in range(dims)}
        offs = [o for o in dia.offsets if o != 0]
        if 0 not in dia.offsets or {abs(o) for o in offs} - strides:
            raise ValueError(
                "DIA offsets must be {0} U {+-side^k} (unit grid steps)")
        by_off = {o: dia.diags[i] for i, o in enumerate(dia.offsets)}
        center = by_off[0] + jnp.asarray(shift, by_off[0].dtype)
        i = jax.lax.iota(jnp.int32, n)
        p = jnp.zeros(n, jnp.int32)
        for s in sorted(strides):
            p = p + (i // s) % side
        red = (p % 2) == 0
        # symmetry check on the stored streams: A[i, i+o] == A[i+o, i]
        terms = []
        mcs = []
        pad = max(abs(o) for o in offs)
        cpad = jnp.pad(center, (pad, pad))
        acc = jnp.zeros(n, center.dtype)
        for o in offs:
            c = by_off[o].astype(center.dtype)
            other = by_off.get(-o)
            if other is None:
                raise ValueError(f"offset {o} has no symmetric partner")
            c_T = jnp.roll(other, -o)  # A[i+o, i] laid back onto row i
            if not bool(jnp.allclose(jnp.where(c != 0, c_T, 0), c,
                                     rtol=1e-6, atol=0)):
                raise ValueError("DIA matrix is not symmetric")
            terms.append((int(o), abs(int(o)), side))
            mcs.append(c)
            nb_center = jax.lax.dynamic_slice_in_dim(cpad, pad + o, n)
            acc = acc + jnp.where(c != 0, c * c / nb_center, 0)
        e_vec = jnp.where(red, center, center - acc)
        if bool(jnp.any(e_vec <= 0)):
            raise ZeroDivisionError(
                "red-black IC(0) breakdown: non-positive pivot; increase "
                "`shift`")
        return cls(tuple(terms), tuple(mcs), center,
                   1.0 / jnp.sqrt(e_vec), red)

    def _shift_sum(self, u, axis: int = 0):
        """sum_o mc_o * shift(u, o) — one padded pass over pre-masked
        coefficient streams (the DIA SpMV access pattern).  ``axis`` is the
        length-n axis (1 for (k, n) row panels)."""
        n = u.shape[axis]
        pad = max(abs(o) for (o, _, _) in self.terms)
        padw = [(0, 0)] * u.ndim
        padw[axis] = (pad, pad)
        up = jnp.pad(u, padw)
        acc = jnp.zeros_like(u)
        for (o, _, _), mc in zip(self.terms, self.mcs):
            if u.ndim == 1:
                m = mc
            else:
                m = mc[:, None] if axis == 0 else mc[None, :]
            shifted = jax.lax.dynamic_slice_in_dim(up, pad + o, n, axis=axis)
            acc = acc + m * shifted
        return acc

    def ldiv(self, x):
        s = self.s_inv if x.ndim == 1 else self.s_inv[:, None]
        red = self.red if x.ndim == 1 else self.red[:, None]
        # L solve: y_r = x_r s_r ; y_b = (x_b - sum_o a_o u[+o]) s_b with
        # u = y_r s_r at red slots (L_br = a_o s_r)
        u = jnp.where(red, x * s * s, 0)
        y = jnp.where(red, x * s, (x - self._shift_sum(u)) * s)
        # L^T solve: z_b = y_b s_b ; z_r = (y_r - s_r sum_o a_o v[+o]) s_r
        # with v = z_b at black slots
        v = jnp.where(red, 0, y * s)
        z = jnp.where(red, (y - s * self._shift_sum(v)) * s, y * s)
        return z.astype(x.dtype)

    def ldiv_rows(self, Xr):
        """Native (k, n) row-panel apply: ONE fused shift pipeline over the
        whole block (vectors as rows, shifts along the minor axis) — the
        panel layout every block solver here uses (CLAUDE.md rule)."""
        s = self.s_inv[None, :]
        red = self.red[None, :]
        u = jnp.where(red, Xr * s * s, 0)
        y = jnp.where(red, Xr * s, (Xr - self._shift_sum(u, axis=1)) * s)
        v = jnp.where(red, 0, y * s)
        z = jnp.where(red, (y - s * self._shift_sum(v, axis=1)) * s, y * s)
        return z.astype(Xr.dtype)

    def tree_flatten(self):
        return (self.mcs, self.center, self.s_inv, self.red), self.terms

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mcs, center, s_inv, red = leaves
        return cls(aux, mcs, center, s_inv, red)


@jax.tree_util.register_pytree_node_class
class EisenstatSSOROperator(LinearOperator):
    """Red-black SSOR(1)-preconditioned operator via **Eisenstat's trick**:
    the whole preconditioned matvec costs TWO gather-free masked shift
    passes — there is NO separate SpMV and no separate preconditioner
    apply.  This is the fusion VERDICT r4 item 1 asks for: at CG
    granularity a (preconditioner apply + SpMV) pair is ~3 streaming
    passes/iteration, while this operator does the equivalent work in ~2.

    Algebra: on the diagonally scaled system ``Ã = D^{-1/2} A D^{-1/2} =
    I + E + E^T`` (E = the black-red strictly-lower block in red-black
    ordering), the SSOR(ω=1) preconditioned operator is

        Â = (I+E)^{-1} Ã (I+E^T)^{-1}        (SPD, a congruence)

    and with ``t = (I+E^T)^{-1} v`` Eisenstat's identity gives

        Â v = t + (I+E)^{-1} (v - t)

    where each inverse is DIRECT in red-black ordering (E couples black
    rows to red columns only): one masked shift pass each — the same
    access pattern as the DIA SpMV, no gathers, no level schedule.

    Usage (see docs/preconditioning.md):

        Ahat = EisenstatSSOROperator.from_dia(A, side, dims)
        xhat = cg(Ahat, Ahat.rhs_transform(b), reltol=...)
        x = Ahat.solution_transform(xhat)

    SSOR(RB) is the same preconditioner class as
    :class:`RedBlackICPreconditioner` (closely related spectra); use this
    form when the per-iteration cost decides, the explicit ``Pl`` form
    when solver orchestration needs a plain preconditioner.

    No reference counterpart (the reference ships no preconditioners,
    docs/src/preconditioning.md:5-10) — TPU-native capability.
    """

    def __init__(self, terms, mcs, s, red):
        self.terms = terms    # static ((offset, stride, extent), ...)
        self.mcs = mcs        # scaled streams: e_o[i] = a_o(i) s[i] s[i+o]
        self.s = s            # (n,) D^{-1/2}
        self.red = red        # (n,) parity mask

    @property
    def shape(self):
        n = self.s.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.s.dtype

    @classmethod
    def from_dia(cls, dia, side: int, dims: int) -> "EisenstatSSOROperator":
        """Build from a unit-step symmetric DIAMatrix on a side^dims grid
        (the :func:`~..utils.fixtures.variable_diffusion` family; validates
        like :meth:`RedBlackICPreconditioner.from_dia`)."""
        from .sparse import DIAMatrix

        if not isinstance(dia, DIAMatrix):
            raise TypeError("from_dia wraps a DIAMatrix")
        n = dia.shape[0]
        if side**dims != n:
            raise ValueError(f"side^dims = {side**dims} != n = {n}")
        strides = {side**k for k in range(dims)}
        offs = [o for o in dia.offsets if o != 0]
        if 0 not in dia.offsets or {abs(o) for o in offs} - strides:
            raise ValueError(
                "DIA offsets must be {0} U {+-side^k} (unit grid steps)")
        by_off = {o: dia.diags[i] for i, o in enumerate(dia.offsets)}
        center = by_off[0]
        if bool(jnp.any(center <= 0)):
            raise ZeroDivisionError("non-positive diagonal")
        s = 1.0 / jnp.sqrt(center)
        i = jax.lax.iota(jnp.int32, n)
        p = jnp.zeros(n, jnp.int32)
        for st in sorted(strides):
            p = p + (i // st) % side
        red = (p % 2) == 0
        pad = max(abs(o) for o in offs)
        spad = jnp.pad(s, (pad, pad))
        terms, mcs = [], []
        for o in offs:
            if -o not in by_off:
                raise ValueError(f"offset {o} has no symmetric partner")
            c = by_off[o].astype(s.dtype)
            c_T = jnp.roll(by_off[-o], -o)   # A[i+o, i] laid onto row i
            if not bool(jnp.allclose(jnp.where(c != 0, c_T, 0), c,
                                     rtol=1e-6, atol=0)):
                raise ValueError("DIA matrix is not symmetric")
            s_nb = jax.lax.dynamic_slice_in_dim(spad, pad + o, n)
            terms.append((int(o), abs(int(o)), side))
            mcs.append(c * s * s_nb)
        return cls(tuple(terms), tuple(mcs), s, red)

    def _shift_sum(self, u):
        n = u.shape[0]
        pad = max(abs(o) for (o, _, _) in self.terms)
        up = jnp.pad(u, (pad, pad))
        acc = jnp.zeros_like(u)
        for (o, _, _), mc in zip(self.terms, self.mcs):
            acc = acc + mc * jax.lax.dynamic_slice_in_dim(up, pad + o, n)
        return acc

    def mv(self, v):
        red = self.red
        # t = (I+E^T)^{-1} v: black rows pass through, red rows subtract
        # E^T v_black (the shifted pass reads black slots only — red slots
        # of the operand are zeroed)
        t = jnp.where(red, v - self._shift_sum(jnp.where(red, 0, v)), v)
        w = v - t                     # zero at black rows
        # (I+E)^{-1} w: red rows pass through, black rows subtract E w_red
        r = jnp.where(red, w, -self._shift_sum(w))
        return t + r

    def rmv(self, v):
        return self.mv(v)             # symmetric

    def rhs_transform(self, b):
        """b -> (I+E)^{-1} D^{-1/2} b (one shift pass)."""
        sb = self.s * b
        return jnp.where(self.red, sb,
                         sb - self._shift_sum(jnp.where(self.red, sb, 0)))

    def solution_transform(self, xhat):
        """x_hat -> D^{-1/2} (I+E^T)^{-1} x_hat (one shift pass)."""
        t = jnp.where(self.red,
                      xhat - self._shift_sum(jnp.where(self.red, 0, xhat)),
                      xhat)
        return self.s * t

    def tree_flatten(self):
        return (self.mcs, self.s, self.red), self.terms

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mcs, s, red = leaves
        return cls(aux, mcs, s, red)
