"""Multi-device distribution: row-partitioned operators over a 1-D mesh.

The reference is strictly single-process (SURVEY §5: no MPI/NCCL/Distributed
anywhere); this layer is the net-new TPU-native component.  The capability
axis that matters for a Krylov library is scaling the problem dimension n:
**1-D row partition of A and all length-n vectors**, replicated small state
(Hessenberg, Givens, scalars), ``psum`` allreduces for dots/norms.

Two complementary paths:

1. **GSPMD auto-partitioning** (``shard_dia`` / ``shard_vector``): place the
   operator's arrays and the vectors with ``NamedSharding`` and call the
   ordinary solvers — the whole ``lax.while_loop`` is partitioned by XLA,
   which inserts collective-permutes for the stencil halo reads and psums
   for the reductions.  Zero solver changes; the scaling-book recipe
   ("pick a mesh, annotate shardings, let XLA insert collectives").

2. **Explicit halo exchange** (``HaloDIAOperator``): a ``shard_map`` SpMV
   with hand-placed ``ppermute`` halo transfers over ICI, for guaranteed
   communication placement on the hot path.  Boundary wrap-around reads are
   multiplied by structurally-zero DIA padding, so no masking is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..operators.linear_operator import LinearOperator
from ..operators.sparse import DIAMatrix, ELLMatrix

# test hook: force the per-shard Pallas interior (interpret mode) on
# non-TPU backends so CPU meshes can exercise the real-TPU dispatch
_PALLAS_INTERPRET = False

__all__ = [
    "row_mesh",
    "slice_mesh",
    "shard_vector",
    "shard_dia",
    "shard_ell",
    "replicate",
    "HaloDIAOperator",
    "HaloStencilOperator",
    "RowShardedELLOperator",
    "DenseMeshOperator",
]

ROW_AXIS = "rows"
SLICE_AXIS = "slice"   # outer axis of a multi-slice mesh: links ride DCN
CHIP_AXIS = "chip"     # inner axis: links ride ICI within a slice


def row_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the row-partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def slice_mesh(n_slices: int, chips_per_slice: Optional[int] = None,
               devices=None) -> Mesh:
    """2-D ``(slice, chip)`` mesh for multi-slice (DCN-connected) pods.

    Rows are partitioned over the *flattened* (slice-major) device order, so
    a halo exchange between consecutive row blocks crosses the slice
    boundary only for the last chip of slice s and the first chip of slice
    s+1 — exactly one DCN hop per slice pair per SpMV, with every other halo
    riding ICI.  Reductions over ``(SLICE_AXIS, CHIP_AXIS)`` are decomposed
    by XLA into an intra-slice (ICI) all-reduce followed by an inter-slice
    (DCN) all-reduce of one scalar per slice — the DCN-optimal pattern.
    """
    if devices is None:
        devices = jax.devices()
    n_slices = int(n_slices)
    if chips_per_slice is None:
        chips_per_slice = len(devices) // n_slices
    devs = np.asarray(devices[: n_slices * chips_per_slice]).reshape(
        n_slices, chips_per_slice
    )
    return Mesh(devs, (SLICE_AXIS, CHIP_AXIS))


def _row_axes(mesh: Mesh):
    """The mesh axes a length-n vector is partitioned over: all of them,
    slice-major (1-D ``(rows,)`` mesh or 2-D ``(slice, chip)`` mesh)."""
    return tuple(mesh.axis_names)


def shard_vector(v, mesh: Mesh):
    """Place a length-n vector row-sharded on the mesh (over every mesh
    axis — slice-major on a 2-D multi-slice mesh)."""
    return jax.device_put(v, NamedSharding(mesh, P(_row_axes(mesh))))


def replicate(x, mesh: Mesh):
    """Replicate small state (scalars, Hessenberg panels) on every device."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_dia(A: DIAMatrix, mesh: Mesh) -> DIAMatrix:
    """Row-shard a DIA operator: each 1-D diagonal is row-sharded.
    The returned operator works unchanged in every solver; XLA partitions
    the shifted reads in ``DIAMatrix.mv`` with collective-permutes."""
    sh = NamedSharding(mesh, P(_row_axes(mesh)))
    diags = tuple(jax.device_put(d, sh) for d in A.diags)
    return DIAMatrix(diags, A.offsets, A.shape)


def shard_ell(A: ELLMatrix, mesh: Mesh) -> ELLMatrix:
    """Row-shard an ELL operator under GSPMD: the (n, w) data/cols panels are
    row-sharded, and XLA materializes the x gather as an all-gather of the
    (sharded) input vector.  For guaranteed collective placement on the hot
    path use :class:`RowShardedELLOperator` instead."""
    sh = NamedSharding(mesh, P(_row_axes(mesh), None))
    adj = shard_ell(A.adj, mesh) if A.adj is not None else None
    return ELLMatrix(
        jax.device_put(A.data, sh),
        jax.device_put(A.cols, sh),
        A.shape,
        adj=adj,
    )


# ---------------------------------------------------------------------------
# Explicit halo-exchange SpMV under shard_map
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class HaloDIAOperator(LinearOperator):
    """Row-partitioned DIA SpMV with explicit ``ppermute`` halo exchange.

    Each device owns a contiguous block of ``n_local = n / D`` rows of the
    diagonal data and of every vector.  An SpMV sends the ``halo`` boundary
    entries of x to each neighbor over ICI (one ppermute pair), then runs
    the purely local shifted multiply-add — zero gathers, pure VPU streaming.
    Wrap-around halo values at the global boundary are harmless: DIA data is
    structurally zero wherever ``i + offset`` falls outside the matrix.

    **Interior/boundary split (overlap by dataflow):** the local kernel
    computes the full interior contribution from ``x_loc`` alone
    (zero-padded shifted multiply-adds) and applies the halo values only as
    |offset|-sized boundary corrections afterwards.  The expensive streaming
    work therefore has *no data dependency* on the ``ppermute`` results, so
    the TPU latency-hiding scheduler is free to run the ICI transfer
    concurrently with the interior compute (async collective-permute
    start/done around the interior fusion).  ``test_hlo_collectives.py::
    test_halo_mv_interior_independent_of_ppermute`` verifies the dataflow
    property on the traced jaxpr: nothing reached from a ppermute output is
    larger than the halo except the final boundary scatter-adds.
    """

    def __init__(self, dia: DIAMatrix, mesh: Mesh, *,
                 serialize_halo: bool = False):
        n, m = dia.shape
        if n != m:
            raise ValueError("HaloDIAOperator requires a square operator")
        # measurement knob (benchmarks/weak_scaling.py): force the interior
        # compute to DEPEND on the ppermute results via an optimization
        # barrier, so the overlap the split dataflow permits can be A/B'd
        # against the dependency-forced serialized schedule
        self.serialize_halo = bool(serialize_halo)
        axes = _row_axes(mesh)
        D = int(np.prod([mesh.shape[a] for a in axes]))
        if n % D != 0:
            raise ValueError(f"n={n} must divide evenly over {D} devices")
        n_local = n // D
        halo = max((abs(o) for o in dia.offsets), default=0)
        if halo > n_local:
            raise ValueError(
                f"stencil halo {halo} exceeds local block {n_local}; "
                "use fewer devices or a larger problem"
            )
        self.mesh = mesh
        self.axes = axes
        self.halo = halo
        self.n_local = n_local
        self.offsets = dia.offsets
        self._shape = dia.shape
        sh = NamedSharding(mesh, P(axes))
        # tuple-of-1-D storage (see DIAMatrix): row-sharded contiguous streams
        self.diags = tuple(jax.device_put(d, sh) for d in dia.diags)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.diags[0].dtype

    def mv(self, x):
        halo, offsets, n_local = self.halo, self.offsets, self.n_local
        axes = self.axes
        D = int(np.prod([self.mesh.shape[a] for a in axes]))

        def local_mv(diags_loc, x_loc):
            # x_loc: (n_local,) or (n_local, k)
            if halo > 0 and D > 1:
                fwd = [(i, (i + 1) % D) for i in range(D)]
                bwd = [(i, (i - 1) % D) for i in range(D)]
                left = jax.lax.ppermute(x_loc[-halo:], axes, perm=fwd)
                right = jax.lax.ppermute(x_loc[:halo], axes, perm=bwd)
            else:
                left = x_loc[-halo:] if halo else x_loc[:0]
                right = x_loc[:halo]
            if self.serialize_halo and halo > 0 and D > 1:
                x_loc, left, right = jax.lax.optimization_barrier(
                    (x_loc, left, right))
            # ---- interior: depends on x_loc ONLY (halo slots zero-padded),
            # so XLA may overlap the ppermutes with this streaming loop ----
            zpad = jnp.zeros((halo,) + x_loc.shape[1:], x_loc.dtype)
            xz = jnp.concatenate([zpad, x_loc, zpad], axis=0)
            y = jnp.zeros_like(x_loc)
            for kk, off in enumerate(offsets):
                dk = diags_loc[kk]
                d = dk if x_loc.ndim == 1 else dk[:, None]
                y = y + d * jax.lax.dynamic_slice_in_dim(
                    xz, halo + off, n_local, axis=0
                )
            # ---- boundary corrections: |off|-sized slices touching the
            # permuted halo values (joins the interior result at the end) ----
            for kk, off in enumerate(offsets):
                if off == 0:
                    continue
                dk = diags_loc[kk]
                if off < 0:
                    seg = dk[:-off]
                    d = seg if x_loc.ndim == 1 else seg[:, None]
                    y = y.at[:-off].add(d * left[halo + off:])
                else:
                    seg = dk[n_local - off:]
                    d = seg if x_loc.ndim == 1 else seg[:, None]
                    y = y.at[n_local - off:].add(d * right[:off])
            return y

        vec_spec = P(axes) if x.ndim == 1 else P(axes, None)
        return jax.shard_map(
            local_mv,
            mesh=self.mesh,
            in_specs=(P(axes), vec_spec),
            out_specs=vec_spec,
        )(self.diags, x)

    def rmv(self, x):
        # A^H for DIA: offset o of A^H holds conj(A) offset -o data shifted;
        # implement via the same halo pattern on the transposed stencil.
        halo, offsets, n_local = self.halo, self.offsets, self.n_local
        axes = self.axes
        D = int(np.prod([self.mesh.shape[a] for a in axes]))

        def local_rmv(diags_loc, x_loc):
            if halo > 0 and D > 1:
                fwd = [(i, (i + 1) % D) for i in range(D)]
                bwd = [(i, (i - 1) % D) for i in range(D)]
                left = jax.lax.ppermute(x_loc[-halo:], axes, perm=fwd)
                right = jax.lax.ppermute(x_loc[:halo], axes, perm=bwd)
            else:
                left = x_loc[-halo:] if halo else x_loc[:0]
                right = x_loc[:halo]
            # (A^H x)[i] = sum_o conj(A[i - o, i]) x[i - o]
            #            = sum_o conj(data[o, i - o]) x[i - o]
            # so we also need the halo of each *data* row; exchange it the
            # same way as x.  Interior/boundary split as in ``mv``: the
            # zero-padded interior shifts depend on local data only.
            zpad = jnp.zeros((halo,) + x_loc.shape[1:], x_loc.dtype)
            xz = jnp.concatenate([zpad, x_loc, zpad], axis=0)
            dzpad = jnp.zeros((halo,), diags_loc[0].dtype)
            y = jnp.zeros_like(x_loc)
            halos = []
            for kk, off in enumerate(offsets):
                drow = diags_loc[kk]
                if halo > 0 and D > 1:
                    dl = jax.lax.ppermute(drow[-halo:], axes, perm=fwd)
                    dr = jax.lax.ppermute(drow[:halo], axes, perm=bwd)
                else:
                    dl = drow[-halo:] if halo else drow[:0]
                    dr = drow[:halo]
                halos.append((dl, dr))
                dz = jnp.concatenate([dzpad, drow, dzpad], axis=0)
                d_shift = jax.lax.dynamic_slice_in_dim(
                    dz, halo - off, n_local, axis=0
                )
                x_shift = jax.lax.dynamic_slice_in_dim(
                    xz, halo - off, n_local, axis=0
                )
                d = d_shift if x_loc.ndim == 1 else d_shift[:, None]
                y = y + jnp.conj(d) * x_shift
            # boundary corrections from the permuted x/data halos
            for kk, off in enumerate(offsets):
                if off == 0:
                    continue
                dl, dr = halos[kk]
                if off > 0:
                    seg = jnp.conj(dl[halo - off:])
                    d = seg if x_loc.ndim == 1 else seg[:, None]
                    y = y.at[:off].add(d * left[halo - off:])
                else:
                    seg = jnp.conj(dr[:-off])
                    d = seg if x_loc.ndim == 1 else seg[:, None]
                    y = y.at[n_local + off:].add(d * right[:-off])
            return y

        vec_spec = P(axes) if x.ndim == 1 else P(axes, None)
        return jax.shard_map(
            local_rmv,
            mesh=self.mesh,
            in_specs=(P(axes), vec_spec),
            out_specs=vec_spec,
        )(self.diags, x)

    def mv_rows(self, Xr):
        """Row-panel halo SpMM: ``Xr`` is (k, n) with vectors as rows,
        sharded over axis 1.  Same halo algebra as ``mv`` transposed onto
        the minor axis — block solvers (LOBPCG) keep their (k, n) panels
        sharded without the transpose round-trips the default would pay."""
        halo, offsets, n_local = self.halo, self.offsets, self.n_local
        axes = self.axes
        D = int(np.prod([self.mesh.shape[a] for a in axes]))

        def local_mv_rows(diags_loc, X_loc):
            # X_loc: (k, n_local)
            if halo > 0 and D > 1:
                fwd = [(i, (i + 1) % D) for i in range(D)]
                bwd = [(i, (i - 1) % D) for i in range(D)]
                left = jax.lax.ppermute(X_loc[:, -halo:], axes, perm=fwd)
                right = jax.lax.ppermute(X_loc[:, :halo], axes, perm=bwd)
            else:
                left = X_loc[:, -halo:] if halo else X_loc[:, :0]
                right = X_loc[:, :halo]
            zpad = jnp.zeros(X_loc.shape[:1] + (halo,), X_loc.dtype)
            xz = jnp.concatenate([zpad, X_loc, zpad], axis=1)
            y = jnp.zeros_like(X_loc)
            for kk, off in enumerate(offsets):
                dk = diags_loc[kk]
                y = y + dk[None, :] * jax.lax.dynamic_slice_in_dim(
                    xz, halo + off, n_local, axis=1
                )
            for kk, off in enumerate(offsets):
                if off == 0:
                    continue
                dk = diags_loc[kk]
                if off < 0:
                    y = y.at[:, :-off].add(
                        dk[None, :-off] * left[:, halo + off:])
                else:
                    y = y.at[:, n_local - off:].add(
                        dk[None, n_local - off:] * right[:, :off])
            return y

        return jax.shard_map(
            local_mv_rows,
            mesh=self.mesh,
            in_specs=(P(axes), P(None, axes)),
            out_specs=P(None, axes),
        )(self.diags, Xr)

    def tree_flatten(self):
        return (self.diags,), (self.mesh, self.axes, self.halo, self.n_local,
                               self.offsets, self._shape, self.serialize_halo)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        (obj.diags,) = leaves
        (obj.mesh, obj.axes, obj.halo, obj.n_local, obj.offsets,
         obj._shape, obj.serialize_halo) = aux
        return obj


# ---------------------------------------------------------------------------
# Matrix-free stencil with halo exchange (+ per-shard Pallas interior)
# ---------------------------------------------------------------------------


def _flat_device_index(axes, mesh_shape):
    """The shard's position in the flattened (slice-major) row order."""
    d = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        d = d * mesh_shape[a] + jax.lax.axis_index(a)
    return d


@jax.tree_util.register_pytree_node_class
class HaloStencilOperator(LinearOperator):
    """Row-partitioned **matrix-free** stencil SpMV with explicit ``ppermute``
    halo exchange — the distributed form of :class:`~.operators.stencil.
    StencilOperator` (zero stored matrix data, so per-iteration HBM traffic
    is the vectors alone: ~half the stored-DIA bytes at 7-point stencils).

    Domain decomposition is 1-D over rows.  Shard-edge validity must be
    decidable locally, so every (offset, stride, extent) term must satisfy
    one of (checked at construction; both hold for the natural outermost-axis
    split of a regular grid):

    * ``stride*extent`` divides ``n_local`` — the term's Dirichlet mask is
      periodic and shard-aligned, identical on every shard;
    * ``n_local`` divides ``stride*extent`` — extent boundaries coincide
      with shard boundaries, so in-shard reads are always on-grid and the
      global mask is needed only for the halo-sized edge corrections
      (computed from ``axis_index``).

    The local interior (all contributions available from the shard's own
    rows, out-of-range reads zero) has no data dependency on the ppermute
    results — same overlap-by-dataflow contract as :class:`HaloDIAOperator`
    — and on TPU it runs the Pallas windowed stencil kernel
    (``ops/pallas_stencil.py``) *per shard* inside ``shard_map``, where every
    operand the kernel sees is device-local.  (The single-device dispatch in
    ``StencilOperator`` must disable Pallas in multi-device worlds because
    ``pallas_call`` carries no GSPMD partitioning rule; routing through
    ``shard_map`` is the TPU-idiomatic way to keep the kernel in the
    distributed hot path.)  ``mv_dot`` fuses the local ``<x, Ax>`` partial
    into the kernel pass and ``psum``s it with the halo corrections added.
    """

    def __init__(self, st, mesh: Mesh, *, serialize_halo: bool = False):
        from ..operators.stencil import StencilOperator

        if not isinstance(st, StencilOperator):
            raise TypeError("HaloStencilOperator wraps a StencilOperator")
        # measurement knob — see HaloDIAOperator.__init__
        self.serialize_halo = bool(serialize_halo)
        n = st.n
        axes = _row_axes(mesh)
        D = int(np.prod([mesh.shape[a] for a in axes]))
        if n % D != 0:
            raise ValueError(f"n={n} must divide evenly over {D} devices")
        n_local = n // D
        halo = max((abs(o) for (o, _, _) in st.terms), default=0)
        if halo > n_local:
            raise ValueError(
                f"stencil halo {halo} exceeds local block {n_local}; "
                "use fewer devices or a larger problem"
            )
        for (off, s, e) in st.terms:
            span = s * e
            if not (n_local % span == 0 or span % n_local == 0):
                raise ValueError(
                    f"term (off={off}, stride={s}, extent={e}): span {span} "
                    f"must divide or be a multiple of n_local={n_local} so "
                    "shard-edge validity is locally decidable (split along "
                    "the grid's outermost axis)"
                )
        self.mesh = mesh
        self.axes = axes
        self.halo = halo
        self.n_local = n_local
        self.n = n
        self.terms = st.terms
        sh = NamedSharding(mesh, P())
        self.center = jax.device_put(st.center, sh)
        self.coeffs = tuple(jax.device_put(c, sh) for c in st.coeffs)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.center.dtype

    def _local_interior(self, eff, cs, center, x_loc):
        """Shard-local stencil: out-of-range reads zero (halo corrections
        added separately).  Pallas on TPU, masked shifted slices otherwise."""
        n_local, halo = self.n_local, self.halo
        use_pallas = False
        if (x_loc.ndim == 1 and not jnp.iscomplexobj(x_loc)
                and x_loc.dtype in (jnp.float32, jnp.bfloat16)):
            try:
                use_pallas = (jax.default_backend() == "tpu"
                              or _PALLAS_INTERPRET)
            except Exception:  # pragma: no cover
                use_pallas = False
        if use_pallas:
            from ..ops.pallas_stencil import stencil_apply, stencil_plan

            plan = stencil_plan(n_local, eff, conj=False)
            if plan is not None:
                return stencil_apply(
                    plan, center,
                    [cs[i] for i in plan.inner_idx],
                    [cs[i] for i in plan.outer_idx],
                    x_loc,
                    interpret=_PALLAS_INTERPRET,
                )
        i = jax.lax.iota(jnp.int32, n_local)
        zpad = jnp.zeros((halo,) + x_loc.shape[1:], x_loc.dtype)
        xz = jnp.concatenate([zpad, x_loc, zpad], axis=0)
        y = center * x_loc
        for (off, s, e), c in zip(eff, cs):
            shifted = jax.lax.dynamic_slice_in_dim(xz, halo + off, n_local,
                                                   axis=0)
            if s * e <= n_local:
                # shard-aligned periodic mask (identical on every shard)
                pos = (i // s) % e
                step = off // s
                valid = (pos + step >= 0) & (pos + step < e)
                mask = valid if x_loc.ndim == 1 else valid[:, None]
                y = y + jnp.where(mask, c * shifted, 0)
            else:
                # extent boundaries == shard boundaries: every in-shard read
                # is on-grid; off-grid reads fell into the zero padding
                y = y + c * shifted
        return y

    def _apply(self, x, conj: bool, with_dot: bool = False):
        halo, n_local, terms = self.halo, self.n_local, self.terms
        axes, mesh = self.axes, self.mesh
        D = int(np.prod([mesh.shape[a] for a in axes]))
        eff = tuple((-o if conj else o, s, e) for (o, s, e) in terms)

        def local_apply(center, coeffs, x_loc):
            center = jnp.conj(center) if conj else center
            cs = [jnp.conj(c) if conj else c for c in coeffs]
            if halo > 0 and D > 1:
                fwd = [(i, (i + 1) % D) for i in range(D)]
                bwd = [(i, (i - 1) % D) for i in range(D)]
                left = jax.lax.ppermute(x_loc[-halo:], axes, perm=fwd)
                right = jax.lax.ppermute(x_loc[:halo], axes, perm=bwd)
            else:
                left = x_loc[-halo:] if halo else x_loc[:0]
                right = x_loc[:halo]
            if self.serialize_halo and halo > 0 and D > 1:
                x_loc, left, right = jax.lax.optimization_barrier(
                    (x_loc, left, right))
            # ---- interior: depends on x_loc ONLY, so the ppermutes can run
            # concurrently (overlap by dataflow, as in HaloDIAOperator) ----
            y = self._local_interior(eff, cs, center, x_loc)
            dot = jnp.sum(jnp.conj(x_loc) * y) if with_dot else None
            # ---- boundary corrections: |off|-sized adds from the permuted
            # halos, gated on the GLOBAL Dirichlet mask at the edge rows ----
            d_idx = _flat_device_index(axes, mesh.shape) if D > 1 else 0
            base = d_idx * n_local
            for (off, s, e), c in zip(eff, cs):
                if off == 0:
                    continue
                step = off // s
                if off < 0:
                    rows = jnp.arange(-off, dtype=jnp.int32)       # [0, -off)
                    vals = left[halo + off:]
                else:
                    rows = n_local - off + jnp.arange(off, dtype=jnp.int32)
                    vals = right[:off]
                pos = ((base + rows) // s) % e
                valid = (pos + step >= 0) & (pos + step < e)
                mask = valid if x_loc.ndim == 1 else valid[:, None]
                delta = jnp.where(mask, c * vals, 0)
                if off < 0:
                    y = y.at[:-off].add(delta)
                    xr = x_loc[:-off]
                else:
                    y = y.at[n_local - off:].add(delta)
                    xr = x_loc[n_local - off:]
                if with_dot:
                    dot = dot + jnp.sum(jnp.conj(xr) * delta)
            if with_dot:
                return y, jax.lax.psum(dot, axes)
            return y

        vec_spec = P(axes) if x.ndim == 1 else P(axes, None)
        out_specs = (vec_spec, P()) if with_dot else vec_spec
        return jax.shard_map(
            local_apply,
            mesh=mesh,
            in_specs=(P(), P(), vec_spec),
            out_specs=out_specs,
            # the interpret-mode Pallas lowering cannot run under the vma
            # checker (raw eval_jaxpr binds, see ops/pallas_stencil.py);
            # the compiled TPU path keeps the default check on
            check_vma=not _PALLAS_INTERPRET,
        )(self.center, self.coeffs, x)

    def mv(self, x):
        return self._apply(x, conj=False)

    def rmv(self, x):
        return self._apply(x, conj=True)

    def mv_dot(self, x):
        return self._apply(x, conj=False, with_dot=True)

    def mv_rows(self, Xr):
        """Row-panel halo SpMM: ``Xr`` is (k, n) rows sharded over axis 1 —
        the same algebra as ``mv`` on the minor axis (XLA interior; the
        Pallas kernel is single-vector), so distributed block solvers keep
        their panels lane-efficient without transpose round-trips."""
        halo, n_local, terms = self.halo, self.n_local, self.terms
        axes, mesh = self.axes, self.mesh
        D = int(np.prod([mesh.shape[a] for a in axes]))

        def local_rows(center, coeffs, X_loc):
            # X_loc: (k, n_local)
            if halo > 0 and D > 1:
                fwd = [(i, (i + 1) % D) for i in range(D)]
                bwd = [(i, (i - 1) % D) for i in range(D)]
                left = jax.lax.ppermute(X_loc[:, -halo:], axes, perm=fwd)
                right = jax.lax.ppermute(X_loc[:, :halo], axes, perm=bwd)
            else:
                left = X_loc[:, -halo:] if halo else X_loc[:, :0]
                right = X_loc[:, :halo]
            i = jax.lax.iota(jnp.int32, n_local)
            zpad = jnp.zeros(X_loc.shape[:1] + (halo,), X_loc.dtype)
            xz = jnp.concatenate([zpad, X_loc, zpad], axis=1)
            y = center * X_loc
            for (off, s, e), c in zip(terms, coeffs):
                shifted = jax.lax.dynamic_slice_in_dim(
                    xz, halo + off, n_local, axis=1)
                if s * e <= n_local:
                    pos = (i // s) % e
                    step = off // s
                    valid = (pos + step >= 0) & (pos + step < e)
                    y = y + jnp.where(valid[None, :], c * shifted, 0)
                else:
                    y = y + c * shifted
            d_idx = _flat_device_index(axes, mesh.shape) if D > 1 else 0
            base = d_idx * n_local
            for (off, s, e), c in zip(terms, coeffs):
                if off == 0:
                    continue
                step = off // s
                if off < 0:
                    rows = jnp.arange(-off, dtype=jnp.int32)
                    vals = left[:, halo + off:]
                else:
                    rows = n_local - off + jnp.arange(off, dtype=jnp.int32)
                    vals = right[:, :off]
                pos = ((base + rows) // s) % e
                valid = (pos + step >= 0) & (pos + step < e)
                delta = jnp.where(valid[None, :], c * vals, 0)
                if off < 0:
                    y = y.at[:, :-off].add(delta)
                else:
                    y = y.at[:, n_local - off:].add(delta)
            return y

        return jax.shard_map(
            local_rows,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axes)),
            out_specs=P(None, axes),
        )(self.center, self.coeffs, Xr)

    def tree_flatten(self):
        return (self.center, self.coeffs), (
            self.mesh, self.axes, self.halo, self.n_local, self.n, self.terms,
            self.serialize_halo)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.center, obj.coeffs = leaves
        (obj.mesh, obj.axes, obj.halo, obj.n_local, obj.n, obj.terms,
         obj.serialize_halo) = aux
        return obj


# ---------------------------------------------------------------------------
# General-sparsity row partition: all-gather x, local ELL gather
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class RowShardedELLOperator(LinearOperator):
    """Row-partitioned SpMV for **unstructured** sparsity with explicit
    collectives under ``shard_map``.

    Unlike a stencil (:class:`HaloDIAOperator`), an arbitrary-sparsity row
    block may read *any* entry of x, so the communication primitive is an
    ``all_gather`` of the row-sharded x over ICI (a bandwidth-optimal ring),
    followed by the purely local ELL gather/multiply.  The adjoint matvec
    runs the same kernel on a precomputed row-sharded ELL of A^H
    (``ELLMatrix.with_adjoint``); without it, each device segment-sums its
    rows' contributions to the full output and a ``psum_scatter`` reduces
    and re-shards — one reduce-scatter ring instead of a gather.

    Per SpMV: (D-1)/D · n·8 bytes over ICI + local streaming of the
    (n/D, w) panels — communication stays off HBM-critical paths and scales
    with the ICI ring bandwidth.
    """

    def __init__(self, ell: ELLMatrix, mesh: Mesh):
        n, m = ell.shape
        axes = _row_axes(mesh)
        D = int(np.prod([mesh.shape[a] for a in axes]))
        if n % D != 0 or m % D != 0:
            raise ValueError(
                f"shape {ell.shape} must divide evenly over {D} devices"
            )
        self.mesh = mesh
        self.axes = axes
        self._shape = ell.shape
        sh = NamedSharding(mesh, P(axes, None))
        self.data = jax.device_put(ell.data, sh)
        self.cols = jax.device_put(ell.cols, sh)
        if ell.adj is not None:
            self.adj_data = jax.device_put(ell.adj.data, sh)
            self.adj_cols = jax.device_put(ell.adj.cols, sh)
        else:
            self.adj_data = self.adj_cols = None

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    def _local_mv(self, data, cols, x_loc):
        xg = jax.lax.all_gather(x_loc, self.axes, tiled=True)
        g = xg[cols]  # (n_local, w) or (n_local, w, k)
        d = data if g.ndim == 2 else data[..., None]
        return jnp.sum(d * g, axis=1)

    def _vec_spec(self, x):
        return P(self.axes) if x.ndim == 1 else P(self.axes, None)

    def mv(self, x):
        axes = self.axes
        return jax.shard_map(
            self._local_mv,
            mesh=self.mesh,
            in_specs=(P(axes, None), P(axes, None), self._vec_spec(x)),
            out_specs=self._vec_spec(x),
        )(self.data, self.cols, x)

    def rmv(self, x):
        axes = self.axes
        if self.adj_data is not None:
            return jax.shard_map(
                self._local_mv,
                mesh=self.mesh,
                in_specs=(P(axes, None), P(axes, None), self._vec_spec(x)),
                out_specs=self._vec_spec(x),
            )(self.adj_data, self.adj_cols, x)

        m = self._shape[1]

        def local_rmv(data, cols, x_loc):
            # partial contributions of this device's rows to the FULL output
            d = jnp.conj(data) if x_loc.ndim == 1 else jnp.conj(data)[..., None]
            vals = d * x_loc[:, None]
            flat = vals.reshape((-1,) + vals.shape[2:])
            full = jax.ops.segment_sum(flat, cols.ravel(), num_segments=m)
            # reduce across devices and keep this device's row block
            return jax.lax.psum_scatter(full, axes, tiled=True)

        return jax.shard_map(
            local_rmv,
            mesh=self.mesh,
            in_specs=(P(axes, None), P(axes, None), self._vec_spec(x)),
            out_specs=self._vec_spec(x),
        )(self.data, self.cols, x)

    def tree_flatten(self):
        leaves = (self.data, self.cols, self.adj_data, self.adj_cols)
        return leaves, (self.mesh, self.axes, self._shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.data, obj.cols, obj.adj_data, obj.adj_cols = leaves
        obj.mesh, obj.axes, obj._shape = aux
        return obj


@jax.tree_util.register_pytree_node_class
class DenseMeshOperator(LinearOperator):
    """Dense matrix on a row mesh via GSPMD auto-partitioning, at ANY n.

    The shard_map operators above require ``n % D == 0`` (their halo/permute
    layouts are even-split by construction); this operator instead lets XLA
    pad the uneven row partition, so it carries the ``mesh``/``axes`` mesh-
    operator contract for row counts that do not divide the device count.
    Its main role is pinning the sharded-panel GMRES path's zero-padded
    last-shard layout (parallel/panel_ortho.panel_layout; VERDICT r4
    item 5) — for production-size even splits prefer the halo operators.
    """

    def __init__(self, mat, mesh: Mesh, axes=None):
        if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
            raise ValueError("DenseMeshOperator requires a square matrix")
        self.mesh = mesh
        self.axes = tuple(axes) if axes is not None else tuple(_row_axes(mesh))
        n = int(mat.shape[0])
        D = int(np.prod([mesh.shape[a] for a in self.axes]))
        n_pad = -(-n // D) * D
        self._n = n
        if n_pad != n:  # zero rows: even row split for NamedSharding
            mat = jnp.concatenate(
                [jnp.asarray(mat),
                 jnp.zeros((n_pad - n, n), jnp.asarray(mat).dtype)])
        self.mat = jax.device_put(
            mat, NamedSharding(mesh, P(self.axes, None)))

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self.mat.dtype

    def mv(self, x):
        y = self.mat @ x  # (n_pad,); pad rows are zero
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(self.mesh, P(self.axes)))
        return y[: self._n]

    def rmv(self, x):
        x_pad = (x if self.mat.shape[0] == self._n else
                 jnp.concatenate(
                     [x, jnp.zeros((self.mat.shape[0] - self._n,), x.dtype)]))
        return jnp.conj(self.mat).T @ x_pad

    def tree_flatten(self):
        return (self.mat,), (self.mesh, self.axes, self._n)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        (obj.mat,), (obj.mesh, obj.axes, obj._n) = leaves, aux
        return obj
