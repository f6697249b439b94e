"""Pallas TPU kernel: panel modified Gram-Schmidt with VMEM-resident w.

The GMRES/Arnoldi hot loop orthogonalizes a new vector w against the rows of
the (m+1, n) Krylov panel (reference: src/orthogonalize.jl:67-79, MGS
default).  The XLA lowering of row-wise MGS materializes w in HBM between
every (dot, axpy) pair: per active row it reads v_j twice and reads+writes w
twice — ~200 MB/row at n = 216^3, ~4.2 GB per iteration for the full m = 20
panel, and it cannot skip the zero rows beyond the active count.

This kernel keeps w resident in VMEM for the whole sweep (it lives in the
pipelined OUTPUT block, so there is no extra scratch copy) and streams each
panel row through a double-buffered chunk pipeline twice (dot pass, then
axpy pass once h_j is known).  Rows beyond the active count k — a runtime
scalar — are skipped entirely, DMA included.  Traffic: 2*(k+1) row reads
+ one read and one write of w, i.e. ~80 MB/row instead of ~200 MB/row and
zero traffic for inactive rows.  The final normalization (norm + scale) runs
in-VMEM on the last grid step, so the returned w is already normalized.

TPU-shape notes (all learned on real v5e Mosaic):
  * data moves and computes as 2-D (rows, 512) blocks — a 1-D layout maps
    to lane-only vregs (1 of 8 sublanes used) and ran ~8x off the VPU pace;
  * the per-chunk dot partial accumulates into a (1, 512) VMEM vector and
    is reduced to a scalar once per row — a scalar SMEM accumulator
    serializes every chunk on the scalar unit;
  * chunk loops are STATIC Python unrolls: Mosaic cannot dynamically slice
    the sublane-tiled dim of a VMEM buffer (HBM-side DMA offsets may be
    dynamic); rows are therefore padded to whole chunks.

Layout contract: the panel is stored row-major with rows padded to
``n_pad = mgs_pad(n)`` (a multiple of the 256K-element chunk); pad columns
must be zero.  w is the unpadded (n,) vector; outputs are the normalized w
in padded (n_pad,) form (pad region zero — ready for the panel row write),
the (m+1,) projection coefficients h, and the norm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["panel_mgs", "panel_mgs_plan", "mgs_pad", "mgs_row_shape"]

# Tests flip this to run the kernel through the Pallas interpreter on CPU.
_INTERPRET = False
# Test/bench hook: force a sweep variant ("rowbuf" | "chunk" | None = auto).
_FORCE_MODE = None

_LANES = 512
_CROWS = 512                    # chunk = (512, 512) f32 = 1 MB
_CHUNK = _LANES * _CROWS
_VMEM_BUDGET = 96 * 2**20       # w + y blocks + buffers must fit comfortably


def _round_up(x, m):
    return -(-x // m) * m


def panel_mgs_plan(n: int, dtype, panel_dtype=None) -> dict | None:
    """Static geometry, or None when the kernel does not apply
    (non-f32 w, too small to matter, or w cannot stay VMEM-resident).

    ``panel_dtype`` is the storage dtype of the Krylov panel — float32
    (default) or bfloat16 (the mixed-precision GMRES-IR mode: halves the
    panel's HBM traffic; all arithmetic stays f32 in VMEM).

    ``mode``: ``"rowbuf"`` when a whole panel row fits VMEM next to the
    aliased resident w — the SINGLE-PASS sweep (each row's chunk is read
    from HBM once; dot and axpy both run from the VMEM row buffer), which
    halves the panel traffic of the two-pass ``"chunk"`` fallback.  The
    r4 profile put orthogonalization at 46% of the GMRES iteration with
    panel streaming as its bulk — this is the round-5 attack on it."""
    if dtype != jnp.float32:
        return None
    pd = jnp.dtype(panel_dtype or jnp.float32)
    if pd not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return None
    n = int(n)
    if n < 4 * _CHUNK:
        return None
    n_pad = _round_up(n, _CHUNK)
    # rowbuf: resident w output block (f32) + 2 full-row buffers
    if 4 * n_pad + 2 * pd.itemsize * n_pad <= _VMEM_BUDGET:
        mode = "rowbuf"
    # chunk: w input block + y output block (f32) + 2 panel-chunk buffers
    elif 2 * 4 * n_pad + 2 * pd.itemsize * _CHUNK <= _VMEM_BUDGET:
        mode = "chunk"
    else:
        return None
    if _FORCE_MODE is not None:
        mode = _FORCE_MODE
    return {"n": n, "n_pad": n_pad, "nc": n_pad // _CHUNK, "mode": mode}


def mgs_pad(n: int) -> int:
    """Padded row length the kernel's panel layout requires."""
    return _round_up(int(n), _CHUNK)


def mgs_row_shape(n: int) -> tuple[int, int]:
    """2-D shape of one panel row in the kernel's native layout.

    The solver must STORE the panel with this (rows, 512) trailing shape —
    i.e. as a (m+1, rows, 512) array — because on TPU a reshape that changes
    the minor (lane) dimension physically re-tiles the array: feeding a
    (m+1, n_pad) panel through ``reshape`` cost 12.5 ms/call at n = 216^3
    (profiled), 9x the kernel itself.  Major-dim splits/merges are free.
    """
    return (mgs_pad(n) // _LANES, _LANES)


def _kernel(n, n_pad, nc, m1,
            k_ref, w_ref, panel, y_ref, h_ref, nrm_ref, buf, acc, sem):
    j = pl.program_id(0)
    nrows = n_pad // _LANES      # rows of the (nrows, 512) working vector

    @pl.when(j == 0)
    def _():
        y_ref[...] = w_ref[...]  # seed the resident w (pad already zero)

    active = j <= k_ref[0]

    # every grid step owns exactly h[j] (h lives in SMEM: scalar stores)
    @pl.when(jnp.logical_not(active))
    def _():
        h_ref[j] = jnp.zeros((), h_ref.dtype)

    def dma(ci):
        slot = ci % 2
        return pltpu.make_async_copy(
            panel.at[pl.ds(j * nrows + ci * _CROWS, _CROWS), :],
            buf.at[pl.ds(slot * _CROWS, _CROWS), :],
            sem.at[slot],
        )

    def sweep(compute):
        """Double-buffered pass over the row chunks; ``compute(ci, block)``
        consumes chunk ci's (_CROWS, 512) data."""
        dma(0).start()
        for ci in range(nc):
            if ci + 1 < nc:
                dma(ci + 1).start()
            dma(ci).wait()
            compute(ci, buf[pl.ds((ci % 2) * _CROWS, _CROWS), :])

    @pl.when(active)
    def _():
        # ---- pass 1: h_j = <v_j, w> (vector partials, one scalar reduce) --
        acc[...] = jnp.zeros_like(acc)

        def dot_c(ci, blk):
            yblk = y_ref[pl.ds(ci * _CROWS, _CROWS), :]
            # panel chunks may be bf16 (GMRES-IR mode); compute in f32
            acc[...] += jnp.sum(blk.astype(acc.dtype) * yblk, axis=0,
                                keepdims=True)

        sweep(dot_c)
        hj = jnp.sum(acc[...])
        h_ref[j] = hj

        # ---- pass 2: w -= h_j v_j (re-stream the row) ----
        def axpy_c(ci, blk):
            sl = pl.ds(ci * _CROWS, _CROWS)
            y_ref[sl, :] = y_ref[sl, :] - hj * blk.astype(y_ref.dtype)

        sweep(axpy_c)

    @pl.when(j == m1 - 1)
    def _():
        # ---- in-VMEM normalization (pad region is zero => exact) ----
        acc[...] = jnp.zeros_like(acc)
        for ci in range(nc):
            v = y_ref[pl.ds(ci * _CROWS, _CROWS), :]
            acc[...] += jnp.sum(v * v, axis=0, keepdims=True)
        nrm = jnp.sqrt(jnp.sum(acc[...]))
        inv = jnp.where(nrm == 0, 1.0, 1.0 / nrm).astype(y_ref.dtype)
        for ci in range(nc):
            sl = pl.ds(ci * _CROWS, _CROWS)
            y_ref[sl, :] = y_ref[sl, :] * inv
        nrm_ref[0, 0] = nrm


def _kernel_rowbuf(n, n_pad, nc, m1,
                   k_ref, w_ref, panel, y_ref, h_ref, nrm_ref,
                   bufA, bufB, acc, semw, sem):
    """SINGLE-PASS sweep: each panel row is DMA'd to VMEM once (double-
    buffered full rows) and both the dot and the axpy read it from VMEM —
    half the HBM panel traffic of ``_kernel``'s two-pass chunk pipeline.
    Requires a full row + the resident w to fit VMEM (plan mode 'rowbuf');
    the bf16-panel GMRES-IR hot path at 216^3 is 2 x 20.4 MB row buffers +
    40.9 MB w."""
    j = pl.program_id(0)
    nrows = n_pad // _LANES

    def row_dma(row, buf, slot):
        return pltpu.make_async_copy(
            panel.at[pl.ds(row * nrows, nrows), :], buf, sem.at[slot])

    @pl.when(j == 0)
    def _():
        # seed the resident w from HBM and kick off row 0's DMA
        cp = pltpu.make_async_copy(w_ref, y_ref, semw)
        cp.start()
        row_dma(0, bufA, 0).start()
        cp.wait()

    active = j <= k_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        h_ref[j] = jnp.zeros((), h_ref.dtype)

    def body(cur, cur_slot, nxt, nxt_slot):
        # prefetch the next active row before blocking on the current one
        @pl.when(j + 1 <= k_ref[0])
        def _():
            row_dma(j + 1, nxt, nxt_slot).start()
        row_wait = pltpu.make_async_copy(
            panel.at[pl.ds(j * nrows, nrows), :], cur, sem.at[cur_slot])
        row_wait.wait()
        acc[...] = jnp.zeros_like(acc)
        for ci in range(nc):
            sl = pl.ds(ci * _CROWS, _CROWS)
            acc[...] += jnp.sum(cur[sl, :].astype(acc.dtype) * y_ref[sl, :],
                                axis=0, keepdims=True)
        hj = jnp.sum(acc[...])
        h_ref[j] = hj
        for ci in range(nc):
            sl = pl.ds(ci * _CROWS, _CROWS)
            y_ref[sl, :] = y_ref[sl, :] - hj * cur[sl, :].astype(y_ref.dtype)

    even = (j % 2) == 0

    @pl.when(active & even)
    def _():
        body(bufA, 0, bufB, 1)

    @pl.when(active & jnp.logical_not(even))
    def _():
        body(bufB, 1, bufA, 0)

    @pl.when(j == m1 - 1)
    def _():
        acc[...] = jnp.zeros_like(acc)
        for ci in range(nc):
            v = y_ref[pl.ds(ci * _CROWS, _CROWS), :]
            acc[...] += jnp.sum(v * v, axis=0, keepdims=True)
        nrm = jnp.sqrt(jnp.sum(acc[...]))
        inv = jnp.where(nrm == 0, 1.0, 1.0 / nrm).astype(y_ref.dtype)
        for ci in range(nc):
            sl = pl.ds(ci * _CROWS, _CROWS)
            y_ref[sl, :] = y_ref[sl, :] * inv
        nrm_ref[0, 0] = nrm


def _panel_mgs_rowbuf(plan, w2d, panel2d, k, m1, interpret):
    n, n_pad, nc = plan["n"], plan["n_pad"], plan["nc"]
    nrows = n_pad // _LANES
    kern = partial(_kernel_rowbuf, n, n_pad, nc, m1)
    y, h, nrm = pl.pallas_call(
        kern,
        grid=(m1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # k scalar
            pl.BlockSpec(memory_space=pl.ANY),       # w stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # panel in HBM
        ],
        out_specs=[
            pl.BlockSpec((nrows, _LANES), lambda j: (0, 0)),  # resident w
            pl.BlockSpec((m1,), lambda j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, _LANES), w2d.dtype),
            jax.ShapeDtypeStruct((m1,), w2d.dtype),
            jax.ShapeDtypeStruct((1, 1), w2d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nrows, _LANES), panel2d.dtype),   # row buffer A
            pltpu.VMEM((nrows, _LANES), panel2d.dtype),   # row buffer B
            pltpu.VMEM((1, _LANES), w2d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(jnp.asarray(k, jnp.int32).reshape(1), w2d, panel2d)
    return y, h, nrm[0, 0]


def panel_mgs(V, w, k, m1: int, *, n: int | None = None,
              interpret: bool | None = None):
    """Orthogonalize w against rows 0..k of the padded row panel and
    normalize.

    Args:
      V: the row panel, ideally ALREADY in the (m1, rows, 512) layout of
        ``mgs_row_shape`` (any shape of size m1 * n_pad is accepted, but
        only major-dim reshapes are free on TPU — see ``mgs_row_shape``).
      w: (n,) vector to orthogonalize (unpadded), OR an already-padded
        (rows, 512) block with zero pad region (e.g. straight from
        ``ops.pallas_arnoldi.stencil_panel_mv`` — skips the pad copy);
        the 2-D form requires ``n``.
      k: int32 scalar — rows 0..k participate (rows beyond are skipped).
      m1: static panel row count (= restart + 1).

    Returns ``(w_normalized, h, nrm)`` with shapes
    ``(rows, 512), (m1,), ()`` where the first output is the normalized w in
    the panel-row layout (pad region zero — ready to store):
    ``w_original = sum_j h[j] V[j] + nrm * w_norm``.
    """
    if interpret is None:
        interpret = _INTERPRET
    if w.ndim == 2:
        if n is None:
            raise ValueError("panel_mgs with a padded 2-D w requires n")
        plan = panel_mgs_plan(n, w.dtype, V.dtype)
        if plan is None:
            raise ValueError("panel_mgs does not apply to this configuration")
        n_pad, nc = plan["n_pad"], plan["nc"]
        assert w.size == n_pad, (w.shape, n_pad)
        w2d = w.reshape(-1, _LANES)
    else:
        n = w.shape[0]
        plan = panel_mgs_plan(n, w.dtype, V.dtype)
        if plan is None:
            raise ValueError("panel_mgs does not apply to this configuration")
        n_pad, nc = plan["n_pad"], plan["nc"]
        w2d = jnp.zeros((n_pad,), w.dtype).at[:n].set(w).reshape(-1, _LANES)
    assert V.size == m1 * n_pad, (V.shape, m1, n_pad)
    panel2d = V.reshape(m1 * (n_pad // _LANES), _LANES)

    if plan["mode"] == "rowbuf":
        return _panel_mgs_rowbuf(plan, w2d, panel2d, k, m1, interpret)

    kern = partial(_kernel, n, n_pad, nc, m1)
    nrows = n_pad // _LANES
    y, h, nrm = pl.pallas_call(
        kern,
        grid=(m1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # k scalar
            pl.BlockSpec((nrows, _LANES), lambda j: (0, 0)),  # w, fetched once
            pl.BlockSpec(memory_space=pl.ANY),               # panel in HBM
        ],
        out_specs=[
            pl.BlockSpec((nrows, _LANES), lambda j: (0, 0)),  # resident w
            pl.BlockSpec((m1,), lambda j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, _LANES), w.dtype),
            jax.ShapeDtypeStruct((m1,), w.dtype),
            jax.ShapeDtypeStruct((1, 1), w.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * _CROWS, _LANES), V.dtype),       # panel chunks
            pltpu.VMEM((1, _LANES), w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(jnp.asarray(k, jnp.int32).reshape(1), w2d, panel2d)
    return y, h, nrm[0, 0]
