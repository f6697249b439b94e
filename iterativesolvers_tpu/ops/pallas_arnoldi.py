"""Pallas TPU kernel: FUSED Arnoldi step for stencil operators.

One launch = SpMV + panel MGS + normalization + panel row write for a whole
GMRES/Arnoldi iteration (reference hot loop: src/gmres.jl:57-106 expand! +
orthogonalize_and_normalize!).  This removes every intermediate HBM round
trip the two-kernel pipeline pays (measured round 3 on v5e, n = 216^3:
~600 us/iter of copy/reshape/slice plumbing between the stencil-SpMV kernel
and the panel-MGS kernel — the v row materialize, the w write + read, the
(n,)->(rows,512) pad-copy, and the normalized-row store):

  * the Krylov vector v = V[k] is read straight out of the panel in HBM
    (dynamic row offset) into a sliding VMEM window; the stencil SpMV is
    computed window-by-window into the VMEM-resident w accumulator
    (``y``) — w never exists in HBM;
  * the MGS sweeps then run exactly as in ``ops/pallas_mgs.py`` (dot pass +
    axpy pass per active row, rows beyond ``k`` skipped, DMA included);
  * the final normalization happens in VMEM and the normalized vector is
    written back as panel row ``k+1`` via input/output aliasing — the
    only HBM traffic of the whole step is the mandatory minimum:
    1 read of row k + 2*(k+1) row passes (MGS) + 1 write of row k+1.

Stencil-on-(rows, 512) layout: the panel stores vectors as 2-D (rows, 512)
blocks (see ops/pallas_mgs.mgs_row_shape).  A flat shift by ``off``
decomposes as ``ro, d = divmod(off, 512)``: rows shift by ``ro`` (plus one
for the lanes that wrap) and lanes rotate by ``d`` — two ``pltpu.roll``s
and a lane-iota select per stencil term.  Dirichlet masks are periodic in
the flat row index with period = the term's span; the chunk size is chosen
as a common multiple of every span and 512, so ONE precomputed
masked-coefficient tile per term serves every chunk (cf. the same trick in
ops/pallas_stencil.py, there in 1-D form).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mgs import mgs_pad, panel_mgs_plan

__all__ = ["fused_arnoldi", "fused_arnoldi_plan", "stencil_panel_mv",
           "FusedArnoldiPlan"]

# Tests flip this to run the kernel through the Pallas interpreter on CPU.
_INTERPRET = False
# Test/bench hook: force the fused MGS sweep variant ("rowbuf" | "chunk").
_FORCE_MGS_MODE = None

_LANES = 512
_CROWS = 512                    # MGS sweep chunk = (512, 512) f32 = 1 MB
_CHUNK = _LANES * _CROWS
_TARGET_CHUNK = 262144          # stencil chunk target size (elements)
_MAX_CHUNK = 3 * 2**20 + 2**19
_VMEM_BUDGET = 116 * 2**20


def _round_up(x, m):
    return -(-x // m) * m


class FusedArnoldiPlan:
    """Static launch geometry for one (n, terms, dtypes) configuration."""

    __slots__ = ("n", "n_pad", "nrows", "nv", "nc_mgs", "chunk_rows",
                 "halo_rows", "n_chunks", "inner", "outer", "inner_idx",
                 "outer_idx", "panel_dtype", "mgs_mode")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def fused_arnoldi_plan(n, terms, dtype, panel_dtype=None):
    """Geometry for the fused kernel, or None when it does not apply
    (non-f32 solve, panel-MGS infeasible, or stencil spans with no
    VMEM-affordable common chunk)."""
    if panel_mgs_plan(n, dtype, panel_dtype) is None:
        return None
    n = int(n)
    pd = jnp.dtype(panel_dtype or jnp.float32)
    eff = [(int(o), int(s), int(e)) for (o, s, e) in terms]
    if not eff:
        return None
    halo = max(abs(o) for (o, _, _) in eff)
    if halo >= n:
        return None
    inner_idx = tuple(i for i, t in enumerate(eff) if t[1] * t[2] < n)
    outer_idx = tuple(i for i, t in enumerate(eff) if t[1] * t[2] >= n)
    inner = tuple(eff[i] for i in inner_idx)
    outer = tuple((eff[i][0],) for i in outer_idx)
    # HBM DMA slices must be (8, 128)-tile aligned: chunk rows and halo rows
    # are multiples of 8, so every window DMA has 8-aligned start and size
    base = _LANES * 8
    for (_, s, e) in inner:
        base = math.lcm(base, s * e)
    if base > _MAX_CHUNK:
        return None
    chunk = base * max(1, _TARGET_CHUNK // base)
    chunk_rows = chunk // _LANES
    halo_rows = _round_up(halo // _LANES + 1, 8)
    if halo_rows + 8 > chunk_rows:
        return None
    n_pad = mgs_pad(n)
    nrows = n_pad // _LANES
    nv = -(-n // _LANES)            # rows holding vector data
    n_chunks = -(-nv // chunk_rows)
    win_rows = chunk_rows + 2 * halo_rows + 8
    vmem_common = (4 * n_pad                        # resident w accumulator
                   + 2 * pd.itemsize * win_rows * _LANES  # stencil windows
                   + 2 * pd.itemsize * _CHUNK             # writeback staging
                   + 2 * len(inner) * chunk               # int8 mask tiles
                                                          #   (x2: pipeline)
                   + 8 * 4 * _CROWS * _LANES              # f32 temps
                   )
    # single-pass MGS sweep: 2 full-row buffers (see ops/pallas_mgs.py
    # 'rowbuf' — each active panel row is read from HBM ONCE); falls back
    # to the two-pass chunk pipeline when the rows do not fit VMEM
    if vmem_common + 2 * pd.itemsize * n_pad <= _VMEM_BUDGET:
        mgs_mode = "rowbuf"
    elif vmem_common + 2 * pd.itemsize * _CHUNK <= _VMEM_BUDGET:
        mgs_mode = "chunk"
    else:
        return None
    if _FORCE_MGS_MODE is not None:
        mgs_mode = _FORCE_MGS_MODE
    return FusedArnoldiPlan(
        n=n, n_pad=n_pad, nrows=nrows, nv=nv, nc_mgs=n_pad // _CHUNK,
        chunk_rows=chunk_rows, halo_rows=halo_rows, n_chunks=n_chunks,
        inner=inner, outer=outer, inner_idx=inner_idx, outer_idx=outer_idx,
        panel_dtype=pd, mgs_mode=mgs_mode,
    )


def _mask_tile(plan: FusedArnoldiPlan, t: int):
    """One chunk-shaped int8 0/1 Dirichlet-mask tile for inner term t (the
    chunk is a multiple of the term's span, so the tile repeats identically
    for every chunk); the traced coefficient rides in SMEM and multiplies
    in-kernel, keeping the resident tiles 4x smaller than f32 streams."""
    (off, stride, extent) = plan.inner[t]
    j = np.arange(plan.chunk_rows * _LANES)
    pos = (j // stride) % extent
    step = off // stride
    valid = (pos + step >= 0) & (pos + step < extent)
    return jnp.asarray(valid.reshape(plan.chunk_rows, _LANES), jnp.int8)


def _flat_shift(win, s0, CR, off, f32):
    """(CR, 512) block of the window flat-shifted by ``off`` elements:
    out[r, l] = flat(win)[(s0 + r) * 512 + l + off]."""
    ro, d = divmod(off, _LANES)
    A = win[pl.ds(s0 + ro, CR), :].astype(f32)
    if d == 0:
        return A
    B = win[pl.ds(s0 + ro + 1, CR), :].astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CR, _LANES), 1)
    # pltpu.roll(x, s, 1)[.., l] = x[.., (l - s) mod L] and requires s >= 0:
    # a flat +d lane shift is a roll by L - d
    return jnp.where(lane < _LANES - d,
                     pltpu.roll(A, _LANES - d, 1), pltpu.roll(B, _LANES - d, 1))


def _kernel(plan: FusedArnoldiPlan, m1, n_inner, n_outer,
            k_ref, do_ref, scal, panel_in, *rest):
    mcs = rest[:n_inner]
    rowbuf = plan.mgs_mode == "rowbuf"
    if rowbuf:
        (panel_out, h_ref, nrm_ref,
         y, vwin, bufA, bufB, sbuf, acc, sem_v, sem, sem_w) = rest[n_inner:]
    else:
        (panel_out, h_ref, nrm_ref,
         y, vwin, buf, sbuf, acc, sem_v, sem, sem_w) = rest[n_inner:]
    f32 = jnp.float32
    j = pl.program_id(0)
    CR, HR, NCK = plan.chunk_rows, plan.halo_rows, plan.n_chunks
    WR = CR + 2 * HR + 8
    nrows, nv = plan.nrows, plan.nv
    base_k = k_ref[0] * nrows

    # ---------------- phase 0 (grid step 0): w = A @ V[k] into y ----------
    def win_dma(ci):
        """Window ci covers vector rows [ci*CR - HR, ci*CR + CR + HR + 8);
        clamped to [0, nrows) (panel pad rows are zero by invariant).  CR,
        HR and nrows are multiples of 8, so the HBM slice start and size
        satisfy Mosaic's (8, 128) tile alignment."""
        slot = ci % 2
        lo = max(0, ci * CR - HR)
        hi = min(nrows, ci * CR + CR + HR + 8)
        doff = lo - (ci * CR - HR)
        return pltpu.make_async_copy(
            panel_in.at[pl.ds(base_k + lo, hi - lo), :],
            vwin.at[pl.ds(slot * WR + doff, hi - lo), :],
            sem_v.at[slot],
        ), doff, hi - lo

    @pl.when(j == 0)
    def _():
        dma0, _, _ = win_dma(0)
        dma0.start()
        for ci in range(NCK):
            slot = ci % 2
            if ci + 1 < NCK:
                nxt, _, _ = win_dma(ci + 1)
                nxt.start()
            cur, doff, rows = win_dma(ci)
            cur.wait()
            # zero the window cells the clamped DMA did not fill (only the
            # first/last chunks have any)
            if doff > 0:
                vwin[pl.ds(slot * WR, doff), :] = jnp.zeros(
                    (doff, _LANES), vwin.dtype)
            tail = WR - doff - rows
            if tail > 0:
                vwin[pl.ds(slot * WR + doff + rows, tail), :] = jnp.zeros(
                    (tail, _LANES), vwin.dtype)
            s0 = slot * WR + HR
            wbase = ci * CR
            wrows = min(CR, nrows - wbase)
            # compute in _CROWS-row sub-tiles: the f32 temporaries (xc, mc,
            # the two shift reads, out) are sub-tile-sized (~1 MB each), not
            # chunk-sized (~12 MB each) — the whole-chunk form blew the
            # 128 MB VMEM budget at n = 216^3 (compiler: 136.9M scoped)
            sub = 0
            while sub < wrows:
                sr = min(_CROWS, wrows - sub)
                xc = vwin[pl.ds(s0 + sub, sr), :].astype(f32)
                out = scal[0, 0] * xc
                for t in range(n_inner):
                    off = plan.inner[t][0]
                    mc = (mcs[t][pl.ds(sub, sr), :].astype(f32)
                          * scal[0, 1 + n_outer + t])
                    out = out + mc * _flat_shift(vwin, s0 + sub, sr, off, f32)
                for t in range(n_outer):
                    off = plan.outer[t][0]
                    out = out + scal[0, 1 + t] * _flat_shift(
                        vwin, s0 + sub, sr, off, f32)
                y[pl.ds(wbase + sub, sr), :] = out
                sub += sr
        # zero the pad region (rows >= nv can hold stencil spill from the
        # vector tail; MGS exactness needs a zero pad)
        r0 = nv
        while r0 < nrows:
            rz = min(_CROWS, nrows - r0)
            y[pl.ds(r0, rz), :] = jnp.zeros((rz, _LANES), f32)
            r0 += rz
        if plan.n % _LANES:
            # ragged last vector row: lanes >= n%512 are outside the vector
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
            y[pl.ds(nv - 1, 1), :] = jnp.where(
                lane < plan.n % _LANES, y[pl.ds(nv - 1, 1), :], 0.0)

    # ---------------- MGS phases (identical to ops/pallas_mgs.py) ---------
    active = j <= k_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        h_ref[j] = jnp.zeros((), h_ref.dtype)

    if rowbuf:
        # single-pass sweep (ops/pallas_mgs.py '_kernel_rowbuf'): each
        # active row is DMA'd once into a double-buffered full-row buffer;
        # dot and axpy both read it from VMEM
        def row_dma(row, bufX, slot):
            return pltpu.make_async_copy(
                panel_in.at[pl.ds(row * nrows, nrows), :], bufX,
                sem.at[slot])

        @pl.when(j == 0)
        def _():
            # phase 0 above has finished with panel row k; start row 0
            row_dma(0, bufA, 0).start()

        def bodyr(cur, cur_slot, nxt, nxt_slot):
            @pl.when(j + 1 <= k_ref[0])
            def _():
                row_dma(j + 1, nxt, nxt_slot).start()
            pltpu.make_async_copy(
                panel_in.at[pl.ds(j * nrows, nrows), :], cur,
                sem.at[cur_slot]).wait()
            acc[...] = jnp.zeros_like(acc)
            for ci in range(plan.nc_mgs):
                sl = pl.ds(ci * _CROWS, _CROWS)
                acc[...] += jnp.sum(cur[sl, :].astype(acc.dtype) * y[sl, :],
                                    axis=0, keepdims=True)
            hj = jnp.sum(acc[...])
            h_ref[j] = hj
            for ci in range(plan.nc_mgs):
                sl = pl.ds(ci * _CROWS, _CROWS)
                y[sl, :] = y[sl, :] - hj * cur[sl, :].astype(y.dtype)

        even = (j % 2) == 0

        @pl.when(active & even)
        def _():
            bodyr(bufA, 0, bufB, 1)

        @pl.when(active & jnp.logical_not(even))
        def _():
            bodyr(bufB, 1, bufA, 0)
    else:
        def dma(ci):
            slot = ci % 2
            return pltpu.make_async_copy(
                panel_in.at[pl.ds(j * nrows + ci * _CROWS, _CROWS), :],
                buf.at[pl.ds(slot * _CROWS, _CROWS), :],
                sem.at[slot],
            )

        def sweep(compute):
            dma(0).start()
            for ci in range(plan.nc_mgs):
                if ci + 1 < plan.nc_mgs:
                    dma(ci + 1).start()
                dma(ci).wait()
                compute(ci, buf[pl.ds((ci % 2) * _CROWS, _CROWS), :])

        @pl.when(active)
        def _():
            acc[...] = jnp.zeros_like(acc)

            def dot_c(ci, blk):
                yblk = y[pl.ds(ci * _CROWS, _CROWS), :]
                acc[...] += jnp.sum(blk.astype(acc.dtype) * yblk, axis=0,
                                    keepdims=True)

            sweep(dot_c)
            hj = jnp.sum(acc[...])
            h_ref[j] = hj

            def axpy_c(ci, blk):
                sl = pl.ds(ci * _CROWS, _CROWS)
                y[sl, :] = y[sl, :] - hj * blk.astype(y.dtype)

            sweep(axpy_c)

    # ---------------- final phase: normalize + write panel row k+1 --------
    @pl.when(j == m1 - 1)
    def _():
        acc[...] = jnp.zeros_like(acc)
        for ci in range(plan.nc_mgs):
            v = y[pl.ds(ci * _CROWS, _CROWS), :]
            acc[...] += jnp.sum(v * v, axis=0, keepdims=True)
        nrm = jnp.sqrt(jnp.sum(acc[...]))
        nrm_ref[0, 0] = nrm
        # do == 0 (masked step): write ZEROS, preserving the zero-beyond-k
        # panel invariant while leaving rows 0..k untouched
        inv = jnp.where(nrm == 0, 1.0, 1.0 / nrm) * do_ref[0].astype(f32)
        base_w = (k_ref[0] + 1) * nrows

        def wb(ci):
            slot = ci % 2
            return pltpu.make_async_copy(
                sbuf.at[pl.ds(slot * _CROWS, _CROWS), :],
                panel_out.at[pl.ds(base_w + ci * _CROWS, _CROWS), :],
                sem_w.at[slot],
            )

        for ci in range(plan.nc_mgs):
            slot = ci % 2
            if ci >= 2:
                # slot free once its previous writeback landed
                pltpu.make_async_copy(
                    sbuf.at[pl.ds(slot * _CROWS, _CROWS), :],
                    panel_out.at[pl.ds(base_w + (ci - 2) * _CROWS, _CROWS),
                                 :],
                    sem_w.at[slot],
                ).wait()
            sbuf[pl.ds(slot * _CROWS, _CROWS), :] = (
                y[pl.ds(ci * _CROWS, _CROWS), :] * inv
            ).astype(sbuf.dtype)
            wb(ci).start()
        for ci in range(max(0, plan.nc_mgs - 2), plan.nc_mgs):
            slot = ci % 2
            pltpu.make_async_copy(
                sbuf.at[pl.ds(slot * _CROWS, _CROWS), :],
                panel_out.at[pl.ds(base_w + ci * _CROWS, _CROWS), :],
                sem_w.at[slot],
            ).wait()


def fused_arnoldi(plan: FusedArnoldiPlan, V, k, do, center, inner_coeffs,
                  outer_coeffs, m1: int, *, interpret: bool | None = None):
    """One fused Arnoldi step on the (m1, rows, 512) panel ``V``.

    Computes ``w = A @ V[k]`` (stencil A given by ``center``/coefficients as
    planned), MGS-orthogonalizes w against rows 0..k, normalizes, and writes
    the result as panel row ``k+1`` (zeros when ``do`` is False — the masked
    no-op step of the cycle-granular GMRES core).  Returns
    ``(V_updated, h, nrm)`` with V's input buffer donated/aliased.
    """
    if interpret is None:
        interpret = _INTERPRET
    dtype = jnp.float32
    n_inner, n_outer = len(plan.inner), len(plan.outer)
    mcs = [_mask_tile(plan, t) for t in range(n_inner)]
    scal = jnp.concatenate(
        [jnp.asarray(c, dtype).reshape(1) for c in
         (center, *outer_coeffs, *inner_coeffs)]
    ).reshape(1, 1 + n_outer + n_inner)
    pshape = V.shape
    panel2d = V.reshape(m1 * plan.nrows, _LANES)
    WR = plan.chunk_rows + 2 * plan.halo_rows + 8

    kern = partial(_kernel, plan, m1, n_inner, n_outer)
    Vp, h, nrm = pl.pallas_call(
        kern,
        grid=(m1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # k
            pl.BlockSpec(memory_space=pltpu.SMEM),           # do
            pl.BlockSpec(memory_space=pltpu.SMEM),           # scalars
            pl.BlockSpec(memory_space=pl.ANY),               # panel (HBM)
        ] + [pl.BlockSpec((plan.chunk_rows, _LANES), lambda j: (0, 0))
             for _ in range(n_inner)],                        # mask tiles
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # panel out
            pl.BlockSpec((m1,), lambda j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(panel2d.shape, panel2d.dtype),
            jax.ShapeDtypeStruct((m1,), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((plan.nrows, _LANES), dtype),          # resident w
            pltpu.VMEM((2 * WR, _LANES), panel2d.dtype),      # stencil win
        ] + ([
            pltpu.VMEM((plan.nrows, _LANES), panel2d.dtype),  # row buf A
            pltpu.VMEM((plan.nrows, _LANES), panel2d.dtype),  # row buf B
        ] if plan.mgs_mode == "rowbuf" else [
            pltpu.VMEM((2 * _CROWS, _LANES), panel2d.dtype),  # MGS chunks
        ]) + [
            pltpu.VMEM((2 * _CROWS, _LANES), panel2d.dtype),  # writeback
            pltpu.VMEM((1, _LANES), dtype),                   # dot partials
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 2**20),
        interpret=interpret,
    )(jnp.asarray(k, jnp.int32).reshape(1),
      jnp.asarray(do, jnp.int32).reshape(1),
      scal, panel2d, *mcs)
    return Vp.reshape(pshape), h, nrm[0, 0]


# ---------------------------------------------------------------------------
# Panel-native stencil SpMV: w = A @ V[k], straight from/to panel layout
# ---------------------------------------------------------------------------


def _mv_kernel(plan: FusedArnoldiPlan, n_inner, n_outer,
               k_ref, scal, panel_in, *rest):
    """Single grid step; chunk loop Python-unrolled with STATIC DMA bounds
    (the proven structure of the fused kernel's phase 0), w leaves through
    double-buffered output DMAs instead of a VMEM-resident accumulator."""
    mcs = rest[:n_inner]
    (w_out, vwin, obuf, sem_v, sem_o) = rest[n_inner:]
    f32 = jnp.float32
    CR, HR, NCK = plan.chunk_rows, plan.halo_rows, plan.n_chunks
    WR = CR + 2 * HR + 8
    nrows, nv = plan.nrows, plan.nv
    base_k = k_ref[0] * nrows

    def win_dma(ci):
        slot = ci % 2
        lo = max(0, ci * CR - HR)
        hi = min(nrows, ci * CR + CR + HR + 8)
        doff = lo - (ci * CR - HR)
        return pltpu.make_async_copy(
            panel_in.at[pl.ds(base_k + lo, hi - lo), :],
            vwin.at[pl.ds(slot * WR + doff, hi - lo), :],
            sem_v.at[slot],
        ), doff, hi - lo

    pending = []      # (gbase, sr) per started writeback, in order

    def out_start(gbase, sr, out):
        widx = len(pending)
        if widx >= 2:
            out_wait(widx - 2)
        obuf[pl.ds((widx % 2) * _CROWS, sr), :] = out
        pltpu.make_async_copy(
            obuf.at[pl.ds((widx % 2) * _CROWS, sr), :],
            w_out.at[pl.ds(gbase, sr), :],
            sem_o.at[widx % 2],
        ).start()
        pending.append((gbase, sr))

    def out_wait(widx):
        gbase, sr = pending[widx]
        pltpu.make_async_copy(
            obuf.at[pl.ds((widx % 2) * _CROWS, sr), :],
            w_out.at[pl.ds(gbase, sr), :],
            sem_o.at[widx % 2],
        ).wait()

    win_dma(0)[0].start()
    for ci in range(NCK):
        slot = ci % 2
        if ci + 1 < NCK:
            win_dma(ci + 1)[0].start()
        cur, doff, rows = win_dma(ci)
        cur.wait()
        if doff > 0:
            vwin[pl.ds(slot * WR, doff), :] = jnp.zeros(
                (doff, _LANES), vwin.dtype)
        tail = WR - doff - rows
        if tail > 0:
            vwin[pl.ds(slot * WR + doff + rows, tail), :] = jnp.zeros(
                (tail, _LANES), vwin.dtype)
        s0 = slot * WR + HR
        wbase = ci * CR
        wrows = min(CR, nrows - wbase)
        sub = 0
        while sub < wrows:
            sr = min(_CROWS, wrows - sub)
            gbase = wbase + sub
            xc = vwin[pl.ds(s0 + sub, sr), :].astype(f32)
            out = scal[0, 0] * xc
            for t in range(n_inner):
                off = plan.inner[t][0]
                mc = (mcs[t][pl.ds(sub, sr), :].astype(f32)
                      * scal[0, 1 + n_outer + t])
                out = out + mc * _flat_shift(vwin, s0 + sub, sr, off, f32)
            for t in range(n_outer):
                off = plan.outer[t][0]
                out = out + scal[0, 1 + t] * _flat_shift(
                    vwin, s0 + sub, sr, off, f32)
            # zero the vector-pad region (rows >= nv; ragged lanes at nv-1)
            if gbase + sr > nv - 1:
                rowi = jax.lax.broadcasted_iota(jnp.int32, (sr, _LANES), 0)
                lanei = jax.lax.broadcasted_iota(jnp.int32, (sr, _LANES), 1)
                gpos = (gbase + rowi) * _LANES + lanei
                out = jnp.where(gpos < plan.n, out, 0.0)
            # stage + async writeback, double-buffered on sub-tile parity
            out_start(gbase, sr, out)
            sub += sr
    # zero any pure-pad rows past the last computed sub-tile (nv..nrows)
    zbase = min(NCK * CR, nrows)
    # (nrows rounds to 512-row chunks; computed sub-tiles cover ci*CR+...
    #  up to min(NCK*CR, nrows), which is >= nv by construction, and the
    #  gpos mask already zeroed rows in [nv, zbase))
    r0 = zbase
    while r0 < nrows:
        sr = min(_CROWS, nrows - r0)
        out_start(r0, sr, jnp.zeros((sr, _LANES), f32))
        r0 += sr
    # drain the last two outstanding writebacks
    for d in range(max(0, len(pending) - 2), len(pending)):
        out_wait(d)


def stencil_panel_mv(plan: FusedArnoldiPlan, V, k, center, inner_coeffs,
                     outer_coeffs, m1: int, *, interpret: bool | None = None):
    """w = A @ V[k] computed straight from the (m1, rows, 512) panel.

    The Krylov vector is read out of the panel (any storage dtype,
    bfloat16 included) through a sliding VMEM window and the f32 result is
    written in the SAME padded (rows, 512) layout ``panel_mgs`` consumes —
    no flat (n,) materialization, no pad copy, no dtype-convert pass
    (measured round 3: those cost ~225 us/iter of the GMRES step at
    n = 216^3).  Returns ``w2d`` of shape (rows, 512) f32 with the pad
    region zeroed.
    """
    if interpret is None:
        interpret = _INTERPRET
    dtype = jnp.float32
    n_inner, n_outer = len(plan.inner), len(plan.outer)
    mcs = [_mask_tile(plan, t) for t in range(n_inner)]
    scal = jnp.concatenate(
        [jnp.asarray(c, dtype).reshape(1) for c in
         (center, *outer_coeffs, *inner_coeffs)]
    ).reshape(1, 1 + n_outer + n_inner)
    panel2d = V.reshape(m1 * plan.nrows, _LANES)
    WR = plan.chunk_rows + 2 * plan.halo_rows + 8

    kern = partial(_mv_kernel, plan, n_inner, n_outer)
    w2d = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # k
            pl.BlockSpec(memory_space=pltpu.SMEM),           # scalars
            pl.BlockSpec(memory_space=pl.ANY),               # panel (HBM)
        ] + [pl.BlockSpec((plan.chunk_rows, _LANES), lambda j: (0, 0))
             for _ in range(n_inner)],                        # mask tiles
        out_specs=pl.BlockSpec(memory_space=pl.ANY),          # w (HBM)
        out_shape=jax.ShapeDtypeStruct((plan.nrows, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * WR, _LANES), panel2d.dtype),      # windows
            pltpu.VMEM((2 * _CROWS, _LANES), dtype),          # out staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(jnp.asarray(k, jnp.int32).reshape(1), scal, panel2d, *mcs)
    return w2d
