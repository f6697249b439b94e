"""Pallas TPU kernels for the DIA (stencil) SpMV — the framework's hottest op.

``dia_spmv(diags, offsets, x)`` computes ``y = A x`` for a diagonal-format
operator in ONE pass over HBM per block: the x window (block + 2*halo) is
DMA'd into VMEM once, each diagonal block streams through the VPU, and the
output block is written once.  ``dia_spmv_dot`` additionally produces the
partial sums of ``<u, A u>`` per block in the same pass — fusing the first
global reduction of a CG iteration into the SpMV so ``u`` and ``c`` are not
re-read from HBM (SURVEY §2.5: "fused axpy/dot bundles").

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * blocks are 1-D, sized in multiples of 1024 lanes;
  * the x window lives in a VMEM scratch filled by an explicit async copy
    (overlapping windows cannot be expressed as BlockSpecs);
  * diagonal blocks use plain (block,) BlockSpecs — contiguous streams;
  * the dot partial accumulates across the (sequential) grid into a single
    (1, 1) SMEM-backed output — Mosaic requires SMEM output blocks to equal
    the full array shape, so per-block partials are summed in place.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv", "dia_spmv_dot"]


def _plan(n, offsets, block_rows):
    halo = max((abs(o) for o in offsets), default=0)
    # Mosaic tiles 1-D HBM memrefs in units of 1024 lanes: every DMA slice
    # offset AND size must be 1024-aligned, so the halo is rounded up and
    # the block size kept a multiple of 1024.
    halo = -(-halo // 1024) * 1024 if halo else 0
    block = max(int(block_rows), 1024)
    block = -(-block // 1024) * 1024
    nb = -(-n // block)
    npad = nb * block
    return halo, block, nb, npad


def _pad_inputs(diags, x, halo, npad, n):
    xp = jnp.pad(x, (halo, halo + (npad - n)))
    dp = tuple(jnp.pad(d, (0, npad - n)) for d in diags)
    return dp, xp


def _spmv_kernel(offsets, halo, block, nd, with_dot, *refs):
    # refs layout: [xp, u?] + diags[nd] + [y, part?] + [win, sem]
    xp_ref = refs[0]
    base = 1
    u_ref = None
    if with_dot:
        u_ref = refs[1]
        base = 2
    drefs = refs[base : base + nd]
    y_ref = refs[base + nd]
    out_end = base + nd + 1
    part_ref = refs[out_end] if with_dot else None
    win = refs[-2]
    sem = refs[-1]

    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(i * block, block + 2 * halo)], win, sem
    )
    dma.start()
    dma.wait()

    acc = drefs[0][:] * win[pl.ds(halo + offsets[0], block)]
    for k in range(1, nd):
        acc = acc + drefs[k][:] * win[pl.ds(halo + offsets[k], block)]
    y_ref[:] = acc
    if with_dot:
        # TPU grid steps run sequentially and the (1,1) SMEM output block maps
        # every step to the same slot, so accumulate across steps in place.
        part = jnp.sum(u_ref[:] * acc)

        @pl.when(i == 0)
        def _():
            part_ref[0, 0] = part

        @pl.when(i > 0)
        def _():
            part_ref[0, 0] = part_ref[0, 0] + part


def _call(diags, offsets, x, u=None, *, block_rows=32768, interpret=False,
          prepadded=False):
    n = x.shape[0]
    nd = len(offsets)
    halo, block, nb, npad = _plan(n, offsets, block_rows)
    if prepadded:
        # diagonals already length npad (padded once at operator build time
        # instead of re-materialized every call)
        dp, xp = diags, jnp.pad(x, (halo, halo + (npad - n)))
    else:
        dp, xp = _pad_inputs(diags, x, halo, npad, n)
    with_dot = u is not None

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # xp stays in HBM
    inputs = [xp]
    if with_dot:
        up = jnp.pad(u, (0, npad - n))
        in_specs.append(pl.BlockSpec((block,), lambda i: (i,)))
        inputs.append(up)
    in_specs += [pl.BlockSpec((block,), lambda i: (i,)) for _ in range(nd)]
    inputs += list(dp)

    out_shape = [jax.ShapeDtypeStruct((npad,), x.dtype)]
    out_specs = [pl.BlockSpec((block,), lambda i: (i,))]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )

    kernel = partial(_spmv_kernel, tuple(offsets), halo, block, nd, with_dot)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block + 2 * halo,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*inputs)
    if with_dot:
        y, parts = outs
        return y[:n], parts[0, 0]
    return outs[:n]


def dia_spmv(diags, offsets, x, *, block_rows=32768, interpret=False,
             prepadded=False):
    """y = A x for a DIA operator (tuple of 1-D diagonals + static offsets)."""
    return _call(diags, offsets, x, block_rows=block_rows, interpret=interpret,
                 prepadded=prepadded)


def dia_spmv_dot(diags, offsets, x, u, *, block_rows=32768, interpret=False,
                 prepadded=False):
    """(A x, <u, A x>) in one fused pass (real dtypes)."""
    return _call(diags, offsets, x, u=u, block_rows=block_rows,
                 interpret=interpret, prepadded=prepadded)
