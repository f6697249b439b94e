"""Pallas TPU kernel for the matrix-free stencil SpMV (+ fused <x, Ax>).

The XLA lowering of ``StencilOperator.mv`` materialises one shifted read of
``x`` per stencil term (measured: 8 HBM passes / 404 us per fused SpMV+dot at
n = 216^3 on v5e — see BENCH_NOTES.md), because the shifted ``dynamic_slice``s
of the padded buffer are not folded into a single windowed traversal.  This
kernel IS that single traversal: each grid step assembles one contiguous
window of ``x`` (interior block via the Mosaic input pipeline + two small
halo DMAs) in VMEM and emits the whole stencil from it — ~2 HBM passes
(read x once + write y once) instead of ndiag+1, independent of the number
of stencil terms.

Boundary handling without per-element index arithmetic (integer div/mod per
term would be VPU-bound at these sizes):

* terms whose coupled axis spans the whole vector (``stride*extent == n``,
  i.e. the outermost grid axis) need no mask at all — the zeroed halo region
  of the window implements the Dirichlet boundary;
* all other ("inner") terms have a validity mask that is periodic in the row
  index with period ``stride*extent``; the kernel streams a pre-masked
  coefficient vector of one period from VMEM (resident, read from HBM once
  per solve step — ~0.2 MB for a 216^3 grid) and applies pure fused
  multiply-adds, period-aligned because the block size is chosen as a
  multiple of lcm(period, 1024).

The fused dot variant additionally accumulates ``<x, Ax>`` into a (1, 1)
SMEM output across the (sequential) grid — the first global reduction of a
CG iteration rides along with the SpMV for free (SURVEY §2.5 "dot bundles";
reference hot loop src/cg.jl:54-55).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.compat import mark_varying

__all__ = ["stencil_plan", "stencil_apply", "pallas_is_available"]

_LANE = 1024          # Mosaic 1-D HBM tiling: DMA offsets/sizes must align
_MIN_PERIOD = 8192    # tile tiny periods up so the rep loop stays short
_TARGET_BLOCK = 262144
_MAX_BLOCK = 3 * 2**20


def _round_up(x, m):
    return -(-x // m) * m


def pallas_is_available() -> bool:
    """Compiled-path availability for GLOBAL-array callers: a real TPU
    backend AND a single-device world.  The Pallas kernels here and in
    pallas_mgs carry no GSPMD partitioning rule, so on a multi-chip mesh a
    ``pallas_call`` on sharded global operands would force XLA to
    replicate/gather them (O(n) per call) or fail to partition; callers
    operating on global arrays fall back to the XLA lowering, which GSPMD
    partitions correctly.  Distributed hot paths instead invoke the kernels
    PER SHARD inside ``shard_map``, where every operand is device-local and
    this gate does not apply: ``HaloStencilOperator._local_interior`` (the
    windowed stencil SpMV) and ``parallel/panel_ortho.py`` (the Krylov panel
    orthogonalization sweep)."""
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:  # pragma: no cover - no backend at all
        return False


class StencilPlan:
    """Static launch geometry for one (n, terms, conj) configuration."""

    __slots__ = ("n", "halo", "block", "nb", "period", "reps",
                 "inner", "outer", "inner_idx", "outer_idx")

    def __init__(self, n, halo, block, nb, period, reps, inner, outer,
                 inner_idx, outer_idx):
        self.n = n
        self.halo = halo
        self.block = block
        self.nb = nb
        self.period = period
        self.reps = reps
        self.inner = inner          # tuple of (offset, stride, extent)
        self.outer = outer          # tuple of (offset,)
        self.inner_idx = inner_idx  # positions in the original terms tuple
        self.outer_idx = outer_idx


def stencil_plan(n: int, terms, conj: bool = False,
                 target_block: int | None = None) -> StencilPlan | None:
    """Plan the launch; returns None when the configuration has no efficient
    kernel (falls back to the XLA path).  ``target_block`` overrides the
    default block-size target (sweep knob for per-worker tuning,
    benchmarks/tpu_stencil_sweep.py)."""
    n = int(n)
    tb = int(target_block) if target_block else _TARGET_BLOCK
    if n < 2 * _LANE:
        return None
    eff = []
    for (off, stride, extent) in terms:
        off = -off if conj else off
        eff.append((int(off), int(stride), int(extent)))
    halo = max((abs(o) for (o, _, _) in eff), default=1)
    halo = _round_up(max(halo, 1), _LANE)
    inner_idx = tuple(i for i, t in enumerate(eff) if t[1] * t[2] < n)
    outer_idx = tuple(i for i, t in enumerate(eff) if t[1] * t[2] >= n)
    inner = tuple(eff[i] for i in inner_idx)
    outer = tuple((eff[i][0],) for i in outer_idx)
    period = 1
    for (_, s, e) in inner:
        period = math.lcm(period, s * e)
    if period < _MIN_PERIOD:
        period *= _round_up(_MIN_PERIOD, period) // period
    base = math.lcm(period, _LANE)
    if base > _MAX_BLOCK:
        return None
    block = base * max(1, tb // base)
    nb = -(-n // block)
    reps = block // period
    if halo > block:
        return None
    # the hi-halo DMA of block nb-2 reads [ (nb-1)*block, (nb-1)*block+halo )
    # straight from the unpadded input — it must stay inside the array
    if nb > 1 and n - (nb - 1) * block < halo:
        return None
    return StencilPlan(n, halo, block, nb, period, reps, inner, outer,
                       inner_idx, outer_idx)


def _masked_coeff(plan: StencilPlan, term_idx: int, coeff, dtype):
    """One period of the pre-masked coefficient stream for inner term k:
    mc[j] = coeff if row j's coupled axis position stays on-grid else 0."""
    (off, stride, extent) = plan.inner[term_idx]
    j = np.arange(plan.period)
    pos = (j // stride) % extent
    step = off // stride
    valid = (pos + step >= 0) & (pos + step < extent)
    return jnp.where(jnp.asarray(valid), jnp.asarray(coeff, dtype), 0)


def _kernel(plan: StencilPlan, with_dot, n_inner, n_outer,
            x_blk, x_any, scal, *rest):
    mcs = rest[:n_inner]
    if with_dot:
        y_ref, part_ref = rest[n_inner], rest[n_inner + 1]
        win, sem = rest[n_inner + 2], rest[n_inner + 3]
    else:
        y_ref = rest[n_inner]
        win, sem = rest[n_inner + 1], rest[n_inner + 2]

    h, B, P, nb = plan.halo, plan.block, plan.period, plan.nb
    k = pl.program_id(0)

    # --- assemble the contiguous window [halo_lo | interior | halo_hi] ---
    lo = pltpu.make_async_copy(
        x_any.at[pl.ds((k - 1) * B + (B - h), h)], win.at[pl.ds(0, h)],
        sem.at[0])
    hi = pltpu.make_async_copy(
        x_any.at[pl.ds((k + 1) * B, h)], win.at[pl.ds(h + B, h)], sem.at[1])

    @pl.when(k > 0)
    def _():
        lo.start()

    @pl.when(k + 1 < nb)
    def _():
        hi.start()

    win[pl.ds(h, B)] = x_blk[:]
    tail = plan.nb * B - plan.n   # rows past n in the (padded) last block
    if tail > 0:
        @pl.when(k == nb - 1)
        def _():
            win[pl.ds(h + B - tail, tail)] = jnp.zeros((tail,), win.dtype)

    @pl.when(k == 0)
    def _():
        win[pl.ds(0, h)] = jnp.zeros((h,), win.dtype)

    @pl.when(k > 0)
    def _():
        lo.wait()

    @pl.when(k + 1 < nb)
    def _():
        hi.wait()

    @pl.when(k + 1 >= nb)
    def _():
        win[pl.ds(h + B, h)] = jnp.zeros((h,), win.dtype)

    # --- emit the stencil, one period-aligned chunk at a time ---
    center = scal[0, 0]
    # the fused <x, Ax> must accumulate in f32: a bf16 length-n reduction
    # (8-bit mantissa) is O(1) relative error at n >= ~1e5, corrupting
    # CG's alpha (pallas_mgs accumulates in f32 for the same reason)
    local = jnp.zeros((), jnp.float32) if with_dot else None
    for rep in range(plan.reps):
        base = h + rep * P
        w0 = win[base:base + P]
        acc = center * w0
        for t in range(n_inner):
            off = plan.inner[t][0]
            acc = acc + mcs[t][:] * win[base + off:base + off + P]
        for t in range(n_outer):
            off = plan.outer[t][0]
            acc = acc + scal[0, 1 + t] * win[base + off:base + off + P]
        y_ref[rep * P:(rep + 1) * P] = acc
        if with_dot:
            local = local + jnp.sum(
                w0.astype(jnp.float32) * acc.astype(jnp.float32))

    if with_dot:
        # sequential grid + constant (0,0) index map: accumulate in place
        @pl.when(k == 0)
        def _():
            part_ref[0, 0] = local

        @pl.when(k > 0)
        def _():
            part_ref[0, 0] = part_ref[0, 0] + local


def stencil_apply(plan: StencilPlan, center, inner_coeffs, outer_coeffs, x,
                  *, with_dot: bool = False, interpret: bool = False):
    """y = A x (and optionally <x, Ax>) for the planned stencil.

    ``inner_coeffs`` / ``outer_coeffs`` are scalars ordered like
    ``plan.inner`` / ``plan.outer``.
    """
    dtype = x.dtype
    n_inner, n_outer = len(plan.inner), len(plan.outer)
    mcs = [_masked_coeff(plan, t, inner_coeffs[t], dtype)
           for t in range(n_inner)]
    scal = jnp.concatenate(
        [jnp.asarray(c, dtype).reshape(1) for c in
         (center, *outer_coeffs)]).reshape(1, 1 + n_outer)

    in_specs = [
        pl.BlockSpec((plan.block,), lambda i: (i,)),          # interior
        pl.BlockSpec(memory_space=pl.ANY),                    # halo source
        pl.BlockSpec(memory_space=pltpu.SMEM),                # scalars
    ] + [pl.BlockSpec((plan.period,), lambda i: (0,))         # resident mc
         for _ in range(n_inner)]
    inputs = [x, x, scal] + mcs

    # padded (nb*block,) output + post-hoc y[:n] slice.  A ragged (n,)
    # output was tried (saves the 62 us slice pass) and REGRESSED 2x on
    # real v5e — Mosaic's masked ragged stores disable the output block
    # pipelining (measured: mv 178 -> 373 us at 216^3, CG/iter 623 -> 1083).
    # inside shard_map with check_vma on (the default), pallas_call outputs
    # must declare how they vary over mesh axes; inherit the input's vma
    # (frozenset()/None outside shard_map — a no-op there)
    vma = getattr(jax.typeof(x), "vma", None)
    if vma:
        # keep every kernel operand's varying-axes annotation uniform so the
        # pallas_call abstract-eval vma rule accepts the mix of per-shard x
        # and replicated coefficient streams
        axes = tuple(vma)
        mcs = [mark_varying(mc, axes) for mc in mcs]
        scal = mark_varying(scal, axes)
        inputs = [x, x, scal] + mcs
    out_shape = [jax.ShapeDtypeStruct((plan.nb * plan.block,), dtype,
                                      vma=vma)]
    out_specs = [pl.BlockSpec((plan.block,), lambda i: (i,))]
    if with_dot:
        # dot partial accumulates in f32 regardless of the stream dtype
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32, vma=vma))
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))

    # NOTE (JAX <= 0.9): ``interpret=True`` under shard_map requires the
    # enclosing shard_map to pass ``check_vma=False``.  The interpret-mode
    # lowering replays the discharged kernel jaxpr with raw eval_jaxpr binds
    # that do NOT re-insert pvary, so any ref write mixing the mesh-varying
    # x block with empty-vma scratch/loop-index values trips
    # core.standard_vma_rule — and it happens at jit-*lowering* time, out of
    # reach of any trace-time workaround here.  The compiled Mosaic path
    # never evaluates the kernel body as jax primitives and runs fine with
    # check_vma on (verified on real TPU, see tests/test_parallel_stencil.py
    # and BENCH_NOTES round 3).
    kernel = partial(_kernel, plan, with_dot, n_inner, n_outer)
    outs = pl.pallas_call(
        kernel,
        grid=(plan.nb,),
        in_specs=in_specs,
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((plan.block + 2 * plan.halo,), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the 216^3 Laplacian's period (lcm of the inner-term spans) forces a
        # 746496-row block; window + double-buffered in/out blocks then sit
        # just above the default 16 MB scoped-VMEM budget (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*inputs)
    if with_dot:
        y, part = outs
        return y[:plan.n], part[0, 0].astype(jnp.float32)
    return outs[:plan.n]
