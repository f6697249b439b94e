"""Decompose the Pallas stencil kernel's cost on the current worker.

The windowed stencil SpMV measures ~395 us at 216^3 (80 MB of x+y traffic
-> ~200 GB/s effective) while the XLA DIA path streams ~750+ GB/s.  Which
stage is slow?  Three kernels at IDENTICAL launch geometry (same block,
grid, VMEM budget) isolate the stages:

  copy      — y_blk = 0.5 * x_blk                  (pure in/out pipeline)
  window    — VMEM window assemble + copy-out      (adds win[] = x_blk + halo DMAs)
  stencil   — the real kernel (stencil_apply)      (adds 7 rotated reads + FMAs)

copy ~= window << stencil  -> VPU-bound (rotated unaligned reads): restructure.
copy ~= window ~= stencil  -> DMA/pipeline-bound: worker regression, leave it.

Run: nohup python benchmarks/tpu_stencil_probe.py > /tmp/stprobe.txt 2>&1 &
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.ops.pallas_stencil import (
        stencil_apply, stencil_plan,
    )

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    n = St.n
    plan = stencil_plan(n, St.terms)
    assert plan is not None
    B, h, nb = plan.block, plan.halo, plan.nb
    print(json.dumps({"plan": {"block": B, "halo": h, "nb": nb,
                               "period": plan.period, "reps": plan.reps}}),
          flush=True)
    v0 = jnp.ones((n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    def timed(f, K, reps=4):
        fence(f(v0, K))
        best = float("inf")
        for r in range(reps):
            vv = v0 + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(f(vv, K))
            best = min(best, time.perf_counter() - t0)
        return best

    def report(name, f):
        dt = max(timed(f, 256) - timed(f, 64), 1e-9) / 192
        gbs = 2 * 4 * n / dt / 1e9  # read x + write y
        print(json.dumps({"path": name, "us_per_pass": round(dt * 1e6, 2),
                          "eff_gbs_xy": round(gbs, 1)}), flush=True)

    # ---- 1. pure copy through the block pipeline ----
    def copy_kernel(x_blk, y_ref):
        y_ref[...] = x_blk[...] * 0.5

    def copy_once(v):
        out = pl.pallas_call(
            copy_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((B,), lambda i: (i,))],
            out_specs=pl.BlockSpec((B,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((nb * B,), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(v)
        return out[:n]

    @partial(jax.jit, static_argnames=("K",))
    def copy_loop(v, K):
        return jax.lax.fori_loop(0, K, lambda i, w: copy_once(w), v)

    report("copy", copy_loop)

    # ---- 2. window assemble (halo DMAs + VMEM copy), then copy out ----
    def win_kernel(x_blk, x_any, y_ref, win, sem):
        k = pl.program_id(0)
        lo = pltpu.make_async_copy(
            x_any.at[pl.ds((k - 1) * B + (B - h), h)], win.at[pl.ds(0, h)],
            sem.at[0])
        hi = pltpu.make_async_copy(
            x_any.at[pl.ds((k + 1) * B, h)], win.at[pl.ds(h + B, h)],
            sem.at[1])

        @pl.when(k > 0)
        def _():
            lo.start()

        @pl.when(k + 1 < nb)
        def _():
            hi.start()

        win[pl.ds(h, B)] = x_blk[...]

        @pl.when(k > 0)
        def _():
            lo.wait()

        @pl.when(k + 1 < nb)
        def _():
            hi.wait()

        y_ref[...] = win[pl.ds(h, B)] * 0.5

    def win_once(v):
        out = pl.pallas_call(
            win_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((B,), lambda i: (i,)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((B,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((nb * B,), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B + 2 * h,), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(v, v)
        return out[:n]

    @partial(jax.jit, static_argnames=("K",))
    def win_loop(v, K):
        return jax.lax.fori_loop(0, K, lambda i, w: win_once(w), v)

    report("window", win_loop)

    # ---- 3. the real stencil kernel ----
    inner_c = [St.coeffs[i] for i in plan.inner_idx]
    outer_c = [St.coeffs[i] for i in plan.outer_idx]

    @partial(jax.jit, static_argnames=("K",))
    def st_loop(v, K):
        return jax.lax.fori_loop(
            0, K,
            lambda i, w: stencil_apply(plan, St.center, inner_c, outer_c, w)
            * (1 / 7.0),
            v)

    report("stencil", st_loop)

    print("STENCIL-PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
