"""Pallas windowed stencil kernel vs XLA paths on the real chip.

Measures, at n = 128^3 and 216^3 (the BASELINE north-star Laplacian):
  - stencil_apply (pallas, ~2-pass) mv and fused mv_dot
  - StencilOperator XLA fallback (_apply) and DIAMatrix.mv
  - full CG step time via its.cg (which now auto-dispatches to pallas)

Run: nohup python benchmarks/tpu_stencil_bench.py > /tmp/stencil_bench.txt 2>&1 &
"""

import os
import sys
import time
import traceback
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(arr):
    import jax.numpy as jnp
    return float(jnp.sum(arr))


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    print("device:", jax.devices()[0].device_kind, flush=True)

    def bench(apply_fn, x, label, K=64, reps=3):
        @partial(jax.jit, static_argnames=("k",))
        def loop(x, k):
            return jax.lax.fori_loop(
                0, k, lambda i, x: apply_fn(x) * np.float32(1 / 7.0), x
            )
        fence(loop(x, K))
        fence(loop(x, K // 4))
        best_l = best_s = float("inf")
        for r in range(reps):
            xx = x + np.float32(1e-6 * (r + 1))
            t0 = time.perf_counter()
            fence(loop(xx, K))
            best_l = min(best_l, time.perf_counter() - t0)
            xx = x + np.float32(1e-6 * (r + 1) + 1e-7)
            t0 = time.perf_counter()
            fence(loop(xx, K // 4))
            best_s = min(best_s, time.perf_counter() - t0)
        best = (best_l - best_s) / (K - K // 4)
        print(f"  {label}: {best*1e6:8.1f} us/apply", flush=True)
        return best

    # correctness probe (compiled, small-but-multiblock would need n>262144;
    # use 80^3 = 512000 -> nb=2 with partial tail)
    St0 = its.laplacian(80, 3, dtype=np.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(St0.n).astype(np.float32))
    try:
        y = St0.mv(x0)            # pallas path (auto on TPU)
        y_ref = St0._apply(x0, conj=False)
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        yd, d = St0.mv_dot(x0)
        dref = float(jnp.sum(x0 * y_ref))
        derr = abs(float(d) - dref) / abs(dref)
        print(f"pallas stencil compile: OK  rel err={err:.2e}  dot={derr:.2e}",
              flush=True)
    except Exception:
        traceback.print_exc()
        print("PALLAS-STENCIL-COMPILE-FAILED", flush=True)
        return

    for side in (128, 216):
        St = its.laplacian(side, 3, dtype=np.float32)
        A = laplace_dia(side, 3, dtype=np.float32)
        n = St.n
        x = jnp.ones((n,), jnp.float32)
        print(f"-- n = {side}^3 = {n}  (one n-pass @819GB/s = "
              f"{4*n/819e9*1e6:.1f} us)", flush=True)
        bench(lambda v: St.mv(v), x, "pallas stencil mv     (2-pass)")
        bench(lambda v: St.mv_dot(v)[0], x, "pallas stencil mv_dot (2-pass+dot)")
        bench(lambda v: St._apply(v, conj=False), x, "XLA stencil mv        (shifted adds)")
        bench(A.mv, x, "XLA DIA mv            (9-stream)")

        # full CG: 64 steps through the public solver (pallas auto-dispatch)
        b = jnp.ones((n,), jnp.float32)
        # maxiter aligned to run_chunked's warmup ladder (see bench.py):
        # 248 -> exactly 248 executed steps, 504 -> 504.
        for op, lbl in ((St, "CG/stencil+pallas"), (A, "CG/DIA-XLA")):
            t = {}
            for it in (504, 248):
                xs = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=it)
                fence(xs)
                best = float("inf")
                for r in range(3):
                    bb = b + jnp.float32(1e-6 * (r + 1) * it)
                    t0 = time.perf_counter()
                    xs = its.cg(op, bb, reltol=0.0, abstol=1e-30, maxiter=it)
                    fence(xs)
                    best = min(best, time.perf_counter() - t0)
                t[it] = best
            per_iter = (t[504] - t[248]) / (504 - 248)
            print(f"  {lbl}: {per_iter*1e6:8.1f} us/iter", flush=True)

    print("STENCIL-BENCH-DONE", flush=True)


if __name__ == "__main__":
    main()
