"""Focused SpMV head-to-head on the real chip: XLA DIA vs matrix-free
stencil vs Pallas dia_spmv (+fused dot), at n=128^3 and n=216^3.

Run: nohup python benchmarks/tpu_spmv_bench.py > /tmp/spmv_bench.txt 2>&1 &
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
    from iterativesolvers_tpu.ops.pallas_spmv import dia_spmv, dia_spmv_dot
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    print("device:", jax.devices()[0].device_kind, flush=True)

    # correctness probe first (small)
    A0 = laplace_dia(16, 3, dtype=np.float32)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(A0.shape[0]),
                     jnp.float32)
    try:
        y_pal = dia_spmv(A0.diags, A0.offsets, x0)
        err = float(jnp.max(jnp.abs(y_pal - A0.mv(x0))))
        print(f"pallas dia_spmv compile: OK, max err = {err:.2e}", flush=True)
        y2, dot = dia_spmv_dot(A0.diags, A0.offsets, x0, x0)
        derr = abs(float(dot) - float(jnp.sum(x0 * A0.mv(x0))))
        print(f"pallas dia_spmv_dot: OK, dot err = {derr:.2e}", flush=True)
        pallas_ok = err < 1e-4
    except Exception:
        traceback.print_exc()
        pallas_ok = False

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

    for side in (128, 216):
        A = laplace_dia(side, 3, dtype=np.float32)
        nn = A.shape[0]
        x = jnp.ones((nn,), jnp.float32)
        gb = 4 * nn / 1e9
        print(f"-- n = {side}^3 = {nn}  (one n-pass = {gb*1e3:.0f} MB; "
              f"651 GB/s pass = {gb/0.651*1e6:.0f} us)", flush=True)
        bench(A.mv, x, "XLA DIAMatrix.mv     (9-pass roofline)")
        St = its.laplacian(side, 3, dtype=np.float32)
        bench(St.mv, x, "StencilOperator.mv   (2-pass roofline)")
        if pallas_ok:
            try:
                bench(lambda v: dia_spmv(A.diags, A.offsets, v),
                      x, "pallas dia_spmv      (9-pass roofline)")
                bench(lambda v: dia_spmv_dot(A.diags, A.offsets, v, v)[0],
                      x, "pallas dia_spmv_dot  (9-pass + fused dot)")
            except Exception:
                traceback.print_exc()

    print("SPMV-BENCH-DONE", flush=True)


if __name__ == "__main__":
    main()
