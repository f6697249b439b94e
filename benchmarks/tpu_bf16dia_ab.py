"""A/B the bf16 value-stream DIA SpMV (compress_values) on the real chip.

The 3-D Laplacian's diagonal values are {6, -1, 0} — exactly representable
in bfloat16, so `compress_values(A)` is a pure bandwidth play: the 7-diag
f32 value stream (7 * 4B/row = 28 B/row of the ~40 B/row DIA SpMV total)
narrows to 14 B/row while every product still promotes to f32 before
accumulating.  Ideal-stream model: (14+4+4)/(28+4+4) = 0.61x bytes ->
~1.6x SpMV.  Measures bare SpMV and full CG per-iteration for f32-DIA vs
bf16-DIA at the headline 216^3 scale, plus numerics checks.

Run: nohup python benchmarks/tpu_bf16dia_ab.py > /tmp/bf16dia.txt 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 216
    A = laplace_dia(side, 3, dtype=np.float32)
    Ac = its.compress_values(A, dtype=jnp.bfloat16)
    assert Ac.dtype == jnp.bfloat16
    n = A.shape[0]
    nnz = int(sum(int(np.count_nonzero(d)) for d in A._h_diags))
    v0 = jnp.ones((n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    # numerics: identical products (bf16 exact for this matrix)
    y32 = A.mv(v0)
    yc = Ac.mv(v0)
    assert yc.dtype == jnp.float32
    diff = float(jnp.max(jnp.abs(y32 - yc)))
    print(json.dumps({"check": "mv_exact", "max_abs_diff": diff}), flush=True)

    def timed(f, K, reps=4):
        fence(f(v0, K))
        best = float("inf")
        for r in range(reps):
            vv = v0 + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(f(vv, K))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, op in (("dia_f32", A), ("dia_bf16", Ac)):
        @partial(jax.jit, static_argnames=("K",))
        def loop(v, K, op=op):
            return jax.lax.fori_loop(0, K, lambda i, w: op.mv(w) * (1 / 7.0), v)

        dt = max(timed(loop, 256) - timed(loop, 64), 1e-9) / 192
        print(json.dumps({
            "path": name, "us_per_spmv": round(dt * 1e6, 2),
            "gnnz_per_s": round(nnz / dt / 1e9, 2),
        }), flush=True)

    # full CG differential (maxiter ladder aligned to run_chunked warmup)
    def timed_solve(op, maxiter, b, reps=3):
        x = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=maxiter)
        fence(x)
        best = float("inf")
        for r in range(reps):
            bb = b + jnp.float32(1e-6 * (r + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.cg(op, bb, reltol=0.0, abstol=1e-30, maxiter=maxiter)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    b = jnp.ones((n,), jnp.float32)
    iters = 504 - 248
    for name, op in (("dia_f32", A), ("dia_bf16", Ac)):
        dt = max(timed_solve(op, 504, b) - timed_solve(op, 248, b), 1e-9)
        us = dt / iters * 1e6
        print(json.dumps({
            "path": f"cg_{name}", "us_per_iter": round(us, 2),
            "gnnz_per_s": round(nnz * iters / dt / 1e9, 2),
        }), flush=True)

    # convergence sanity at the headline tolerance: same iteration count
    xa, ha = its.cg(A, b, reltol=1e-5, maxiter=600, log=True)
    xb, hb = its.cg(Ac, b, reltol=1e-5, maxiter=600, log=True)
    print(json.dumps({
        "check": "cg_converged", "f32_iters": int(ha.niters()),
        "bf16_iters": int(hb.niters()),
        "max_x_diff": float(jnp.max(jnp.abs(xa - xb))),
    }), flush=True)

    print("BF16DIA-AB-DONE", flush=True)


if __name__ == "__main__":
    main()
