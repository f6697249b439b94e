"""A/B the int8 value-stream DIA against bf16 and f32 on the real chip.

Second compression rung: the Laplacian's values {6, -1, 0} are exact in
int8 too, quartering the diag stream (280 -> 70 MB/iter) vs f32.  The
convert-to-f32 runs on the VPU inside the fused multiply-add stream.

Run: nohup python benchmarks/tpu_int8dia_ab.py > /tmp/int8dia.txt 2>&1 &
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

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 216
    A = laplace_dia(side, 3, dtype=np.float32)
    Ac = its.compress_values(A, dtype=jnp.bfloat16)
    Ai = its.compress_values(A, dtype=jnp.int8)       # int8
    assert Ai.dtype == jnp.int8
    n = A.shape[0]
    nnz = int(sum(int(np.count_nonzero(d)) for d in A._h_diags))
    b = jnp.ones((n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    y32, yi = A.mv(b), Ai.mv(b)
    assert yi.dtype == jnp.float32
    print(json.dumps({"check": "mv_exact_int8",
                      "max_abs_diff": float(jnp.max(jnp.abs(y32 - yi)))}),
          flush=True)

    def timed_solve(op, maxiter, reps=3):
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

    iters = 504 - 248
    for name, op in (("f32", A), ("bf16", Ac), ("int8", Ai)):
        dt = max(timed_solve(op, 504) - timed_solve(op, 248), 1e-9)
        print(json.dumps({
            "path": f"cg_dia_{name}",
            "us_per_iter": round(dt / iters * 1e6, 2),
            "gnnz_per_s": round(nnz * iters / dt / 1e9, 2),
        }), flush=True)

    print("INT8DIA-AB-DONE", flush=True)


if __name__ == "__main__":
    main()
