"""Block-size sweep for the Pallas windowed stencil kernel on the CURRENT
worker (VERDICT r2 weak #7 / next-round item 9).

The kernel won 2.1x over XLA's DIA fusion before the 2026-08-18 worker
restart and has lost to it since, on byte-identical code.  This sweeps the
plan's block-size target on the 216^3 Laplacian to either recover the win
or justify the stored-DIA-headline dispatch with current-worker data.

Run: nohup python benchmarks/tpu_stencil_sweep.py > /tmp/stsweep.txt 2>&1 &
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
    from iterativesolvers_tpu.ops.pallas_stencil import (
        stencil_apply, stencil_plan,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    A = laplace_dia(side, 3, dtype=np.float32)
    n = St.n
    v0 = jnp.ones((n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    def timed(f, K, reps=3):
        fence(f(v0, K))
        best = float("inf")
        for r in range(reps):
            vv = v0 + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(f(vv, K))
            best = min(best, time.perf_counter() - t0)
        return best

    # XLA stored-DIA reference
    @partial(jax.jit, static_argnames=("K",))
    def dia_loop(v, K):
        return jax.lax.fori_loop(0, K, lambda i, w: A.mv(w) * (1 / 7.0), v)

    dt = max(timed(dia_loop, 256) - timed(dia_loop, 64), 1e-9) / 192
    print(json.dumps({"path": "dia_xla", "us_per_spmv": round(dt * 1e6, 2)}),
          flush=True)

    for tb in (131072, 262144, 524288, 1048576, 2097152):
        plan = stencil_plan(n, St.terms, target_block=tb)
        if plan is None:
            print(json.dumps({"path": f"stencil_tb{tb}", "plan": None}),
                  flush=True)
            continue

        @partial(jax.jit, static_argnames=("K",))
        def st_loop(v, K, plan=plan):
            inner_c = [St.coeffs[i] for i in plan.inner_idx]
            outer_c = [St.coeffs[i] for i in plan.outer_idx]
            return jax.lax.fori_loop(
                0, K,
                lambda i, w: stencil_apply(plan, St.center, inner_c,
                                           outer_c, w) * (1 / 7.0),
                v,
            )

        dt = max(timed(st_loop, 256) - timed(st_loop, 64), 1e-9) / 192
        print(json.dumps({
            "path": f"stencil_tb{tb}", "block": plan.block, "nb": plan.nb,
            "us_per_spmv": round(dt * 1e6, 2),
        }), flush=True)

    print("STENCIL-SWEEP-DONE", flush=True)


if __name__ == "__main__":
    main()
