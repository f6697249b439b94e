"""A/B: fused Arnoldi kernel with the r5 single-pass rowbuf sweep vs the
two-kernel pipeline (stencil_panel_mv + rowbuf panel_mgs), both on bf16
panels at the 216^3 headline configuration.  One variant per process
(trace-time dispatch).

Usage: python benchmarks/tpu_fusedrowbuf_ab.py fused|pipeline
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its
import iterativesolvers_tpu.solvers.gmres as g


def fence(x):
    np.asarray(jnp.ravel(x)[:1])


def main():
    variant = sys.argv[1]
    assert variant in ("fused", "pipeline")
    if variant == "pipeline":
        g._fused_setup = lambda *a, **k: None
    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    n = St.n
    b = jnp.ones((n,), jnp.float32)

    def timed(maxiter, reps=3):
        x = its.gmres(St, b, restart=20, reltol=0.0, abstol=1e-30,
                      maxiter=maxiter, panel_dtype=jnp.bfloat16,
                      ir_stall_exit=False)
        fence(x)
        best = float("inf")
        for r in range(reps):
            bb = b + jnp.float32(1e-6 * (r + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.gmres(St, bb, restart=20, reltol=0.0, abstol=1e-30,
                          maxiter=maxiter, panel_dtype=jnp.bfloat16,
                          ir_stall_exit=False)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(500) - timed(240), 1e-9)
    print(json.dumps({
        "variant": variant,
        "us_per_iter": round(1e6 * dt / 260, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
