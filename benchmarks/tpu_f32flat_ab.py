"""Post-Givens-scan A/B: f32-panel GMRES fused kernel vs flat two-kernel,
and a higher-rep rerun of panel_mv vs flat on bf16 (settle the tie)."""

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
    import iterativesolvers_tpu.solvers.gmres as g

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    St = its.laplacian(216, 3, dtype=np.float32)
    b = jnp.ones((St.n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    def timed_gmres(maxiter, reps, pdt):
        x = its.gmres(St, b, restart=20, reltol=0.0, abstol=1e-30,
                      maxiter=maxiter, panel_dtype=pdt, ir_stall_exit=False)
        fence(x)
        best = float("inf")
        for r in range(reps):
            bb = b + jnp.float32(1e-6 * (r + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.gmres(St, bb, restart=20, reltol=0.0, abstol=1e-30,
                          maxiter=maxiter, panel_dtype=pdt,
                          ir_stall_exit=False)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    iters = 500 - 240
    orig_f = g._fused_setup
    orig_p = g._stencil_panel_setup
    runs = [
        ("fused_f32", orig_f, orig_p, None),
        ("flat_f32", (lambda *a, **k: None), (lambda *a, **k: None), None),
        ("panelmv_f32", (lambda *a, **k: None), orig_p, None),
        ("panelmv_bf16", orig_f, orig_p, jnp.bfloat16),
        ("flat_bf16", orig_f, (lambda *a, **k: None), jnp.bfloat16),
    ]
    for name, fs, ps, pdt in runs:
        g._fused_setup = fs
        g._stencil_panel_setup = ps
        dt = max(timed_gmres(500, 5, pdt) - timed_gmres(240, 5, pdt), 1e-9)
        print(json.dumps({"path": name,
                          "us_per_iter": round(dt / iters * 1e6, 1)}),
              flush=True)
    g._fused_setup = orig_f
    g._stencil_panel_setup = orig_p


if __name__ == "__main__":
    main()
