"""A/B: bf16-panel GMRES(20) at 216^3 — panel-native SpMV path
(stencil_panel_mv + padded-w panel_mgs + scan-vectorized Givens) vs the
round-3-baseline flat-plumbing path (1541-1546 us/iter measured)."""

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
    n = St.n
    b = jnp.ones((n,), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    def timed_gmres(maxiter, reps=3, pdt=jnp.bfloat16):
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
    orig = g._stencil_panel_setup
    for name, patch in (("panel_mv_bf16", False), ("flat_bf16", True)):
        if patch:
            g._stencil_panel_setup = lambda *a, **k: None
        else:
            g._stencil_panel_setup = orig
        t0 = time.perf_counter()
        dt = max(timed_gmres(500) - timed_gmres(240), 1e-9)
        print(json.dumps({"path": name,
                          "us_per_iter": round(dt / iters * 1e6, 1),
                          "wall_incl_compile_s":
                              round(time.perf_counter() - t0, 1)}),
              flush=True)
    # f32-panel check: fused still dispatches (panel_mv None there)
    g._stencil_panel_setup = orig
    dt = max(timed_gmres(500, pdt=None) - timed_gmres(240, pdt=None), 1e-9)
    print(json.dumps({"path": "fused_f32",
                      "us_per_iter": round(dt / iters * 1e6, 1)}), flush=True)

    # convergence sanity at scale on the new default path
    x, h = its.gmres(St, b, restart=20, maxiter=400, reltol=1e-4, log=True)
    r = float(jnp.linalg.norm(b - St.mv(x)) / jnp.linalg.norm(b))
    print(json.dumps({"check": "convergence_216_default",
                      "iters": h.iters, "converged": bool(h.isconverged),
                      "true_rel_res": r}), flush=True)


if __name__ == "__main__":
    main()
