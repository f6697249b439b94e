"""A/B: GMRES(20) on 216^3 Laplacian — fused Arnoldi kernel vs panel-MGS path.

Also checks compiled-kernel numerics vs the XLA path at small scale first.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import iterativesolvers_tpu as its
import iterativesolvers_tpu.solvers.gmres as g


def fence(arr):
    return float(jnp.sum(arr))


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- numerics check with the COMPILED kernel active (plan needs
    # n >= ~1M; smaller sides fall back to XLA and the check is vacuous) ----
    from iterativesolvers_tpu.ops.pallas_arnoldi import fused_arnoldi_plan
    import jax.numpy as _jnp
    St_s = its.laplacian(1024, 2, dtype=np.float32)  # n = 1,048,576
    St_s = type(St_s)(St_s.n, 5.0, St_s.terms, St_s.coeffs)
    assert fused_arnoldi_plan(St_s.n, St_s.terms, _jnp.float32) is not None
    rng = np.random.default_rng(5)
    bs = jnp.asarray(rng.standard_normal(St_s.n).astype(np.float32))
    orig = g._fused_setup
    g._fused_setup = lambda *a, **k: None
    x_ref = its.gmres(St_s, bs, restart=10, maxiter=30, reltol=1e-8)
    fence(x_ref)
    g._fused_setup = orig
    x = its.gmres(St_s, bs, restart=10, maxiter=30, reltol=1e-8)
    fence(x)
    r = float(jnp.linalg.norm(bs - St_s.mv(x)) / jnp.linalg.norm(bs))
    r_ref = float(jnp.linalg.norm(bs - St_s.mv(x_ref)) / jnp.linalg.norm(bs))
    print(json.dumps({"check": "numerics_small", "r_fused": r,
                      "r_ref": r_ref}), flush=True)
    assert r <= 1.1 * r_ref + 1e-7, (r, r_ref)

    # ---- A/B timing at bench scale ----
    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    n = St.n
    b = jnp.ones((n,), jnp.float32)

    def timed_gmres(maxiter, reps=3, panel_dtype=None):
        x = its.gmres(St, b, restart=20, reltol=0.0, abstol=1e-30,
                      maxiter=maxiter, panel_dtype=panel_dtype)
        fence(x)
        best = float("inf")
        for rr in range(reps):
            bb = b + jnp.float32(1e-6 * (rr + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.gmres(St, bb, restart=20, reltol=0.0, abstol=1e-30,
                          maxiter=maxiter, panel_dtype=panel_dtype)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    iters = 500 - 240
    for name, patch, pdt in (("fused", False, None),
                             ("panel_mgs", True, None),
                             ("fused_bf16", False, jnp.bfloat16),
                             ("panel_mgs_bf16", True, jnp.bfloat16)):
        if patch:
            g._fused_setup = lambda *a, **k: None
        else:
            g._fused_setup = orig
        t0c = time.perf_counter()
        dt = max(timed_gmres(500, panel_dtype=pdt)
                 - timed_gmres(240, panel_dtype=pdt), 1e-9)
        print(json.dumps({
            "path": name,
            "us_per_iter": round(dt / iters * 1e6, 1),
            "wall_incl_compile_s": round(time.perf_counter() - t0c, 1),
        }), flush=True)

    # convergence parity at bench scale: run a real converging solve both ways
    g._fused_setup = orig
    x_f = its.gmres(St, b, restart=20, maxiter=400, reltol=1e-6, log=True)
    g._fused_setup = lambda *a, **k: None
    x_p = its.gmres(St, b, restart=20, maxiter=400, reltol=1e-6, log=True)
    g._fused_setup = orig
    xf, hf = x_f
    xp, hp = x_p
    rf = float(jnp.linalg.norm(b - St.mv(xf)) / jnp.linalg.norm(b))
    rp = float(jnp.linalg.norm(b - St.mv(xp)) / jnp.linalg.norm(b))
    print(json.dumps({"check": "convergence_216", "iters_fused": int(hf.iters),
                      "iters_ref": int(hp.iters), "r_fused": rf,
                      "r_ref": rp}), flush=True)


if __name__ == "__main__":
    main()
