"""Compiled-on-TPU validation of the Pallas stencil interior inside
shard_map (VERDICT r2 weak #3 / ADVICE high #2).

The per-shard Pallas windowed-stencil kernel is the multi-device hot path
(HaloStencilOperator._local_interior).  Interpret-mode tests cover its
numerics at 1 and 8 virtual devices; what only the real chip can answer is
whether the COMPILED pallas_call lowers and runs inside ``jax.shard_map``
with ``check_vma=True`` (the round-2 advisor reproduced a scratch-vma
mismatch in older plumbing).  Single-chip worlds can still build a
1-device Mesh, so this drives exactly that:

  1. asserts the compiled HLO of HaloStencilOperator.mv contains the
     Mosaic custom call (the kernel is genuinely on the path, not silently
     falling back to the XLA interior);
  2. checks mv output against the global StencilOperator path;
  3. times the per-shard kernel vs the global kernel at the same size
     (single-chip-equivalent per-shard throughput);
  4. runs a full CG solve through the shard_map operator.

Run: nohup python benchmarks/tpu_shardmap_pallas_check.py > /tmp/smcheck.txt 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(arr):
    import jax.numpy as jnp

    return float(jnp.sum(arr))


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.parallel.sharded import (
        HaloStencilOperator, row_mesh, shard_vector,
    )

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 128
    St = its.laplacian(side, 3, dtype=np.float32)   # n = 2,097,152
    n = St.n
    mesh = row_mesh(1)
    op = HaloStencilOperator(St, mesh)
    b = shard_vector(jnp.ones((n,), jnp.float32), mesh)

    # 1) the Mosaic kernel is on the compiled path inside shard_map
    hlo = jax.jit(op.mv).lower(b).compile().as_text()
    has_kernel = ("tpu_custom_call" in hlo) or ("mosaic" in hlo.lower())
    print(json.dumps({"check": "kernel_in_shardmap_hlo",
                      "present": bool(has_kernel)}), flush=True)
    assert has_kernel, "Pallas interior fell back to XLA inside shard_map"

    # 2) numerics vs the global kernel path
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y_sm = np.asarray(op.mv(shard_vector(x, mesh)))
    y_ref = np.asarray(St.mv(x))
    err = float(np.max(np.abs(y_sm - y_ref)) / np.max(np.abs(y_ref)))
    print(json.dumps({"check": "mv_matches_global", "max_rel_err": err}),
          flush=True)
    assert err < 1e-5, err

    # 3) throughput: per-shard kernel (inside shard_map) vs global kernel
    from functools import partial

    @partial(jax.jit, static_argnames=("K", "which"))
    def loop(v, K, which):
        f = op.mv if which == "sm" else St.mv
        return jax.lax.fori_loop(0, K, lambda i, w: f(w) * (1.0 / 7.0), v)

    def timed(which, K, reps=3):
        vv = b if which == "sm" else jnp.ones((n,), jnp.float32)
        fence(loop(vv, K, which))
        best = float("inf")
        for r in range(reps):
            v2 = vv + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(loop(v2, K, which))
            best = min(best, time.perf_counter() - t0)
        return best

    out = {"check": "per_shard_throughput", "n": n}
    for which in ("sm", "global"):
        dt = max(timed(which, 256) - timed(which, 64), 1e-9) / 192
        out[f"us_per_spmv_{which}"] = round(dt * 1e6, 1)
    out["shardmap_over_global"] = round(
        out["us_per_spmv_sm"] / out["us_per_spmv_global"], 3)
    print(json.dumps(out), flush=True)

    # 4) full CG through the shard_map operator
    x4, h = its.cg(op, b, reltol=1e-6, maxiter=600, log=True)
    r = float(jnp.linalg.norm(St.mv(jnp.asarray(np.asarray(x4))) - 1.0))
    print(json.dumps({"check": "cg_through_shardmap",
                      "converged": bool(h.isconverged), "iters": h.iters,
                      "abs_res": r}), flush=True)


if __name__ == "__main__":
    main()
