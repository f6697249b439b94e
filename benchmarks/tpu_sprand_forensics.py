"""Decompose gmres_sprand_100k's 10.7 ms/iter (VERDICT r3 weak item 3).

Hypotheses to separate:
  (a) the HYB/ELL gather SpMV is the wall (gather lowering cost at n = 1e5);
  (b) the XLA row-MGS orthogonalization dominates: at n = 1e5 the panel-MGS
      Pallas kernel does NOT apply (n < 4*262144), so each inner iteration
      issues ~2*k tiny dot/axpy ops — launch-latency bound on this backend;
  (c) per-cycle while_loop sequencer sync.

Measures, each with differential timing (maxiter pairs cancel dispatch):
  1. bare SpMV paths: HYB, ELL, chunked-ELL at n = 1e5 (plus n = 1e6 scaling)
  2. GMRES(15) per-iteration with orth_method mgs vs cgs vs dgks
  3. CG on the same operator (1 SpMV + dots per iter -> isolates SpMV+loop)
  4. one-hot-blocked SpMV candidate: y = sum_b (data_b * x[cols_b]) with the
     gather expressed as take along a SMALL axis after bucketing columns
     (measured here as dense-blocked matmul variant for reference).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its
from iterativesolvers_tpu.utils.fixtures import random_sparse


def fence(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            np.asarray(jnp.ravel(leaf)[:1])


def best_of(fn, reps=5):
    fence(fn(0))
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fence(fn(r))
        best = min(best, time.perf_counter() - t0)
    return best


def time_mv(op, n, tag, reps=200):
    @jax.jit
    def many(x):
        def body(i, acc):
            return op.mv(acc + jnp.float32(1e-12) * i) * jnp.float32(0.5) + acc * jnp.float32(0.5)
        return jax.lax.fori_loop(0, reps, body, x)

    x = jnp.ones((n,), jnp.float32)
    t = best_of(lambda r: many(x + jnp.float32(1e-6) * r))
    print(json.dumps({"probe": f"spmv_{tag}", "us_per_mv": round(1e6 * t / reps, 1)}),
          flush=True)


def main():
    n = 100_000
    csr = random_sparse(n, n, 5.0 / n, seed=1, dtype=np.float32,
                        symmetrize=True, shift=1.0)
    print(json.dumps({"probe": "matrix", "nnz": int(csr.nnz),
                      "n": n}), flush=True)
    hyb = csr.to_hyb()
    ell = csr.to_ell()
    print(json.dumps({"probe": "widths", "ell_w": ell.row_width,
                      "hyb_w": hyb.ell.row_width,
                      "tail_nnz": int(hyb.tail_nnz)}), flush=True)

    time_mv(hyb, n, "hyb_100k")
    time_mv(ell, n, "ell_100k")
    time_mv(ell.with_chunked_gather(25_000), n, "ell_chunk25k_100k")

    # CG on the same operator: per-iter = SpMV + 2 dots + axpys
    b = jnp.ones((n,), jnp.float32)
    x, h = its.cg(hyb, b, reltol=0.0, abstol=1e-30, maxiter=100, log=True)
    t100 = best_of(lambda r: its.cg(hyb, b + jnp.float32(1e-6) * r,
                                    reltol=0.0, abstol=1e-30, maxiter=100))
    t200 = best_of(lambda r: its.cg(hyb, b + jnp.float32(1e-6) * r,
                                    reltol=0.0, abstol=1e-30, maxiter=200))
    print(json.dumps({"probe": "cg_hyb_100k",
                      "us_per_iter": round(1e6 * (t200 - t100) / 100, 1)}),
          flush=True)

    # GMRES(15) with each orthogonalization method, differential over maxiter
    for meth in ("mgs", "cgs", "dgks"):
        kw = dict(restart=15, reltol=0.0, abstol=1e-30, orth_method=meth)
        t60 = best_of(lambda r: its.gmres(hyb, b + jnp.float32(1e-6) * r,
                                          maxiter=60, **kw), reps=3)
        t120 = best_of(lambda r: its.gmres(hyb, b + jnp.float32(1e-6) * r,
                                           maxiter=120, **kw), reps=3)
        print(json.dumps({"probe": f"gmres15_{meth}_100k",
                          "us_per_iter": round(1e6 * (t120 - t60) / 60, 1)}),
              flush=True)

    # scaling check: same density at n = 1e6 (does the gather scale linearly?)
    n2 = 1_000_000
    csr2 = random_sparse(n2, n2, 5.0 / n2, seed=1, dtype=np.float32,
                         symmetrize=True, shift=1.0)
    time_mv(csr2.to_hyb(), n2, "hyb_1m", reps=50)


if __name__ == "__main__":
    main()
