"""Block-RHS amortization of the unstructured-gather SpMV (VERDICT r4
item 6): per-VECTOR cost of batched CG at k in {1, 4, 8, 16} on the
sprand-100k HYB matrix (the gather-bound format), plus the raw mv_rows
SpMM per-vector time.

The r4 forensics measured gather cost ~8 ns per INDEX independent of the
fetched width — so the k-wide gathered SpMM should cost ~one SpMV and the
per-vector Gnnz/s should scale ~k until the elementwise work catches up.

Timing: fixed-ladder all-live solves (maxiter=120 = run_chunked warmup
ladder, reltol=0) interleaved across k, best of 3.
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
    np.asarray(jnp.ravel(x)[:1])


def main():
    n = 100_000
    C = random_sparse(n, n, 5.0 / n, seed=1, dtype=np.float32,
                      symmetrize=True, shift=4.0)
    A = C.to_hyb()
    nnz = int(np.sum(np.asarray(C._host("data")) != 0))
    rng = np.random.default_rng(0)
    ks = (1, 4, 8, 16)
    Bs = {k: jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
          for k in ks}
    MI = 120  # exact warmup-ladder point; reltol=0 keeps every step live

    def solve(k, bb):
        if k == 1:
            return its.cg(A, bb[:, 0], reltol=0.0, abstol=1e-30, maxiter=MI)
        return its.block_cg(A, bb, reltol=0.0, abstol=1e-30, maxiter=MI)

    for k in ks:
        fence(solve(k, Bs[k]))
    best = {k: float("inf") for k in ks}
    for r in range(3):
        for k in ks:
            bb = Bs[k] + jnp.float32(1e-6 * (r + 1))
            t0 = time.perf_counter()
            fence(solve(k, bb))
            best[k] = min(best[k], time.perf_counter() - t0)

    base = best[1] / MI
    for k in ks:
        per_iter = best[k] / MI
        per_vec = per_iter / k
        print(json.dumps({
            "k": k,
            "per_iter_us": round(1e6 * per_iter, 1),
            "per_vec_us": round(1e6 * per_vec, 1),
            "per_vec_gnnz_s": round(nnz / per_vec / 1e9, 2),
            "speedup_per_vec_vs_k1": round(base / per_vec, 2),
        }), flush=True)

    # raw SpMM per-vector (the gather amortization in isolation, K chained)
    K = 16

    @jax.jit
    def mm_loop(op, Xr):
        def body(i, Y):
            return Y * jnp.float32(0.2) + op.mv_rows(Y) * jnp.float32(0.05)
        return jax.lax.fori_loop(0, K, body, Xr)

    for k in ks:
        Xr = Bs[k].T
        fence(mm_loop(A, Xr))
        b2 = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            fence(mm_loop(A, Xr + jnp.float32(1e-6 * (r + 1))))
            b2 = min(b2, time.perf_counter() - t0)
        print(json.dumps({
            "mv_rows_k": k,
            "per_vec_us": round(1e6 * b2 / K / k, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
