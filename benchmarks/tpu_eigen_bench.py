"""LOBPCG + svdl at benchmark scale on the real chip (VERDICT r1 item 8).

  * LOBPCG: nev=16 smallest of the 1,030,301-row (101^3) 3-D Laplacian
    (matrix-free stencil operator; block SpMM through the DIA path), tol
    1e-4, f32.
  * svdl: nsv=10 of a 524,288 x 131,072 random sparse operator (HYB with
    precomputed adjoint — GKL needs mv AND rmv every inner step).  The
    originally planned 1,048,576 x 262,144 scale reproducibly faults the
    axon TPU worker under sustained gather load (bisected in BENCH_NOTES
    round 2); the bench pins the largest worker-stable scale.

Timing: wall around the warm second solve, scalar-readback fenced,
perturbed inputs (single-solve workloads — no maxiter ladder to
difference; the ~2 ms dispatch overhead is <1% of these walls).

Run: nohup python benchmarks/tpu_eigen_bench.py > /tmp/eigen_bench.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia, random_sparse

    print("device:", jax.devices()[0].device_kind, flush=True)

    # ---------------- LOBPCG, 1M-row 3-D Laplacian, nev=16 ----------------
    side = 101
    A = laplace_dia(side, 3, dtype=np.float32)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    # A/B: f32 diagonals vs the exact int8 value stream (compress_values;
    # the Laplacian's {6,-1,0} is integer-valued) — the block SpMM streams
    # the diagonals for every panel row, so compression multiplies.
    lam_true = 3 * 2 * (1 - np.cos(np.pi / (side + 1)))
    for tag, op in (("f32", A), ("int8", its.compress_values(A))):
        r = its.lobpcg(op, X0, largest=False, tol=1e-4, maxiter=150)
        float(jnp.sum(r.lam))  # scalar readback: block_until_ready is dispatch-only
        lam0 = float(np.asarray(r.lam)[0])
        t0 = time.perf_counter()
        r = its.lobpcg(op, X0 + jnp.float32(1e-5), largest=False, tol=1e-4,
                       maxiter=150)
        lam_fence = float(jnp.sum(r.lam))
        wall = time.perf_counter() - t0
        # analytic smallest eigenvalue of the 3-D Dirichlet Laplacian stencil
        print(f"LOBPCG[{tag}] n={n} nev=16: {wall:.2f} s, "
              f"iters={r.iterations}, converged={r.converged}", flush=True)
        print(f"  lam[0]={lam0:.6e} vs analytic {lam_true:.6e} "
              f"(rel {abs(lam0-lam_true)/lam_true:.2e})", flush=True)

    # ---------------- svdl, large sparse, nsv=10 ---------------------------
    # NOTE: 1,048,576 x 262,144 reproducibly faults the axon TPU worker
    # ("TPU worker process crashed or restarted"), with BOTH ELL and HYB
    # operators, sometimes on the first solve and sometimes the second —
    # a backend fault under sustained gather load, bisected 2026-08-19
    # (quarter scale and half scale run clean; see BENCH_NOTES round 2).
    # Benchmark at the largest reliable scale instead.
    m, k = 524_288, 131_072
    S = random_sparse(m, k, 8.0 / k, seed=5,
                      dtype=np.float32).to_hyb().with_adjoint()
    vals, _L = its.svdl(S, nsv=10, tol=1e-5, maxiter=100)
    float(jnp.sum(vals))  # scalar readback fence
    t0 = time.perf_counter()
    vals, _L = its.svdl(S, nsv=10, tol=1e-5, maxiter=100,
                        key=jax.random.PRNGKey(7))
    sv_fence = float(jnp.sum(vals))
    wall2 = time.perf_counter() - t0
    sv = np.asarray(vals)
    print(f"svdl {m}x{k} nsv=10: {wall2:.2f} s", flush=True)
    print(f"  sv[:3]={sv[:3]}, monotone={bool((np.diff(sv) <= 1e-5).all())}",
          flush=True)

    print("EIGEN-BENCH-DONE", flush=True)


if __name__ == "__main__":
    main()
