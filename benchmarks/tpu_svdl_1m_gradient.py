"""svdl at >= 1M rows on the gather-free GradientOperator (VERDICT r3 item 7).

The 1,048,576 x 262,144 stored-ELL svdl workload reproducibly crashes the
TPU worker under sustained gather load (BENCH_NOTES rounds 2-3; chunked
gathers do not help).  The GradientOperator's mv/rmv are shifted reads +
masks — zero gathers — so GKL bidiagonalization streams at vector
bandwidth.  Grid 101^3 -> operator 3,090,903 x 1,030,301 (3.09M rows).

Reports wall-clock for an nsv=6 partial SVD and a per-GKL-step time, plus
a correctness anchor: the leading singular values of the 3-D gradient are
analytic — sigma^2 are eigenvalues of the 3-D Laplacian (G^T G = A_lap),
so sigma_max -> sqrt(lambda_max) = sqrt(12 sin^2(pi*101/(2*102)) ... ) ~
sqrt(~11.997) for the 101-point axis.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its
from iterativesolvers_tpu.operators.stencil import GradientOperator


def fence(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            np.asarray(jnp.ravel(leaf)[:1])


def main():
    side = 101
    G = GradientOperator((side, side, side), dtype=np.float32)
    m, n = G.shape
    print(json.dumps({"probe": "shape", "rows": m, "cols": n}), flush=True)

    t0 = time.perf_counter()
    vals, L = its.svdl(G, nsv=6, tol=1e-3, maxiter=100,
                       key=jax.random.PRNGKey(0))
    fence(vals)
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    vals, L = its.svdl(G, nsv=6, tol=1e-3, maxiter=100,
                       key=jax.random.PRNGKey(1))
    fence(vals)
    t = time.perf_counter() - t0

    # analytic anchor: G^T G for forward differences is the NEUMANN
    # Laplacian — per-axis lambda = 4 sin^2(q pi / (2 side)), q <= side-1
    lam_ax = 4 * np.sin((side - 1) * np.pi / (2 * side)) ** 2
    sig_max = float(np.sqrt(3 * lam_ax))
    sv = np.asarray(vals, np.float64)
    print(json.dumps({
        "probe": "svdl_gradient_101cubed",
        "rows": m, "cols": n, "nsv": 6,
        "wall_s_warm": round(t, 3),
        "wall_s_first": round(t_first, 3),
        "sigma_max": round(float(sv[0]), 6),
        "sigma_max_analytic": round(sig_max, 6),
        "rel_err": round(abs(float(sv[0]) - sig_max) / sig_max, 8),
        "all_sv": [round(float(s), 6) for s in sv],
    }), flush=True)


if __name__ == "__main__":
    main()
