"""svdl at the originally-planned 1,048,576 x 262,144 scale, with the
chunked-gather SpMV mitigation (VERDICT r2 next-round item 7).

Round 2 bisected a reproducible axon TPU worker crash under sustained
monolithic gather load at this scale (BENCH_NOTES; half scale runs clean).
The ELL SpMV's single (n*w)-element gather is the suspect op; this retry
bounds each gather to ``chunk_rows * w`` elements via
``ELLMatrix.with_chunked_gather`` (sequential chunked gathers, same math)
and attempts the 1M-row solve at several chunk sizes, largest first.

Outcome either way closes the item:
  * a measured 1M-scale svdl number (chunking works), or
  * a documented still-faults repro line per chunk size.

OUTCOME (2026-08-19, round 3): still faults at chunk_rows 131072 AND 8192
(128 sequential 8192-row gathers per SpMV) — the crash is triggered by the
workload scale itself, not by any single gather op's size.  The worker
recovers after ~minutes; half scale (524288 x 131072) remains clean and is
the pinned bench scale (benchmarks/tpu_eigen_bench.py).  Full repro data
in BENCH_NOTES round 3.

Run: nohup python benchmarks/tpu_svdl_1m_retry.py > /tmp/svdl1m.txt 2>&1 &
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

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import random_sparse

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    m, k = 1_048_576, 262_144
    ell = random_sparse(m, k, 8.0 / k, seed=5, dtype=np.float32).to_ell()

    for chunk in (131_072, 8_192):
        S = ell.with_chunked_gather(chunk).with_adjoint()
        print(json.dumps({"stage": "attempt", "m": m, "k": k,
                          "gather_chunk_rows": chunk}), flush=True)
        try:
            t0 = time.perf_counter()
            vals, _L = its.svdl(S, nsv=10, tol=1e-5, maxiter=100)
            fence = float(jnp.sum(vals))  # scalar readback (dispatch-only
            # block_until_ready on this remote backend)
            wall_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            vals, _L = its.svdl(S, nsv=10, tol=1e-5, maxiter=100,
                                key=jax.random.PRNGKey(7))
            fence = float(jnp.sum(vals))
            wall = time.perf_counter() - t0
            sv = np.asarray(vals)
            print(json.dumps({
                "workload": "svdl_1m_chunked_gather",
                "m": m, "k": k, "nsv": 10,
                "gather_chunk_rows": chunk,
                "wall_s_warm": round(wall, 2),
                "wall_s_incl_compile": round(wall_cold, 2),
                "sv_head": [float(v) for v in sv[:3]],
                "monotone": bool((np.diff(sv) <= 1e-5).all()),
            }), flush=True)
            break
        except Exception as e:  # noqa: BLE001 — record the fault and retry
            print(json.dumps({
                "workload": "svdl_1m_chunked_gather",
                "gather_chunk_rows": chunk,
                "fault": f"{type(e).__name__}: {e}"[:400],
            }), flush=True)

    print("SVDL-1M-RETRY-DONE", flush=True)


if __name__ == "__main__":
    main()
