"""Weak-scaling harness: CG/GMRES on a 3-D Laplacian, fixed rows per device
(BASELINE config 5: 10M-row 3-D Laplacian across hosts, >= 80% efficiency).

Without pod hardware this runs on N virtual CPU devices
(xla_force_host_platform_device_count) to validate the communication
pattern and measure the comm/compute ratio of the halo + psum design; on a
real slice the same script runs unchanged (drop JAX_PLATFORMS=cpu).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling.py [side_per_dev]

Prints one JSON line per device count with per-iteration time and the
weak-scaling efficiency vs the 1-device run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# The container's sitecustomize registers the axon TPU plugin before env
# vars are read, so JAX_PLATFORMS=cpu is ignored; force it via jax.config
# (must happen before any backend is initialized).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.parallel.sharded import (
        HaloDIAOperator, row_mesh, shard_vector,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ndev_all = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    maxiter = 60
    base_per_iter = None

    for D in ndev_all:
        # weak scaling: n grows with D (stack D sub-problems along z)
        # keep a cubic-ish grid: side x side x (side * D) via 3-D Laplacian
        # on (side, side, side*D) — approximate with side^3 * D rows by
        # repeating the z extent.
        import math

        nz = side * D
        # build a (side^2 * nz)-row 3-D Laplacian: reuse laplace_dia on the
        # smallest cube and tile? cleanest: build directly
        n = side * side * nz
        offs = (-side * side, -side, -1, 0, 1, side, side * side)
        i = np.arange(n)
        data = np.zeros((7, n), np.float32)
        for k, off in enumerate(offs):
            if off == 0:
                data[k] = 6.0
                continue
            stride = abs(off)
            dim = {1: side, side: side, side * side: nz}[stride]
            pos = (i // stride) % dim
            mask = pos < dim - 1 if off > 0 else pos > 0
            data[k] = np.where(mask, -1.0, 0.0)
        from iterativesolvers_tpu.operators.sparse import DIAMatrix

        A = DIAMatrix(data, offs, (n, n))
        mesh = row_mesh(D)
        op = HaloDIAOperator(A, mesh)
        b = shard_vector(jnp.ones((n,), jnp.float32), mesh)

        def solve(mi):
            x = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=mi)
            x.block_until_ready()

        solve(maxiter)  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            solve(maxiter)
            times.append(time.perf_counter() - t0)
        per_iter = min(times) / maxiter
        if base_per_iter is None:
            base_per_iter = per_iter
        eff = base_per_iter / per_iter
        print(json.dumps({
            "devices": D,
            "rows": n,
            "rows_per_device": n // D,
            "per_iter_ms": round(per_iter * 1e3, 3),
            "weak_scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
