"""Can pallas_call take whole-array VMEM operands at n = 10M and run at
VMEM speed inside a fori_loop?

Hypothesis from tpu_pipeline2d_probe.py: the ~320 GB/s cap of the blocked
HBM pipeline is the cost of spilling the loop carry to HBM and re-reading
it; XLA's own fusions keep the carried vector VMEM-resident (the 8 TB/s
triad).  A pallas_call with memory_space=VMEM in/out specs hands the whole
array to the kernel in VMEM — if XLA then keeps the buffer resident across
loop iterations, the kernel's effective bandwidth should jump an order of
magnitude.  40 MB in + 40 MB out + scratch fits the v5e's 128 MB VMEM.

Run: nohup python benchmarks/tpu_vmem_operand_probe.py > /tmp/vmemop.txt 2>&1 &
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    n = 216 ** 3
    rows, lanes = 19683, 512  # 19683 * 512 = n exactly
    v0 = jnp.ones((rows, lanes), jnp.float32)

    def fence(x):
        return float(jnp.sum(x))

    def timed(f, K, reps=4):
        fence(f(v0, K))
        best = float("inf")
        for r in range(reps):
            vv = v0 + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(f(vv, K))
            best = min(best, time.perf_counter() - t0)
        return best

    def copy_kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 0.5

    def copy_once(v):
        return pl.pallas_call(
            copy_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 2**20),
        )(v)

    @partial(jax.jit, static_argnames=("K",))
    def loop(v, K):
        return jax.lax.fori_loop(0, K, lambda i, w: copy_once(w), v)

    try:
        dt = max(timed(loop, 256) - timed(loop, 64), 1e-9) / 192
        print(json.dumps({"path": "vmem_operand_copy",
                          "us_per_pass": round(dt * 1e6, 2),
                          "eff_gbs_xy": round(2 * 4 * n / dt / 1e9, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001 - report and continue
        print(json.dumps({"path": "vmem_operand_copy",
                          "error": repr(e)[:400]}), flush=True)

    # XLA reference: identical loop body as a bare fusion
    @partial(jax.jit, static_argnames=("K",))
    def xla_loop(v, K):
        return jax.lax.fori_loop(0, K, lambda i, w: w * 0.5 + 0.5, v)

    dt = max(timed(xla_loop, 256) - timed(xla_loop, 64), 1e-9) / 192
    print(json.dumps({"path": "xla_fusion_copy",
                      "us_per_pass": round(dt * 1e6, 2),
                      "eff_gbs_xy": round(2 * 4 * n / dt / 1e9, 1)}),
          flush=True)

    print("VMEMOP-DONE", flush=True)


if __name__ == "__main__":
    main()
