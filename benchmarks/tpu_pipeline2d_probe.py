"""Is the Pallas block pipeline faster on 2-D tiled layouts?

tpu_stencil_probe.py showed the 1-D (block,) pipeline sustains only ~318
GB/s on this worker (copy kernel, 746496-element blocks).  TPU DMA and
Mosaic layouts are native for 2-D (8,128)-tiled arrays — this times the
same copy through (R, 512) and (R, 1024) blocks at several block heights.
If 2-D restores ~700 GB/s, a 2-D rewrite of the stencil kernel is worth
~2x on the matrix-free SpMV; if not, the pipeline is worker-bound.

Run: nohup python benchmarks/tpu_pipeline2d_probe.py > /tmp/p2d.txt 2>&1 &
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

    n = 216 ** 3  # 10,077,696 = 19683 * 512

    def fence(x):
        return float(jnp.sum(x))

    def timed(f, v0, K, reps=4):
        fence(f(v0, K))
        best = float("inf")
        for r in range(reps):
            vv = v0 + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            fence(f(vv, K))
            best = min(best, time.perf_counter() - t0)
        return best

    def copy_kernel(x_blk, y_ref):
        y_ref[...] = x_blk[...] * 0.5

    for lanes in (512, 1024):
        rows_total = -(-n // lanes)
        for rblk in (256, 512, 1024, 2048):
            rows_pad = -(-rows_total // rblk) * rblk
            nb = rows_pad // rblk
            v0 = jnp.ones((rows_pad, lanes), jnp.float32)

            def copy_once(v, rblk=rblk, lanes=lanes, nb=nb):
                return pl.pallas_call(
                    copy_kernel,
                    grid=(nb,),
                    in_specs=[pl.BlockSpec((rblk, lanes), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((rblk, lanes), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 2**20),
                )(v)

            @partial(jax.jit, static_argnames=("K",))
            def loop(v, K, copy_once=copy_once):
                return jax.lax.fori_loop(0, K, lambda i, w: copy_once(w), v)

            dt = max(timed(loop, v0, 256) - timed(loop, v0, 64), 1e-9) / 192
            nbytes = 2 * 4 * rows_pad * lanes
            print(json.dumps({
                "layout": f"({rblk},{lanes})x{nb}",
                "us_per_pass": round(dt * 1e6, 2),
                "eff_gbs_xy": round(nbytes / dt / 1e9, 1),
            }), flush=True)

    print("P2D-DONE", flush=True)


if __name__ == "__main__":
    main()
