"""CG + gather-free red-black IC(0) at the 216^3 headline scale: does the
preconditioner pay at pure-CG granularity?

Expectation from the break-even analysis (BENCH_NOTES r4): the RB apply is
~2 stencil passes while a CG iteration is ~1 SpMV + vector work, so
per-iteration cost roughly doubles while IC(0) halves iterations — a
structural near-tie on the constant-coefficient Laplacian, measured here
to pin the honest number (the win case is LOBPCG/harder spectra)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its


def fence(x):
    np.asarray(jnp.ravel(x)[:1])


def main():
    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    Ai = its.compress_values(laplace_dia(side, 3, dtype=np.float32),
                             dtype=jnp.int8)
    P = its.RedBlackICPreconditioner.from_stencil(St)
    n = St.n
    b = jnp.ones((n,), jnp.float32)

    # converged comparison at reltol 1e-6
    out = {}
    for tag, kw in (("unprec", {}), ("rbic", {"Pl": P})):
        x, h = its.cg(Ai, b, reltol=1e-6, maxiter=1000, log=True, **kw)
        fence(x)
        best = float("inf")
        for r in range(3):
            bb = b + jnp.float32(1e-6 * (r + 1))
            t0 = time.perf_counter()
            x = its.cg(Ai, bb, reltol=1e-6, maxiter=1000, **kw)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        rel = float(jnp.linalg.norm(b - Ai.mv(x)) / jnp.linalg.norm(b))
        out[tag] = dict(iters=int(h.iters), conv=bool(h.isconverged),
                        warm_wall_s=round(best, 4), rel=round(rel, 9))
        print(json.dumps({"probe": f"cg216_{tag}", **out[tag]}), flush=True)


if __name__ == "__main__":
    main()
