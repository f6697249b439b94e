"""The preconditioning-WIN workload (VERDICT r4 item 1): CG on a
variable-coefficient diffusion problem at n >= 1e6, four ways:

  none      — unpreconditioned CG on the f32 DIA operator
  jacobi    — diagonal scaling (the cheap baseline that absorbs most of a
              cell-wise random contrast; honesty control)
  rbic      — RedBlackICPreconditioner.from_dia (gather-free closed-form
              IC(0), apply ~2 shift passes ON TOP of the SpMV)
  eisenstat — EisenstatSSOROperator (SSOR(1) via Eisenstat's trick: the
              preconditioned matvec IS ~2 shift passes, no separate SpMV)

Reports converged iterations, warm wall-clock, per-iter differential time,
and the true relative residual for each.  Usage:

  python benchmarks/tpu_precond_win.py [side] [contrast] [smooth] [az]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its
from iterativesolvers_tpu.utils.fixtures import variable_diffusion


def fence(x):
    np.asarray(jnp.ravel(x)[:1])


def run_leg(tag, solve, A_true, b, maxiter):
    x, h = solve(b, maxiter, True)
    fence(x)
    best = float("inf")
    for r in range(3):
        bb = b + jnp.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        x, _ = solve(bb, maxiter, False)
        fence(x)
        best = min(best, time.perf_counter() - t0)
    # per-iteration via differential: re-run at maxiter/2 (unconverged cut)
    it = int(h.iters)
    per_iter_us = None
    if it >= 40:
        cut = it // 2
        t_short = float("inf")
        for r in range(2):
            bb = b + jnp.float32(1e-5 * (r + 1))
            t0 = time.perf_counter()
            xs, _ = solve(bb, cut, False)
            fence(xs)
            t_short = min(t_short, time.perf_counter() - t0)
        per_iter_us = 1e6 * (best - t_short) / (it - cut)
    rel = float(jnp.linalg.norm(b - A_true.mv(x)) / jnp.linalg.norm(b))
    row = dict(iters=it, conv=bool(h.isconverged),
               warm_wall_s=round(best, 4),
               per_iter_us=(round(per_iter_us, 1) if per_iter_us else None),
               rel_resid=round(rel, 8))
    print(json.dumps({"leg": tag, **row}), flush=True)
    return row


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    contrast = float(sys.argv[2]) if len(sys.argv) > 2 else 1e4
    smooth = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    az = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    A = variable_diffusion(side, 3, contrast=contrast, smooth=smooth,
                           aniso=(1.0, 1.0, az), seed=7, dtype=np.float32)
    n = A.shape[0]
    print(json.dumps({"config": dict(side=side, n=n, contrast=contrast,
                                     smooth=smooth, az=az)}), flush=True)
    b = jnp.ones((n,), jnp.float32)
    reltol = 1e-5
    d, _ = A.diagonal()
    Pj = its.DiagonalPreconditioner(d)
    Prb = its.RedBlackICPreconditioner.from_dia(A, side, 3)
    Ah = its.EisenstatSSOROperator.from_dia(A, side, 3)

    def mk(kw):
        def solve(bb, mi, log):
            return (its.cg(A, bb, reltol=reltol, maxiter=mi, log=True, **kw)
                    if log else
                    (its.cg(A, bb, reltol=reltol, maxiter=mi, **kw), None))
        return solve

    def eis_solve(bb, mi, log):
        bhat = Ah.rhs_transform(bb)
        if log:
            xh, h = its.cg(Ah, bhat, reltol=reltol, maxiter=mi, log=True)
            return Ah.solution_transform(xh), h
        xh = its.cg(Ah, bhat, reltol=reltol, maxiter=mi)
        return Ah.solution_transform(xh), None

    rows = {}
    rows["none"] = run_leg("none", mk({}), A, b, 20000)
    rows["jacobi"] = run_leg("jacobi", mk({"Pl": Pj}), A, b, 20000)
    rows["rbic"] = run_leg("rbic", mk({"Pl": Prb}), A, b, 20000)
    rows["eisenstat"] = run_leg("eisenstat", eis_solve, A, b, 20000)
    base = rows["none"]["warm_wall_s"]
    print(json.dumps({"summary": {
        k: dict(speedup_vs_none=round(base / v["warm_wall_s"], 2),
                iters=v["iters"]) for k, v in rows.items()}}), flush=True)


if __name__ == "__main__":
    main()
