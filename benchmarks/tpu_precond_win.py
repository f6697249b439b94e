"""The preconditioning-WIN workload (VERDICT r4 item 1): CG on a
variable-coefficient diffusion problem at n >= 1e6, four ways:

  none      — unpreconditioned CG on the f32 DIA operator
  jacobi    — diagonal scaling (the cheap baseline that absorbs most of a
              cell-wise random contrast; honesty control)
  rbic      — RedBlackICPreconditioner.from_dia (gather-free closed-form
              IC(0), apply ~2 shift passes ON TOP of the SpMV)
  eisenstat — EisenstatSSOROperator (SSOR(1) via Eisenstat's trick: the
              preconditioned matvec IS ~2 shift passes, no separate SpMV)

Measurement discipline: this worker's bandwidth phase drifts ~2x within a
session (BENCH_NOTES), so legs are timed INTERLEAVED round-robin — every
rep runs all four legs back to back and each leg keeps its best — rather
than sequentially (a sequential run measured eisenstat at 4.3x none
per-iter where the same-phase solver differential shows 1.65x, matching
its stream count).

Usage:  python benchmarks/tpu_precond_win.py [side] [contrast] [smooth] [az]
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

    # chunk: run_chunked granularity — expensive iterations (rbic apply,
    # eisenstat passes) waste chunk/2 masked overshoot iterations at the
    # 256 default (measured: eisenstat converged wall 1.14 s at chunk=256
    # vs 0.71 s at 64); cheap ones want big chunks for the sequencer sync
    def mk(kw, chunk):
        def solve(bb, mi, log):
            if log:
                return its.cg(A, bb, reltol=reltol, maxiter=mi, log=True,
                              chunk=chunk, **kw)
            return its.cg(A, bb, reltol=reltol, maxiter=mi, chunk=chunk,
                          **kw), None
        return solve

    def eis_solve(bb, mi, log, chunk=32):
        bhat = Ah.rhs_transform(bb)
        if log:
            xh, h = its.cg(Ah, bhat, reltol=reltol, maxiter=mi, log=True,
                           chunk=chunk)
            return Ah.solution_transform(xh), h
        return Ah.solution_transform(
            its.cg(Ah, bhat, reltol=reltol, maxiter=mi, chunk=chunk)), None

    Rr = its.RBReducedSystem.from_dia(A, side, 3)

    def red_solve(bb, mi, log, chunk=64):
        bbh, br = Rr.reduce_rhs(bb)
        if log:
            xb, h = its.cg(Rr, bbh, reltol=reltol, maxiter=mi, log=True,
                           chunk=chunk)
            return Rr.expand_solution(xb, br), h
        return Rr.expand_solution(
            its.cg(Rr, bbh, reltol=reltol, maxiter=mi, chunk=chunk),
            br), None

    legs = [("none", mk({}, 256)), ("jacobi", mk({"Pl": Pj}, 256)),
            ("rbic", mk({"Pl": Prb}, 32)), ("eisenstat", eis_solve),
            ("rb_reduced", red_solve)]

    # converged solves (also warms every cache) + true residuals
    rows = {}
    for tag, solve in legs:
        x, h = solve(b, 20000, True)
        fence(x)
        rel = float(jnp.linalg.norm(b - A.mv(x)) / jnp.linalg.norm(b))
        rows[tag] = dict(iters=int(h.iters), conv=bool(h.isconverged),
                         rel_resid=round(rel, 8))
    # warm the half-length cuts for the per-iter differentials
    cuts = {tag: max(rows[tag]["iters"] // 2, 1) for tag, _ in legs}
    for tag, solve in legs:
        x, _ = solve(b, cuts[tag], False)
        fence(x)

    # interleaved timing: each rep runs every leg's (full, cut) pair
    walls = {tag: float("inf") for tag, _ in legs}
    shorts = {tag: float("inf") for tag, _ in legs}
    for r in range(3):
        bb = b + jnp.float32(1e-6 * (r + 1))
        for tag, solve in legs:
            t0 = time.perf_counter()
            x, _ = solve(bb, 20000, False)
            fence(x)
            walls[tag] = min(walls[tag], time.perf_counter() - t0)
            t0 = time.perf_counter()
            x, _ = solve(bb, cuts[tag], False)
            fence(x)
            shorts[tag] = min(shorts[tag], time.perf_counter() - t0)

    for tag, _ in legs:
        it = rows[tag]["iters"]
        diff_iters = it - cuts[tag]
        per = (1e6 * (walls[tag] - shorts[tag]) / diff_iters
               if diff_iters >= 20 else None)
        rows[tag].update(warm_wall_s=round(walls[tag], 4),
                         per_iter_us=(round(per, 1) if per else None))
        print(json.dumps({"leg": tag, **rows[tag]}), flush=True)
    base = rows["none"]["warm_wall_s"]
    print(json.dumps({"summary": {
        tag: dict(speedup_vs_none=round(base / v["warm_wall_s"], 2),
                  iters=v["iters"]) for tag, v in rows.items()}}),
        flush=True)


if __name__ == "__main__":
    main()
