"""Round-2 decision experiments on the real chip (wall differentials of
fused fori loops — the methodology whose numbers matched the profiled CG
device times):

  1. ragged-(n,) stencil kernel output: does dropping the y[:n] slice pass
     show up end-to-end? (profiled slice cost: 62 us)
  2. CG step with fused mv_dot vs plain mv + XLA-fused vdot
  3. pallas dia_spmv_dot (diags as jit args, pre-padded) vs the XLA DIA
     fused SpMV+dot — the keep-or-delete head-to-head (VERDICT item 1)

Run: nohup python benchmarks/tpu_experiments_r2.py > /tmp/exp_r2.txt 2>&1 &
"""

import os
import sys
import time
import traceback
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(arr):
    import jax.numpy as jnp
    return float(jnp.sum(arr))


def loop_time(loop, x, K, reps=3):
    fence(loop(x, K))
    fence(loop(x, K // 4))
    bl = bs = float("inf")
    import jax.numpy as jnp
    for r in range(reps):
        xx = x + jnp.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        fence(loop(xx, K))
        bl = min(bl, time.perf_counter() - t0)
        xx = x + jnp.float32(1e-6 * (r + 1) + 1e-7)
        t0 = time.perf_counter()
        fence(loop(xx, K // 4))
        bs = min(bs, time.perf_counter() - t0)
    return (bl - bs) / (K - K // 4)


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    print("device:", jax.devices()[0].device_kind, flush=True)
    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    A = laplace_dia(side, 3, dtype=np.float32)
    n = St.n
    x = jnp.ones((n,), jnp.float32)

    # --- 1. ragged-output stencil kernel: correctness + in-loop time ------
    y = St.mv(x)
    yr = St._apply(x, conj=False)
    err = float(jnp.max(jnp.abs(y - yr)) / jnp.max(jnp.abs(yr)))
    yd, d = St.mv_dot(x)
    derr = abs(float(d) - float(jnp.sum(x * yr))) / abs(float(jnp.sum(x * yr)))
    print(f"1. ragged stencil: mv rel err {err:.2e}, dot rel err {derr:.2e}",
          flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def mv_loop(v, k):
        return jax.lax.fori_loop(0, k,
                                 lambda i, w: St.mv(w) * np.float32(1 / 7), v)

    @partial(jax.jit, static_argnames=("k",))
    def mvdot_loop(v, k):
        def body(i, w):
            y, dd = St.mv_dot(w)
            return y * (np.float32(1 / 7) + 0 * dd.astype(w.dtype))
        return jax.lax.fori_loop(0, k, body, v)

    t_mv = loop_time(mv_loop, x, 64)
    t_mvd = loop_time(mvdot_loop, x, 64)
    print(f"   stencil mv in-loop:     {t_mv*1e6:7.1f} us", flush=True)
    print(f"   stencil mv_dot in-loop: {t_mvd*1e6:7.1f} us", flush=True)

    # --- 2. CG step: fused mv_dot vs plain mv + XLA vdot ------------------
    from iterativesolvers_tpu.operators.preconditioners import IdentityPreconditioner
    from iterativesolvers_tpu.solvers.cg import _cg_init, _cg_step
    from iterativesolvers_tpu.solvers.common import vdot

    Pl = IdentityPreconditioner()
    b = jnp.ones((n,), jnp.float32)

    def _cg_step_plain(op, Pl_, state):
        # identical math to _cg_step but without the fused bundle
        c = state.r
        rho = vdot(c, state.r)
        beta = rho / state.rho
        u = c + beta * state.u
        c2 = op.mv(u)
        alpha = rho / vdot(u, c2)
        xx = state.x + alpha * u
        r = state.r - alpha * c2
        from iterativesolvers_tpu.solvers.common import norm
        residual = norm(r)
        k = state.k + 1
        log = state.resnorm_log.at[state.k].set(residual)
        return state._replace(x=xx, r=r, u=u, residual=residual, rho=rho,
                              k=k, resnorm_log=log)

    st0 = _cg_init(A, b, jnp.zeros((n,), jnp.float32),
                   jnp.asarray(0.0, jnp.float32),
                   jnp.asarray(1e-30, jnp.float32), 512, True)

    for label, op, stepper in (
        ("CG stencil fused mv_dot", St, _cg_step),
        ("CG stencil plain mv    ", St, _cg_step_plain),
        ("CG DIA-XLA mv_dot      ", A, _cg_step),
        ("CG DIA-XLA plain mv    ", A, _cg_step_plain),
    ):
        @partial(jax.jit, static_argnames=("k",))
        def cg_loop(s, k, _op=op, _st=stepper):
            return jax.lax.fori_loop(0, k, lambda i, t: _st(_op, Pl, t), s).x

        def cgl(v, k, _f=cg_loop):
            return _f(st0._replace(r=v), k)

        t = loop_time(cgl, b, 64)
        print(f"2. {label}: {t*1e6:7.1f} us/iter", flush=True)

    # --- 3. pallas DIA vs XLA DIA, diags as args --------------------------
    try:
        from iterativesolvers_tpu.ops.pallas_spmv import _plan, dia_spmv_dot
        halo, block, nb, npad = _plan(n, A.offsets, 32768)
        pd = tuple(jnp.pad(dg, (0, npad - n)) for dg in A.diags)

        @partial(jax.jit, static_argnames=("k",))
        def pal_loop(diags, v, k):
            def body(i, w):
                y2, dd = dia_spmv_dot(diags, A.offsets, w, w, prepadded=True)
                return y2 * (np.float32(1 / 7) + 0 * dd.astype(w.dtype))
            return jax.lax.fori_loop(0, k, body, v)

        y3, d3 = dia_spmv_dot(pd, A.offsets, x, x, prepadded=True)
        err3 = float(jnp.max(jnp.abs(y3 - yr)) / jnp.max(jnp.abs(yr)))
        print(f"3. pallas dia compile OK, rel err {err3:.2e}", flush=True)
        t_pal = loop_time(lambda v, k: pal_loop(pd, v, k), x, 64)
        print(f"   pallas dia_spmv_dot in-loop: {t_pal*1e6:7.1f} us", flush=True)

        @partial(jax.jit, static_argnames=("k",))
        def xla_loop(diags, v, k):
            A2 = type(A)(diags, A.offsets, A.shape)
            def body(i, w):
                y2, dd = A2.mv_dot(w)
                return y2 * (np.float32(1 / 7) + 0 * dd.astype(w.dtype))
            return jax.lax.fori_loop(0, k, body, v)

        t_xla = loop_time(lambda v, k: xla_loop(A.diags, v, k), x, 64)
        print(f"   XLA DIA mv_dot in-loop:      {t_xla*1e6:7.1f} us", flush=True)
    except Exception:
        traceback.print_exc()
        print("PALLAS-DIA-FAILED", flush=True)

    print("EXP-R2-DONE", flush=True)


if __name__ == "__main__":
    main()
