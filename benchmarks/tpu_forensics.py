"""Round-2 TPU forensics (VERDICT items 1-2).

Answers, with on-device evidence:
  A. What is the real streaming HBM bandwidth of this part?  (round-1 triad
     measured 2789 GB/s — 3.4x the v5e datasheet 819, but ~= the v5p 2765;
     re-measure with a 2-stream copy AND the triad, big buffers, scalar
     fences, perturbed inputs.)
  B. Does the Pallas DIA SpMV compile on real TPU, and how does it time
     against the XLA shifted-adds path at n=2M and n=216^3?
  C. Where does the 10M-row CG iteration actually spend its time?
     (jax.profiler trace -> per-op device durations.)

Run: nohup python benchmarks/tpu_forensics.py > /tmp/forensics.txt 2>&1 &
Never run two TPU processes at once.
"""

import glob
import gzip
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(arr):
    import jax.numpy as jnp
    return float(jnp.sum(arr))


def section(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    dev = jax.devices()[0]
    print("device:", dev.device_kind, dev.platform)

    # ---------------- A. streaming bandwidth ------------------------------
    section("A. streaming bandwidth")
    n = 1 << 26  # 64M f32 = 256 MB per buffer

    @partial(jax.jit, static_argnames=("k",))
    def copyloop(v, k):
        # y = a*x: pure 2-stream (read + write) = 8 B/elem; the multiplier
        # is read from the carry so nothing constant-folds to a broadcast
        return jax.lax.fori_loop(0, k, lambda i, v: v * 1.0000001, v)

    c_arr = None

    @partial(jax.jit, static_argnames=("k",))
    def triadloop(v, c, k):
        # v = 0.999*v + c: 3 streams = 12 B/elem (c is a real array arg, so
        # it cannot be folded into a scalar broadcast)
        return jax.lax.fori_loop(0, k, lambda i, v: 0.999 * v + c, v)

    v0 = jnp.ones((n,), jnp.float32)
    c_arr = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)  # non-constant

    def timed(f, k, reps=4):
        fence(f(k))
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            fence(f(k))
            best = min(best, time.perf_counter() - t0)
        return best

    for label, f, bpe in (
        ("copy 8B/elem", lambda k: copyloop(v0 + 1e-7 * k, k), 8),
        ("triad 12B/elem", lambda k: triadloop(v0 + 1e-7 * k, c_arr, k), 12),
    ):
        t = (timed(f, 200) - timed(f, 50)) / 150
        bw = bpe * n / t
        print(f"{label}: {t*1e6:.1f} us/pass, {bw/1e9:.1f} GB/s", flush=True)

    # ---------------- B. Pallas DIA SpMV ----------------------------------
    section("B. pallas dia_spmv compile + head-to-head")
    from iterativesolvers_tpu.ops.pallas_spmv import dia_spmv
    from iterativesolvers_tpu.utils.fixtures import laplace_dia
    import iterativesolvers_tpu as its

    # compile check at a small size first
    try:
        A0 = laplace_dia(16, 3, dtype=np.float32)
        x0 = jnp.ones((A0.shape[0],), jnp.float32)
        y_pal = dia_spmv(A0.diags, A0.offsets, x0)
        y_ref = A0.mv(x0)
        err = float(jnp.max(jnp.abs(y_pal - y_ref)))
        print(f"pallas compile: OK, max err vs XLA path = {err:.2e}", flush=True)
        pallas_ok = err < 1e-5
    except Exception:
        print("pallas compile FAILED:", flush=True)
        traceback.print_exc()
        pallas_ok = False

    def bench_spmv(apply_fn, x, label, K=64, reps=3):
        # x_{k+1} = apply(x_k)/7 keeps the loop-carried dependency honest
        @partial(jax.jit, static_argnames=("k",))
        def loop(x, k):
            return jax.lax.fori_loop(
                0, k, lambda i, x: apply_fn(x) * np.float32(1 / 7.0), x
            )
        # warm BOTH loop lengths before timing (each k is its own executable)
        fence(loop(x, K))
        fence(loop(x, K // 4))
        best_l = best_s = float("inf")
        for r in range(reps):
            xx = x + np.float32(1e-6 * (r + 1))
            t0 = time.perf_counter()
            fence(loop(xx, K))
            best_l = min(best_l, time.perf_counter() - t0)
            xx = x + np.float32(1e-6 * (r + 1) + 1e-7)
            t0 = time.perf_counter()
            fence(loop(xx, K // 4))
            best_s = min(best_s, time.perf_counter() - t0)
        best = (best_l - best_s) / (K - K // 4)
        print(f"{label}: {best*1e6:.1f} us/apply", flush=True)
        return best

    for side in (128, 216):
        A = laplace_dia(side, 3, dtype=np.float32)
        nn = A.shape[0]
        x = jnp.ones((nn,), jnp.float32)
        print(f"-- n = {side}^3 = {nn}", flush=True)
        t_xla = bench_spmv(A.mv, x, "XLA DIAMatrix.mv")
        St = its.laplacian(side, 3, dtype=np.float32)
        t_st = bench_spmv(St.mv, x, "StencilOperator.mv")
        if pallas_ok:
            try:
                t_pal = bench_spmv(
                    lambda v: dia_spmv(A.diags, A.offsets, v),
                    x, "pallas dia_spmv")
            except Exception:
                print("pallas bench FAILED:", flush=True)
                traceback.print_exc()
        # roofline context: DIA SpMV streams (7 diag + x + y) * 4 B/row
        bytes_spmv = 9 * 4 * nn
        print(f"   (spmv roofline bytes = {bytes_spmv/1e6:.0f} MB)", flush=True)

    # ---------------- C. profiler trace of the 10M-row CG -----------------
    section("C. jax.profiler trace, 64 fused CG steps at 216^3")
    from iterativesolvers_tpu.operators.preconditioners import IdentityPreconditioner
    from iterativesolvers_tpu.solvers.cg import _cg_init, _cg_step

    A = laplace_dia(216, 3, dtype=np.float32)
    St = its.laplacian(216, 3, dtype=np.float32)
    nn = A.shape[0]
    b = jnp.ones((nn,), jnp.float32)
    Pl = IdentityPreconditioner()

    for label, op in (("stencil", St), ("dia", A)):
        st = _cg_init(op, b, jnp.zeros((nn,), jnp.float32),
                      jnp.asarray(0.0, jnp.float32), jnp.asarray(1e-30, jnp.float32),
                      512, True)

        @jax.jit
        def cg64(s):
            return jax.lax.fori_loop(0, 64, lambda i, s: _cg_step(op, Pl, s), s)

        out = cg64(st)
        fence(out.x)  # compile + settle
        t0 = time.perf_counter()
        out = cg64(out)
        fence(out.x)
        wall = time.perf_counter() - t0
        print(f"{label}: 64 CG steps wall (fenced) = {wall*1e3:.1f} ms "
              f"-> {wall/64*1e6:.1f} us/iter", flush=True)

        tdir = f"/tmp/trace_cg_{label}"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        out = cg64(out)
        fence(out.x)
        jax.profiler.stop_trace()

        # parse: sum device-track event durations by op name
        files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
        if not files:
            print("no trace file found", flush=True)
            continue
        with gzip.open(files[0], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        # device lanes: pid names containing 'TPU' / 'Chip'; fall back to all X events
        pid_names = {e["pid"]: e["args"].get("name", "")
                     for e in events if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
        dev_pids = {p for p, nm in pid_names.items()
                    if any(k in nm for k in ("TPU", "Chip", "XLA Ops", "device"))}
        agg = {}
        total = 0.0
        for e in events:
            if e.get("ph") != "X":
                continue
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6  # us -> s
            agg[name] = agg.get(name, 0.0) + dur
            total += dur
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:15]
        print(f"pid lanes: { {p: pid_names.get(p,'') for p in dev_pids} }", flush=True)
        print(f"total device-event time {total*1e3:.1f} ms over 64 iters", flush=True)
        for name, dur in top:
            print(f"  {dur*1e3:8.2f} ms  {name[:110]}", flush=True)

    print("\nFORENSICS-DONE", flush=True)


if __name__ == "__main__":
    main()
