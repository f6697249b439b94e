"""Profiled (ground-truth device-time) roofline table at n = 216^3.

Every earlier wall-clock differential on this remote-attached part embeds
dispatch/sync noise; this harness reads per-op device durations from
``jax.profiler`` traces instead, for:

  copy / triad            -> the real streaming bandwidth of the part
  XLA DIA mv, fused CG    -> is the stored-format path already at roofline?
  pallas dia_spmv(+dot)   -> head-to-head with pre-padded diagonals
                             (decides keep-vs-delete, VERDICT item 1)
  pallas stencil mv(+dot) -> the matrix-free kernel's device time
  bf16 DIA mv             -> mixed-precision matrix storage win
  HYB sprand mv +/- RCM   -> does locality help the gather wall?

Run: nohup python benchmarks/tpu_roofline.py > /tmp/roofline.txt 2>&1 &
Never run two TPU processes at once.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NCALLS = 8


def fence(arr):
    import jax.numpy as jnp
    if isinstance(arr, tuple):
        arr = arr[0]
    return float(jnp.sum(arr))


def profiled(label, fn, x, shift, bytes_model):
    """Trace NCALLS applications of fn on perturbed inputs; report the
    mean device duration of the top-level jit event and the leaf total."""
    import jax

    f = jax.jit(fn)
    fence(f(x))  # compile
    fence(f(shift(x, 1)))
    tdir = f"/tmp/trace_roofline/{label.replace(' ', '_').replace('/', '_')}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for r in range(NCALLS):
        fence(f(shift(x, 2 + r)))
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"{label}: NO TRACE", flush=True)
        return None
    with gzip.open(files[0], "rt") as f_:
        tr = json.load(f_)
    events = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, nm in pid_names.items()
                if any(k in nm for k in ("TPU", "Chip", "XLA Ops", "device"))}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or (dev_pids and e.get("pid") not in dev_pids):
            continue
        agg[e.get("name", "?")] = agg.get(e.get("name", "?"), 0.0) + e.get("dur", 0)
    # top-level jit events carry the whole call; leaf ops nest underneath
    top = {k: v for k, v in agg.items() if k.startswith("jit_")}
    t_top = sum(top.values()) / NCALLS if top else None
    ordered = sorted(agg.items(), key=lambda kv: -kv[1])[:6]
    if t_top is not None:
        bw = bytes_model / (t_top * 1e-6) / 1e9 if bytes_model else 0.0
        print(f"{label}: {t_top:8.1f} us/call device   "
              f"(model {bytes_model/1e6:.0f} MB -> {bw:.0f} GB/s eff)",
              flush=True)
    else:
        print(f"{label}: no jit_ event; top ops:", flush=True)
    for name, dur in ordered:
        print(f"      {dur/NCALLS:9.1f} us  {name[:100]}", flush=True)
    return t_top


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia, random_sparse

    print("device:", jax.devices()[0].device_kind, flush=True)
    side = 216
    A = laplace_dia(side, 3, dtype=np.float32)
    St = its.laplacian(side, 3, dtype=np.float32)
    n = A.shape[0]
    x = jnp.ones((n,), jnp.float32)
    sh = lambda v, r: v + jnp.float32(1e-6 * r)
    NB = 4 * n  # bytes of one n-vector pass

    print(f"\n== A. streaming kernels, n = {side}^3 = {n} ==", flush=True)
    profiled("copy 2-stream", lambda v: v * jnp.float32(1.0000001), x, sh, 2 * NB)
    c = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    profiled("triad 3-stream", lambda v: jnp.float32(0.999) * v + c, x, sh, 3 * NB)

    print("\n== B. stored-DIA SpMV paths (9-stream model) ==", flush=True)
    profiled("XLA DIA mv", A.mv, x, sh, 9 * NB)
    profiled("XLA DIA mv_dot", lambda v: A.mv_dot(v), x, sh, 9 * NB)

    # bf16 matrix storage, f32 vectors: 7*2 + 4 + 4 bytes/row
    Abf = type(A)(tuple(d.astype(jnp.bfloat16) for d in A.diags),
                  A.offsets, A.shape)
    profiled("bf16-DIA mv (f32 x)",
             lambda v: sum(jnp.float32(0.0) + d.astype(jnp.float32) *
                           jax.lax.dynamic_slice_in_dim(
                               jnp.pad(v, (46656, 46656)), 46656 + off, n)
                           for d, off in zip(Abf.diags, Abf.offsets)),
             x, sh, (7 * 2 + 8) * n)

    print("\n== C. pallas DIA kernel, pre-padded diagonals ==", flush=True)
    try:
        from iterativesolvers_tpu.ops.pallas_spmv import _plan, dia_spmv, dia_spmv_dot
        halo, block, nb, npad = _plan(n, A.offsets, 32768)
        pd = tuple(jnp.pad(d, (0, npad - n)) for d in A.diags)
        profiled("pallas dia_spmv",
                 lambda v: dia_spmv(pd, A.offsets, v, prepadded=True),
                 x, sh, 9 * NB)
        profiled("pallas dia_spmv_dot",
                 lambda v: dia_spmv_dot(pd, A.offsets, v, v, prepadded=True)[0],
                 x, sh, 9 * NB)
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print("PALLAS-DIA-FAILED", flush=True)

    print("\n== D. stencil paths (2-stream model) ==", flush=True)
    profiled("XLA stencil _apply", lambda v: St._apply(v, conj=False), x, sh, 2 * NB)
    profiled("pallas stencil mv", St.mv, x, sh, 2 * NB)
    profiled("pallas stencil mv_dot", lambda v: St.mv_dot(v)[0], x, sh, 2 * NB)

    print("\n== E. fused CG step bodies (64 iters inside one jit) ==", flush=True)
    from iterativesolvers_tpu.operators.preconditioners import IdentityPreconditioner
    from iterativesolvers_tpu.solvers.cg import _cg_init, _cg_step

    Pl = IdentityPreconditioner()
    b = jnp.ones((n,), jnp.float32)
    for label, op, per_iter_bytes in (
        ("CG/stencil+pallas", St, (2 + 5) * NB),
        ("CG/DIA-XLA", A, (9 + 5) * NB),
    ):
        st0 = _cg_init(op, b, jnp.zeros((n,), jnp.float32),
                       jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(1e-30, jnp.float32), 512, True)

        def cg64(s, _op=op):
            return jax.lax.fori_loop(0, 64, lambda i, t: _cg_step(_op, Pl, t), s)

        t = profiled(label, cg64, st0,
                     lambda s, r: s._replace(r=s.r + jnp.float32(1e-7 * r)),
                     64 * per_iter_bytes)
        if t:
            print(f"      -> {t/64:.1f} us/iter device", flush=True)

    print("\n== F. sprand HYB gather wall: RCM locality probe ==", flush=True)
    ns = 100_000
    C = random_sparse(ns, ns, 5.0 / ns, seed=1, dtype=np.float32,
                      symmetrize=True, shift=1.0)
    xs = jnp.ones((ns,), jnp.float32)
    H0 = C.to_hyb()
    profiled("HYB mv (natural order)", H0.mv, xs, sh, 0)
    perm, bw = C.rcm()
    print(f"   RCM half-bandwidth: {bw} (n = {ns})", flush=True)
    P = C.permute(perm)
    H1 = P.to_hyb()
    profiled("HYB mv (RCM order)", H1.mv, xs, sh, 0)
    E1 = P.to_ell()
    profiled("ELL mv (RCM order)", E1.mv, xs, sh, 0)

    print("\nROOFLINE-DONE", flush=True)


if __name__ == "__main__":
    main()
