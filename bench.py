"""Benchmark: CG and GMRES(20) on a large 3-D Laplacian — SpMV throughput
vs HBM roofline.

Prints one JSON line per metric (headline CG first):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The BASELINE target (BASELINE.md) is SpMV throughput > 70% of the HBM
roofline in nnz/s per chip, measured inside a real CG solve (not a bare
SpMV microbenchmark).  ``vs_baseline`` is value / (0.70 * roofline):
>= 1.0 beats the target.

Roofline model for the DIA (7-point stencil) SpMV in f32:
  streamed bytes per row = 7 diag values * 4B + 1 x read * 4B + 1 y write * 4B
  (x is re-read once per pass; XLA fuses the 7 shifted reads into one pass
  over x in the ideal case — we charge the *optimistic* model so the
  reported fraction is conservative).
  bytes/nnz = (7*4 + 4 + 4) / 7 = 5.14 B
The CG iteration adds 2 reductions + 3 axpy-like passes over vectors,
which we time separately as iteration throughput.
"""

import json
import time

import numpy as np


def hbm_bandwidth_gbs() -> float:
    """Per-chip HBM bandwidth (GB/s).  TPU v5e: 819 GB/s; v4: 1228; v5p: 2765."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return 819.0
    if "v4" in kind:
        return 1228.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v6" in kind:
        return 1640.0
    return 819.0  # conservative default


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    side = 216  # 216^3 = 10,077,696 rows (the BASELINE "10M-row 3-D
    # Laplacian" north-star workload), 7 diagonals -> ~70M nnz
    A = laplace_dia(side, 3, dtype=np.float32)
    St = its.laplacian(side, 3, dtype=np.float32)  # same matrix, matrix-free
    # compressed value streams: the Laplacian's values {6,-1,0} are exact in
    # bf16 AND int8, so compress_values narrows the dominant diag stream
    # (280 -> 140 -> 70 MB/iter) with zero numerical effect (products promote
    # to f32 before accumulating; measured 1.35x / 1.53x CG per-iter,
    # benchmarks/tpu_bf16dia_ab.py, tpu_int8dia_ab.py).
    Ac = its.compress_values(A, dtype=jnp.bfloat16)
    assert Ac.dtype == jnp.bfloat16  # exactness-checked compression applied
    Ai = its.compress_values(A, dtype=jnp.int8)
    assert Ai.dtype == jnp.int8
    n = A.shape[0]
    nnz = int(sum(int(np.count_nonzero(d)) for d in A._h_diags))
    b = jnp.ones((n,), jnp.float32)

    # Differential timing: the remote-attached TPU adds ~ms of per-call
    # dispatch latency, so time two solve lengths and difference them to get
    # pure per-iteration device time.  reltol=0 keeps both runs at full
    # maxiter (the 1e-6 target needs > 300 iters on this problem anyway).
    def fence(arr):
        # On the remote-attached backend ``block_until_ready`` returns after
        # dispatch, NOT completion (measured: a 200-iteration solve "took"
        # 1.7 ms by block_until_ready while the scalar readback then waited
        # out the real execution).  The only reliable timing fence is a
        # scalar readback.
        return float(jnp.sum(arr))

    def timed_solve(op, maxiter, reps=4):
        # every timed call gets a unique RHS: the remote backend can also
        # serve repeat executions of an identical (executable, operands)
        # pair from cache; a per-rep scalar shift keeps the compilation
        # while forcing real execution.
        x = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=maxiter)
        fence(x)
        best = float("inf")
        for r in range(reps):
            bb = b + jnp.float32(1e-6 * (r + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.cg(op, bb, reltol=0.0, abstol=1e-30, maxiter=maxiter)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    # four operator paths for the same matrix: stored-DIA f32 streams, the
    # bf16- and int8-compressed DIA (both exact for this matrix), and the
    # matrix-free stencil (zero stored data).  Headline = the fastest on
    # the current worker (selection logic below); all reported.
    #
    # maxiter values are aligned to run_chunked's warmup ladder
    # (8+16+32+64+128 = 248 warmup steps, then 256-step chunks) so the
    # EXECUTED step counts are exact: 248 -> 248 steps, 504 -> 504 steps.
    # A masked-step mismatch here silently skews the differential.
    iters = 504 - 248
    cg_paths = (("stencil_pallas", St), ("stored_dia_xla", A),
                ("stored_dia_bf16_xla", Ac), ("stored_dia_int8_xla", Ai))
    cg_times = {}
    for name, op in cg_paths:
        t_long_p = timed_solve(op, 504)
        cg_times[name] = (max(t_long_p - timed_solve(op, 248), 1e-9), t_long_p)
    dt_st = cg_times["stencil_pallas"][0]
    dt_dia = cg_times["stored_dia_xla"][0]
    dt_dia16 = cg_times["stored_dia_bf16_xla"][0]
    dt_dia8 = cg_times["stored_dia_int8_xla"][0]
    # Headline = the fastest operator path for the same matrix.  Which
    # stored/matrix-free path wins is environment-dependent on this
    # shared/remote part: the Pallas stencil kernel won by 20% before the
    # 2026-08-18 tunnel outage and lost by 38% after the worker restart,
    # with byte-identical code (A/B verified against a pinned old commit —
    # BENCH_NOTES round 2).  All paths are always reported in detail.
    winner = min(cg_times, key=lambda k: cg_times[k][0])
    dt, t_long = cg_times[winner]

    # Informational: empirical streaming bandwidth (differential triad,
    # min-of-reps).  The roofline denominator stays the DATASHEET number so
    # vs_baseline is stable across runs; measured BW on this part has been
    # observed well above datasheet and is reported as detail only.
    c1 = jnp.full((n,), 0.5, jnp.float32)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("K",))
    def _triad(v, K):
        return jax.lax.fori_loop(0, K, lambda i, v: 0.999 * v + c1, v)

    def triad_time(K, reps=4):
        v = _triad(b, K)
        fence(v)
        best = float("inf")
        for r in range(reps):
            vv = b + jnp.float32(1e-6 * (r + 1) * K)  # defeat result memoization
            t0 = time.perf_counter()
            v = _triad(vv, K)
            fence(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t_triad = max((triad_time(400) - triad_time(100)) / 300, 1e-9)
    measured_bw = 3 * 4 * n / t_triad  # read v, read c, write v

    spmv_per_iter = 1
    nnz_per_s = nnz * spmv_per_iter * iters / dt

    # fraction of time the SpMV accounts for, in the streaming model:
    # per iteration traffic = SpMV (7 diags + x + y) + ~5 extra vector passes
    bytes_spmv = (7 * 4 + 4 + 4) * n
    bytes_other = 5 * 4 * n  # u, c, x, r updates + reductions (approximate)
    bytes_total_per_iter = bytes_spmv + bytes_other

    bw = hbm_bandwidth_gbs() * 1e9  # datasheet — stable denominator
    roofline_iter_time = bytes_total_per_iter / bw
    achieved_iter_time = dt / iters
    frac_roofline = roofline_iter_time / achieved_iter_time

    # byte-TRUE roofline fraction of the winning path (VERDICT r3 weak
    # item 6: the f32-charged fraction can exceed 1 when the winner streams
    # narrower bytes — report the fraction against the bytes the winning
    # path ACTUALLY moves, so the single number a reader grabs is honest):
    # stencil streams no matrix data; compressed DIA streams 7 diags at the
    # compressed width.
    _diag_b = {"stencil_pallas": 0, "stored_dia_xla": 7 * 4,
               "stored_dia_bf16_xla": 7 * 2, "stored_dia_int8_xla": 7 * 1}
    bytes_true_per_iter = (_diag_b[winner] + 4 + 4) * n + bytes_other
    frac_roofline_true = (bytes_true_per_iter / bw) / achieved_iter_time

    # headline: effective SpMV nnz/s vs the 70%-of-roofline target.  The
    # roofline/target denominators model the STORED-format (DIA) streams, as
    # BASELINE.md defines them; the matrix-free stencil path streams no
    # matrix data, so it can legitimately exceed that roofline.
    roofline_nnz_s = bw / (bytes_spmv / nnz) * (bytes_spmv / bytes_total_per_iter)
    target = 0.70 * roofline_nnz_s

    print(json.dumps({
        "metric": "cg_3d_laplace_spmv_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
        "detail": {
            "n": n,
            "nnz": nnz,
            "timed_iters": iters,
            "operator_path": winner,
            "us_per_iter_stencil": round(dt_st / iters * 1e6, 1),
            "us_per_iter_dia": round(dt_dia / iters * 1e6, 1),
            "us_per_iter_dia_bf16": round(dt_dia16 / iters * 1e6, 1),
            "us_per_iter_dia_int8": round(dt_dia8 / iters * 1e6, 1),
            "sec_504_iter_solve": round(t_long, 4),
            "frac_hbm_roofline": round(frac_roofline, 4),
            "frac_hbm_roofline_bytes_true": round(frac_roofline_true, 4),
            "triad_differential_gbs": round(measured_bw / 1e9, 1),
            "device": str(jax.devices()[0].device_kind),
            "note": "roofline denominator is the 819 GB/s datasheet and the "
                    "byte model charges f32 diag streams; the bf16-DIA path "
                    "(exact value compression, compress_values) may "
                    "legitimately exceed that roofline. profiled device-time "
                    "bandwidth evidence in BENCH_NOTES.md",
        },
    }), flush=True)

    # ---- second metric (BASELINE names both solvers on this workload):
    # GMRES(20) on the same 216^3 Laplacian, matrix-free operator.  The
    # GMRES core is CYCLE-granular (one while trip = restart=20 masked
    # Arnoldi bodies + 1 finalize), so the differential is exact only for
    # maxiters that are multiples of 20: 500 -> 25 cycles (500 bodies),
    # 240 -> 12 cycles (240 bodies); diff = 260 bodies + 13 cycle
    # boundaries, credited as 260 iters (boundary cost is part of the
    # per-iteration amortized model below).
    def timed_gmres(maxiter, reps=3, panel_dtype=jnp.bfloat16, op=St):
        # panel default = bfloat16: the library's auto mode at this size
        # and the DEFAULT f32 tolerance (gmres resolves "auto" by tolerance,
        # and these timing runs use reltol=0 to pin the iteration count, so
        # the auto rule must be bypassed here).  ir_stall_exit=False keeps
        # the run-to-maxiter semantics the differential needs.
        x = its.gmres(op, b, restart=20, reltol=0.0, abstol=1e-30,
                      maxiter=maxiter, panel_dtype=panel_dtype,
                      ir_stall_exit=False)
        fence(x)
        best = float("inf")
        for r in range(reps):
            bb = b + jnp.float32(1e-6 * (r + 1) * maxiter)
            t0 = time.perf_counter()
            x = its.gmres(op, bb, restart=20, reltol=0.0, abstol=1e-30,
                          maxiter=maxiter, panel_dtype=panel_dtype,
                          ir_stall_exit=False)
            fence(x)
            best = min(best, time.perf_counter() - t0)
        return best

    # HEADLINE = the library default at this size: on TPU f32 at n >= 2^20
    # that is the bfloat16-panel GMRES-IR mode (convergence parity pinned
    # by tests/test_gmres.py::test_bf16_panel_convergence_parity; accuracy
    # decided on the true f32 residual each restart).  The explicit
    # f32-panel path is reported as detail.
    iters_g = 500 - 240
    # same operator-paths policy as the CG headline: matrix-free stencil vs
    # stored DIA (f32 / exact-bf16 / exact-int8 value streams), fastest wins
    dt_g_st = max(timed_gmres(500) - timed_gmres(240), 1e-9)
    dt_g_dia = max(timed_gmres(500, op=A) - timed_gmres(240, op=A), 1e-9)
    dt_g_dia16 = max(timed_gmres(500, op=Ac) - timed_gmres(240, op=Ac), 1e-9)
    dt_g_dia8 = max(timed_gmres(500, op=Ai) - timed_gmres(240, op=Ai), 1e-9)
    dt_g, g_op_winner = min(
        (dt_g_st, "stencil_pallas"),
        (dt_g_dia, "stored_dia_xla"),
        (dt_g_dia16, "stored_dia_bf16_xla"),
        (dt_g_dia8, "stored_dia_int8_xla"),
    )
    g_iter_time = dt_g / iters_g
    g_nnz_per_s = nnz * iters_g / dt_g
    # full-precision panel variant: same iteration count by construction
    # (reltol=0 runs to maxiter)
    dt_g32 = max(timed_gmres(500, panel_dtype=None)
                 - timed_gmres(240, panel_dtype=None), 1e-9)
    g32_iter_time = dt_g32 / iters_g

    # GMRES-specific roofline: unlike CG, each Arnoldi step also streams the
    # Krylov panel through MGS.  Per m-cycle, averaged per iteration:
    #   MGS panel-row passes: the single-pass 'rowbuf' kernel (round 5)
    #     streams rows 0..k ONCE (dot and axpy both read the VMEM row
    #     buffer): sum_{k=0}^{m-1}(k+1)/m = (m+1)/2 passes; the two-pass
    #     'chunk' fallback streams each row twice: m+1 passes
    #   + w seed read + normalized w write + V row write       (3 passes)
    #   + stencil SpMV: read v, write w                        (2 passes)
    #   + finalize per cycle: panel read for x update + fresh-cycle
    #     residual SpMV and norm                               (~1.2 passes)
    from iterativesolvers_tpu.ops.pallas_mgs import panel_mgs_plan

    m_r = 20
    _gplan = panel_mgs_plan(n, jnp.float32, jnp.bfloat16)
    _rowbuf = bool(_gplan) and _gplan["mode"] == "rowbuf"
    row_passes = (m_r + 1) / 2 if _rowbuf else (m_r + 1)
    # TARGET roofline: pinned to the CANONICAL MGS formulation (m+1 f32
    # panel passes) so vs_baseline stays comparable across rounds — the
    # single-pass rowbuf sweep and the bf16 panels are algorithmic byte
    # savings and show up as vs_baseline gains, not a moving target.
    g_passes_canon = (m_r + 1) + 3 + 2 + 1.2
    g_roofline_iter_time = g_passes_canon * 4 * n / bw
    g_frac = g_roofline_iter_time / g_iter_time
    g_target_nnz_s = 0.70 * nnz / g_roofline_iter_time
    # byte-true fraction of the headline: panel passes at bf16 width (the
    # headline stores the Krylov basis in bfloat16), plus the winning
    # operator path's true matrix stream in the SpMV passes
    _g_diag_b = {"stencil_pallas": 0, "stored_dia_xla": 7 * 4,
                 "stored_dia_bf16_xla": 7 * 2, "stored_dia_int8_xla": 7 * 1}
    g_bytes_true = ((row_passes + 3) * 2 * n         # panel passes, bf16
                    + (2 * 4 + _g_diag_b[g_op_winner]) * n   # SpMV passes
                    + 1.2 * 4 * n)                    # finalize passes, f32
    g_frac_true = (g_bytes_true / bw) / g_iter_time

    # SpMV share: time the bare fused SpMV(+dot) the same differential way
    from functools import partial as _partial2

    @_partial2(jax.jit, static_argnames=("K",))
    def _mvloop(v, K):
        return jax.lax.fori_loop(
            0, K, lambda i, w: St.mv_dot(w)[0] * jnp.float32(1 / 7.0), v)

    def mv_time(K, reps=3):
        v = _mvloop(b, K)
        fence(v)
        best = float("inf")
        for r in range(reps):
            vv = b + jnp.float32(1e-6 * (r + 1) * K)
            t0 = time.perf_counter()
            v = _mvloop(vv, K)
            fence(v)
            best = min(best, time.perf_counter() - t0)
        return best

    # NOTE: this times the XLA fused stencil mv_dot as the SpMV PROXY; the
    # headline iteration actually runs the panel-native Pallas SpMV
    # (stencil_panel_mv), which is cheaper (no flat materialization) — so
    # orth_share is an UPPER bound on the orthogonalization fraction.  The
    # decisive orthogonalization number is the in-session rowbuf-vs-chunk
    # A/B (benchmarks/tpu_gmres_rowbuf_ab.py): the panel-pass halving
    # saved 273 us/iter of the r4 1073.
    t_mv = max((mv_time(64) - mv_time(16)) / 48, 1e-9)
    orth_share = max(0.0, 1.0 - t_mv / g_iter_time)

    print(json.dumps({
        "metric": "gmres20_3d_laplace_spmv_throughput",
        "value": round(g_nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(g_nnz_per_s / g_target_nnz_s, 4),
        "detail": {
            "n": n,
            "restart": 20,
            "timed_iters": iters_g,
            "us_per_iter": round(g_iter_time * 1e6, 1),
            "operator_path": g_op_winner,
            "us_per_iter_stencil": round(dt_g_st / iters_g * 1e6, 1),
            "us_per_iter_dia": round(dt_g_dia / iters_g * 1e6, 1),
            "us_per_iter_dia_bf16": round(dt_g_dia16 / iters_g * 1e6, 1),
            "us_per_iter_dia_int8": round(dt_g_dia8 / iters_g * 1e6, 1),
            "panel_dtype_headline": "bfloat16 (library default at this size)",
            "us_per_iter_f32_panel_stencil": round(g32_iter_time * 1e6, 1),
            "us_per_spmv_xla_proxy": round(t_mv * 1e6, 1),
            "orthogonalization_share_upper_bound": round(orth_share, 3),
            "frac_hbm_roofline": round(g_frac, 4),
            "frac_hbm_roofline_bytes_true": round(g_frac_true, 4),
            "panel_mgs_mode": "rowbuf" if _rowbuf else "chunk",
            "note": "GMRES roofline includes the Krylov-panel passes MGS "
                    "must stream per iteration ((m+1)/2 on the single-pass "
                    "rowbuf kernel, m+1 on the two-pass fallback), charged "
                    "at f32 width (model in bench.py); the headline runs "
                    "the library default bf16-panel GMRES-IR (halves panel "
                    "bytes, accuracy decided on the true f32 residual each "
                    "restart) on the Pallas panel-MGS kernel",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
