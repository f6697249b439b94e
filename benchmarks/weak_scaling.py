"""Weak-scaling harness: CG on a 3-D Laplacian, fixed rows per device
(BASELINE config 5: 10M-row 3-D Laplacian across hosts, >= 80% efficiency).

Without pod hardware this runs on N virtual CPU devices
(xla_force_host_platform_device_count).  What this harness records:

  1. MEASURED communication overhead at compute-dominated per-device
     sizes (default 128^3 ~= 2.1M rows/device, f32).  A host CPU shares
     one memory bus, so raw wall-clock weak scaling of a bandwidth-bound
     SpMV measures bus saturation, not the communication design; the
     measurement that isolates communication is the paired CONTROL run:
     the identical per-shard CG arithmetic (same SpMV shifted-add
     kernel, same dots/axpys, same fori_loop) with the collectives
     removed (local dots, no halo ppermute), timed back-to-back on the
     same mesh.  `measured_comm_eff` is the control/real time ratio
     normalized by the same ratio at D=1 (difference-in-differences: the
     D=1 ratio prices the control's arithmetic mismatch — extra norm
     reduction, log scatter, boundary scatter-adds — leaving exactly the
     ppermutes + psums).  Raw wall-clock efficiency columns
     are retained, flagged by `cores_ge_devices`,
  2. the communication pattern of the compiled hot loop (collective kinds
     and counts from the optimized HLO — ppermute halos + psum dots, no
     all-gathers), and
  3. an analytic ICI model of the same program on real v5e hardware,
     parameterized by the MEASURED 672 GB/s streaming bandwidth of this
     part (BENCH_NOTES round-2 forensics: profiled 660-685 GB/s, NOT the
     819 GB/s datasheet) — in two variants: halos fully serialized
     (worst case) and halos overlapped with the interior compute, which
     the HaloDIA/HaloStencil kernels' interior/boundary dataflow split
     makes schedulable (verified by test_hlo_collectives.py::
     test_halo_mv_interior_independent_of_ppermute).

On a real slice the same script runs unchanged (drop JAX_PLATFORMS=cpu)
and the timing column becomes meaningful.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling.py [side_per_dev]

Prints one JSON line per device count; writes the full artifact to
benchmarks/results/weak_scaling_cpu8.json when run on the virtual mesh.
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


from iterativesolvers_tpu.utils.profiling import collective_counts


def build_laplace3d(side: int, nz: int):
    """(side, side, nz) 3-D Laplacian in DIA form."""
    from iterativesolvers_tpu.operators.sparse import DIAMatrix

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
    return DIAMatrix(data, offs, (n, n))


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.preconditioners import IdentityPreconditioner
    from iterativesolvers_tpu.parallel.sharded import (
        HaloDIAOperator, row_mesh, shard_vector,
    )
    from iterativesolvers_tpu.solvers.cg import _cg_init, _cg_step

    on_cpu = jax.devices()[0].platform == "cpu"
    # default 128^3 per device = 2.1M rows/device: compute-dominated, so the
    # measured D<=cores efficiencies isolate communication overhead
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ncores = os.cpu_count() or 1
    ndev_all = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    # maxiter values sit exactly on run_chunked's warmup ladder
    # (8+16+32+64 = 120, +128 = 248) so the EXECUTED step counts are exact
    # and the differential (248 - 120 = 128 iters) cancels dispatch/compile
    # tails (same discipline as bench.py)
    mi_long, mi_short = 248, 120
    iters_diff = mi_long - mi_short
    base_per_iter = {}
    base_ratio = {}
    rows_out = []

    def build_stencil3d(side, nz):
        """Same matrix as build_laplace3d, zero stored data (grid is
        (nz, side, side) row-major: z is the outermost/partition axis)."""
        from iterativesolvers_tpu.operators.stencil import StencilOperator

        n = side * side * nz
        s2 = side * side
        terms = ((1, 1, side), (-1, 1, side),
                 (side, side, side), (-side, side, side),
                 (s2, s2, nz), (-s2, s2, nz))
        return StencilOperator(n, 6.0, terms, (-1.0,) * 6, dtype=np.float32)

    # per-device HBM vector passes per CG iteration: SpMV reads x + writes y
    # (2) + ~5 axpy/dot passes; the stored-DIA path streams 7 diagonals more
    hbm_passes = {"dia": 7 + 2 + 5, "stencil": 2 + 5}

    for D in ndev_all:
        # weak scaling: n grows with D (stack D sub-problems along z)
        A = build_laplace3d(side, side * D)
        n = A.shape[0]
        mesh = row_mesh(D)
        from iterativesolvers_tpu.parallel.sharded import HaloStencilOperator

        for kind, op in (
            ("dia", HaloDIAOperator(A, mesh)),
            ("stencil", HaloStencilOperator(build_stencil3d(side, side * D),
                                            mesh)),
        ):
            b = shard_vector(jnp.ones((n,), jnp.float32), mesh)

            # --- communication-pattern audit of the compiled CG step -------
            Pl = IdentityPreconditioner()
            st = _cg_init(op, b,
                          shard_vector(jnp.zeros((n,), jnp.float32), mesh),
                          jnp.asarray(0.0, jnp.float32),
                          jnp.asarray(1e-30, jnp.float32),
                          mi_long, True)
            hlo = jax.jit(
                lambda s: _cg_step(op, Pl, s)).lower(st).compile().as_text()
            coll = collective_counts(hlo)

            # --- analytic ICI model (v5e numbers) --------------------------
            # per iteration per device: 2 halo ppermutes of `halo` f32 each,
            # ~3 scalar psums (latency-bound), and hbm_passes[kind] vector
            # passes over n/D rows.  The matrix-free path halves the HBM
            # bytes, so the SAME ICI traffic is a larger fraction — its
            # modeled efficiency is the stricter bound.
            halo_bytes = 2 * op.halo * 4
            hbm_bytes = hbm_passes[kind] * 4 * (n // D)
            # MEASURED streaming bandwidth of this v5e part (BENCH_NOTES
            # round-2 forensics: profiled triad/copy 660-685 GB/s; the 819
            # GB/s datasheet number is not reachable) — measured inputs make
            # the modeled efficiencies conservative-real, not optimistic
            v5e_hbm = 672e9
            v5e_ici = 2 * 45e9   # 1-D ring: one 45 GB/s link each way
            psum_lat = 3 * 1e-6  # ~1 us per small allreduce, 3 reductions
            t_compute = hbm_bytes / v5e_hbm
            t_comm = (halo_bytes / v5e_ici + psum_lat) if D > 1 else 0.0
            # worst case: halos fully serialized with the compute
            model_eff = t_compute / (t_compute + t_comm)

            # --- wall clock: measured weak scaling.  On the virtual CPU
            # mesh the column is a real communication-overhead measurement
            # whenever cores >= devices (one core per device); past that the
            # devices timeshare cores and the column measures contention.
            def timed(mi, reps=2):
                x = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=mi)
                x.block_until_ready()
                best = float("inf")
                for r in range(reps):
                    bb = b + jnp.float32(1e-6 * (r + 1) * mi)
                    t0 = time.perf_counter()
                    x = its.cg(op, bb, reltol=0.0, abstol=1e-30, maxiter=mi)
                    x.block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best

            per_iter = max(timed(mi_long) - timed(mi_short), 1e-9) / iters_diff
            base_per_iter.setdefault(kind, per_iter)
            eff = base_per_iter[kind] / per_iter

            # ---- no-communication CONTROL (BOTH kinds, VERDICT r4:
            # symmetric evidence): identical per-shard CG arithmetic — the
            # same local SpMV the real operator's shard runs (shifted-add
            # over the 7 diagonals for DIA, the masked local interior for
            # the stencil), 2 dots, 3 axpys, same fori_loop — with LOCAL
            # dots and no halo exchange.  t_comm / t_nocomm isolates the
            # collective cost from host memory-bus saturation (both runs
            # saturate it identically).
            from functools import partial as _part

            from jax.sharding import PartitionSpec as _P
            _smap = jax.shard_map

            if kind == "dia":
                A1 = build_laplace3d(side, side)  # one shard's block
                n_loc = A1.shape[0]
                diags = [jax.device_put(np.asarray(d, np.float32))
                         for d in A1._h_diags]
                offs1 = A1.offsets
                halo1 = max(abs(o) for o in offs1)

                def _mv_loc(v):
                    zp = jnp.zeros((halo1,), v.dtype)
                    vz = jnp.concatenate([zp, v, zp])
                    y = jnp.zeros_like(v)
                    for d, off in zip(diags, offs1):
                        y = y + d * jax.lax.dynamic_slice_in_dim(
                            vz, halo1 + off, n_loc)
                    return y
            else:
                # the stencil operator's OWN local interior (identical code)
                _eff = tuple(op.terms)
                _cs = list(op.coeffs)
                _center = op.center
                _mv_loc = _part(op._local_interior, _eff, _cs, _center)

            def _local_cg(b_loc, K):
                def body(_, st):
                    x, r, u, rho = st
                    c = r
                    rho_n = jnp.dot(c, r)              # LOCAL dot
                    beta = rho_n / rho
                    u = c + beta * u
                    c = _mv_loc(u)                      # no halo
                    alpha = rho_n / jnp.dot(u, c)       # LOCAL dot
                    return (x + alpha * u, r - alpha * c, u, rho_n)

                x0 = jnp.zeros_like(b_loc)
                st = (x0, b_loc, jnp.zeros_like(b_loc),
                      jnp.ones((), b_loc.dtype))
                return jax.lax.fori_loop(0, K, body, st)[0]

            fn = jax.jit(_smap(
                _part(_local_cg, K=iters_diff),
                mesh=mesh, in_specs=_P(*(list(mesh.axis_names) + [])),
                out_specs=_P(*(list(mesh.axis_names) + [])),
                check_vma=False,
            ))

            def timed_nc(reps=2):
                y = fn(b)
                y.block_until_ready()
                best = float("inf")
                for r in range(reps):
                    bb = b + jnp.float32(1e-6 * (r + 1))
                    t0 = time.perf_counter()
                    y = fn(bb)
                    y.block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best

            per_iter_nc = timed_nc() / iters_diff

            # ---- measured overlap effectiveness: the same solve with the
            # interior compute FORCED (optimization_barrier) to wait for the
            # ppermute results.  serialized/overlapped per-iter ratio is the
            # direct measurement of what the interior/boundary dataflow
            # split buys on this backend (VERDICT r4: stop citing HLO
            # dataflow alone).
            per_iter_serial = None
            if D > 1:
                op_ser = (HaloDIAOperator(A, mesh, serialize_halo=True)
                          if kind == "dia" else
                          HaloStencilOperator(
                              build_stencil3d(side, side * D), mesh,
                              serialize_halo=True))

                def timed_s(mi, reps=2):
                    x = its.cg(op_ser, b, reltol=0.0, abstol=1e-30,
                               maxiter=mi)
                    x.block_until_ready()
                    best = float("inf")
                    for r in range(reps):
                        bb = b + jnp.float32(1e-6 * (r + 1) * mi)
                        t0 = time.perf_counter()
                        x = its.cg(op_ser, bb, reltol=0.0, abstol=1e-30,
                                   maxiter=mi)
                        x.block_until_ready()
                        best = min(best, time.perf_counter() - t0)
                    return best

                per_iter_serial = max(
                    timed_s(mi_long) - timed_s(mi_short), 1e-9) / iters_diff

            row = {
                "devices": D,
                "operator": kind,
                "rows": n,
                "rows_per_device": n // D,
                "collectives_per_cg_step": coll,
                "ici_bytes_per_iter_per_dev": halo_bytes,
                "hbm_bytes_per_iter_per_dev": hbm_bytes,
                "modeled_v5e_weak_scaling_eff": round(model_eff, 4),
                "per_iter_ms": round(per_iter * 1e3, 3),
                "wall_clock_eff": round(eff, 3),
                "cores_ge_devices": ncores >= D,
                "wall_clock_is_hardware_measurement": not on_cpu,
            }
            if per_iter_nc is not None:
                row["per_iter_ms_nocomm_control"] = round(per_iter_nc * 1e3, 3)
                # raw ratio control/real; the D=1 row's ratio is the
                # arithmetic mismatch between the control loop and the real
                # solver (extra norm reduction, log scatter, boundary
                # scatter-adds, run_chunked overhead) — normalizing by it
                # (difference-in-differences) isolates the COLLECTIVES
                ratio = per_iter_nc / per_iter
                base_ratio.setdefault(kind, ratio)
                row["nocomm_over_real_raw"] = round(ratio, 3)
                row["measured_comm_eff"] = round(
                    min(ratio / base_ratio[kind], 1.0), 3)
            if per_iter_serial is not None:
                row["per_iter_ms_halo_serialized"] = round(
                    per_iter_serial * 1e3, 3)
                # >1 means the overlapped (default) schedule is faster than
                # the dependency-forced serialized one — the measured overlap
                # factor the analytic `overlapped` model cites
                row["measured_overlap_gain"] = round(
                    per_iter_serial / per_iter, 3)
            rows_out.append(row)
            print(json.dumps(row), flush=True)

        # ---- GMRES leg (BASELINE config 5 names "GMRES/CG"): the sharded-
        # panel hot path (parallel/panel_ortho.py) on the matrix-free halo
        # stencil.  Audits the collectives of the compiled solve (per
        # Arnoldi step: 2 halo ppermutes + 2 CGS2-pass psums of an (m+1,)
        # vector + the cycle-boundary norm psums; NO all-gathers) and
        # times the per-iteration cost differentially (maxiters on cycle
        # multiples of restart=20).
        from iterativesolvers_tpu.solvers.gmres import (
            _dist_panel_setup, _gmres_core, with_highest_precision,
        )

        opg = HaloStencilOperator(build_stencil3d(side, side * D), mesh)
        assert (D == 1) or (_dist_panel_setup(opg, n, jnp.float32, "mgs")
                            is not None)
        bg = shard_vector(jnp.ones((n,), jnp.float32), mesh)

        def timed_g(mi, reps=2):
            x = its.gmres(opg, bg, reltol=0.0, abstol=1e-30, restart=20,
                          maxiter=mi, panel_dtype=None)
            x.block_until_ready()
            best = float("inf")
            for r in range(reps):
                bb = bg + jnp.float32(1e-6 * (r + 1) * mi)
                t0 = time.perf_counter()
                x = its.gmres(opg, bb, reltol=0.0, abstol=1e-30, restart=20,
                              maxiter=mi, panel_dtype=None)
                x.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        g_iters = 40
        per_iter_g = max(timed_g(80) - timed_g(40), 1e-9) / g_iters
        from functools import partial as _pg

        hlo_g = jax.jit(
            with_highest_precision(_pg(
                _gmres_core, restart=20, maxiter=40, initially_zero=True,
                orth_method="mgs", panel_dtype=None)),
            static_argnames=(),
        ).lower(
            opg, bg, shard_vector(jnp.zeros((n,), jnp.float32), mesh),
            IdentityPreconditioner(), IdentityPreconditioner(),
            jnp.float32(0.0), jnp.float32(1e-30),
        ).compile().as_text()
        coll_g = collective_counts(hlo_g)

        # ---- GMRES no-communication CONTROL (VERDICT r4 item 3: the GMRES
        # rows get the same evidence grade as the CG rows).  Identical
        # per-shard Arnoldi arithmetic — the operator's OWN local interior
        # SpMV + two CGS sweeps over an (m+1, n_loc) local panel + norm +
        # row write, same fori_loop — with LOCAL dots and no collectives.
        # Two reduced variants attribute the per-iteration time: sweeps
        # only (no SpMV) and SpMV only (no sweeps).
        from functools import partial as _part_g

        from jax.sharding import PartitionSpec as _Pg

        m1g = 21
        _effg = tuple(opg.terms)
        _csg = list(opg.coeffs)
        _centerg = opg.center
        _mv_locg = _part_g(opg._local_interior, _effg, _csg, _centerg)

        def _local_arnoldi(b_loc, K, do_spmv=True, do_sweeps=True):
            n_loc = b_loc.shape[0]

            def body(t, st):
                V, k = st
                v = jax.lax.dynamic_slice_in_dim(V, k, 1, axis=0)[0]
                w = _mv_locg(v) if do_spmv else v
                if do_sweeps:
                    for _ in range(2):        # CGS2: two (dots, update)
                        h = V @ w             # LOCAL (m1,) dots, no psum
                        w = w - h @ V
                nrm = jnp.sqrt(jnp.dot(w, w))
                w = w / jnp.where(nrm == 0, 1, nrm)
                V = jax.lax.dynamic_update_slice_in_dim(
                    V, w[None], k + 1, axis=0)
                return V, (k + 1) % (m1g - 1)

            V0 = jnp.zeros((m1g, n_loc), b_loc.dtype).at[0].set(b_loc)
            st = (V0, jnp.zeros((), jnp.int32))
            return jax.lax.fori_loop(0, K, body, st)[0][1]

        def timed_ctrl(fn_local, reps=2):
            fn = jax.jit(_smap(
                fn_local, mesh=mesh,
                in_specs=_Pg(*(list(mesh.axis_names) + [])),
                out_specs=_Pg(*(list(mesh.axis_names) + [])),
                check_vma=False,
            ))
            y = fn(bg)
            y.block_until_ready()
            best = float("inf")
            for r in range(reps):
                bb = bg + jnp.float32(1e-6 * (r + 1))
                t0 = time.perf_counter()
                y = fn(bb)
                y.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best / g_iters

        per_iter_gnc = timed_ctrl(_part_g(_local_arnoldi, K=g_iters))
        per_iter_g_sweeps = timed_ctrl(
            _part_g(_local_arnoldi, K=g_iters, do_spmv=False))
        per_iter_g_spmv = timed_ctrl(
            _part_g(_local_arnoldi, K=g_iters, do_sweeps=False))

        # ---- serialized-halo A/B (D > 1): dependency-forced ppermutes
        per_iter_g_serial = None
        if D > 1:
            opg_ser = HaloStencilOperator(build_stencil3d(side, side * D),
                                          mesh, serialize_halo=True)

            def timed_gs(mi, reps=2):
                x = its.gmres(opg_ser, bg, reltol=0.0, abstol=1e-30,
                              restart=20, maxiter=mi, panel_dtype=None)
                x.block_until_ready()
                best = float("inf")
                for r in range(reps):
                    bb = bg + jnp.float32(1e-6 * (r + 1) * mi)
                    t0 = time.perf_counter()
                    x = its.gmres(opg_ser, bb, reltol=0.0, abstol=1e-30,
                                  restart=20, maxiter=mi, panel_dtype=None)
                    x.block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best

            per_iter_g_serial = max(timed_gs(80) - timed_gs(40),
                                    1e-9) / g_iters

        # ---- analytic v5e model for the sharded-panel Arnoldi step:
        # per device per iteration, HBM = SpMV (2 passes of n/D) + panel
        # sweeps (CGS2: 2 passes x (dots+update) x avg (k+1) ~ 10.5 rows of
        # n/D) + ~5 vector passes; ICI = 2 halo ppermutes + 2 (m+1,)-vector
        # psums (latency-bound) + 1 scalar psum.  The sweeps dominate HBM,
        # so the SAME ICI traffic is a far smaller fraction than CG's —
        # distributed GMRES weak-scales strictly better per iteration.
        avg_rows = (m1g - 1 + 2) / 2.0          # k+1 averaged over a cycle
        g_hbm_passes = 2 + 5 + 4 * avg_rows
        g_hbm_bytes = g_hbm_passes * 4 * (n // D)
        g_ici = (2 * opg.halo * 4 / v5e_ici + 3 * 1e-6) if D > 1 else 0.0
        g_tc = g_hbm_bytes / v5e_hbm
        g_model_eff = g_tc / (g_tc + g_ici)

        grow = {
            "devices": D,
            "operator": "stencil_gmres20_sharded_panel",
            "rows": n,
            "rows_per_device": n // D,
            "collectives_whole_solve": coll_g,
            "per_iter_ms": round(per_iter_g * 1e3, 3),
            "per_iter_ms_nocomm_control": round(per_iter_gnc * 1e3, 3),
            "per_iter_ms_sweeps_only_control": round(
                per_iter_g_sweeps * 1e3, 3),
            "per_iter_ms_spmv_only_control": round(per_iter_g_spmv * 1e3, 3),
            "hbm_bytes_per_iter_per_dev": int(g_hbm_bytes),
            "modeled_v5e_weak_scaling_eff": round(g_model_eff, 4),
        }
        base_per_iter.setdefault("gmres", per_iter_g)
        base_ratio.setdefault("gmres", per_iter_gnc / per_iter_g)
        grow["wall_clock_eff"] = round(base_per_iter["gmres"] / per_iter_g, 3)
        grow["nocomm_over_real_raw"] = round(per_iter_gnc / per_iter_g, 3)
        grow["measured_comm_eff"] = round(
            min((per_iter_gnc / per_iter_g) / base_ratio["gmres"], 1.0), 3)
        if per_iter_g_serial is not None:
            grow["per_iter_ms_halo_serialized"] = round(
                per_iter_g_serial * 1e3, 3)
            grow["measured_overlap_gain"] = round(
                per_iter_g_serial / per_iter_g, 3)
        rows_out.append(grow)
        print(json.dumps(grow), flush=True)

    # the same analytic model at the BASELINE north-star size (10M-row
    # 3-D Laplacian, config 5): per-device block = n/D rows.  HBM bandwidth
    # is the MEASURED 672 GB/s (see above).  Two variants:
    #   serialized — halo ppermutes strictly before the SpMV (worst case);
    #   overlapped — the ppermutes run concurrently with the interior
    #     fusion, which only the |off|-sized boundary corrections wait on.
    #     The kernels are written for exactly this (interior depends on
    #     x_loc alone; dataflow verified by test_hlo_collectives.py::
    #     test_halo_mv_interior_independent_of_ppermute), so the overlapped
    #     number is what the XLA latency-hiding scheduler can reach:
    #     t = max(t_compute, t_ici) + psum_lat + t_boundary, with
    #     t_boundary = 3 halo-sized HBM passes (read 2 halos + rmw rows).
    v5e_hbm, v5e_ici, psum_lat = 672e9, 2 * 45e9, 3 * 1e-6
    n_ns = 216 ** 3
    halo_ns = 216 * 216  # z-plane halo of the 7-point stencil
    northstar = {}
    northstar_overlap = {}
    for kind, passes in hbm_passes.items():
        for D in (1, 2, 4, 8, 16):
            t_c = passes * 4 * (n_ns // D) / v5e_hbm
            t_ici = 2 * halo_ns * 4 / v5e_ici
            t_bnd = 3 * halo_ns * 4 / v5e_hbm
            if D > 1:
                northstar[f"{kind}_{D}"] = round(
                    t_c / (t_c + t_ici + psum_lat), 4)
                northstar_overlap[f"{kind}_{D}"] = round(
                    t_c / (max(t_c, t_ici) + psum_lat + t_bnd), 4)
            else:
                northstar[f"{kind}_{D}"] = 1.0
                northstar_overlap[f"{kind}_{D}"] = 1.0

    artifact = {
        "harness": "benchmarks/weak_scaling.py",
        "northstar_10M_modeled_eff_by_devices": northstar,
        "northstar_10M_modeled_eff_overlapped": northstar_overlap,
        "northstar_note": (
            "analytic v5e model at BASELINE config 5 scale (216^3 rows, "
            "7-pt stencil), HBM bandwidth = MEASURED 672 GB/s (BENCH_NOTES "
            "round-2 profiled 660-685, not the 819 datasheet): halo "
            "ppermute + 3 psums vs 14 (stored-DIA) or 7 (matrix-free) "
            "vector passes over n/D rows.  Serialized (worst case) >= 0.80 "
            "for D <= 16 stored-DIA and D <= 8 matrix-free; with the "
            "interior/boundary overlap the kernels' dataflow permits "
            "(HLO-verified), BOTH paths are >= 0.80 at D <= 16 "
            "(matrix-free 16-dev overlapped ~0.87).  Measured anchors: "
            "672 GB/s streaming (profiled), collective counts per CG step "
            "(compiled-HLO audit in `runs`), and the D <= cores wall-clock "
            "efficiencies in `runs` at 2.1M rows/device"
        ),
        "platform": jax.devices()[0].platform,
        "device_kind": str(jax.devices()[0].device_kind),
        "physical_cores": os.cpu_count(),
        "note": (
            "virtual CPU mesh: wall_clock_eff reflects core contention, not "
            "the communication design; the validated claims are the HLO "
            "collective pattern and the analytic ICI model"
            if on_cpu else "real hardware run"
        ),
        "side_per_device": side,
        "runs": rows_out,
    }
    if on_cpu:
        outp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "weak_scaling_cpu8.json")
        os.makedirs(os.path.dirname(outp), exist_ok=True)
        with open(outp, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# artifact -> {outp}", flush=True)


if __name__ == "__main__":
    main()
