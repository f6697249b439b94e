"""Weak-scaling harness: CG on a 3-D Laplacian, fixed rows per device
(BASELINE config 5: 10M-row 3-D Laplacian across hosts, >= 80% efficiency).

Without pod hardware this runs on N virtual CPU devices
(xla_force_host_platform_device_count).  **Wall-clock efficiency on a
virtual CPU mesh is NOT a hardware measurement** — the virtual devices
share the host's physical cores (this container has 4), so D devices
contend for compute and memory bandwidth and the timing column saturates
at (physical cores)/D regardless of the communication design.  What the
virtual mesh *does* validate, and what this harness records:

  1. the communication pattern of the compiled hot loop (collective kinds
     and counts from the optimized HLO — ppermute halos + psum dots, no
     all-gathers), and
  2. an analytic ICI model of the same program on real v5e hardware:
     bytes over ICI per iteration vs bytes over HBM per iteration, which
     bounds the weak-scaling efficiency achievable on a pod slice.

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
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ndev_all = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    maxiter = 60
    base_per_iter = {}
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
                          maxiter, True)
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
            v5e_hbm = 819e9
            v5e_ici = 2 * 45e9   # 1-D ring: one 45 GB/s link each way
            psum_lat = 3 * 1e-6  # ~1 us per small allreduce, 3 reductions
            t_compute = hbm_bytes / v5e_hbm
            t_comm = (halo_bytes / v5e_ici + psum_lat) if D > 1 else 0.0
            # halos overlap interior compute at best; worst case serialize
            model_eff = t_compute / (t_compute + t_comm)

            # --- wall clock (meaningful on real hardware only) -------------
            def solve(mi):
                x = its.cg(op, b, reltol=0.0, abstol=1e-30, maxiter=mi)
                x.block_until_ready()

            solve(maxiter)  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                solve(maxiter)
                times.append(time.perf_counter() - t0)
            per_iter = min(times) / maxiter
            base_per_iter.setdefault(kind, per_iter)
            eff = base_per_iter[kind] / per_iter

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
                "wall_clock_is_hardware_measurement": not on_cpu,
            }
            rows_out.append(row)
            print(json.dumps(row), flush=True)

    # the same analytic model at the BASELINE north-star size (10M-row
    # 3-D Laplacian, config 5): per-device block = n/D rows
    v5e_hbm, v5e_ici, psum_lat = 819e9, 2 * 45e9, 3 * 1e-6
    n_ns = 216 ** 3
    halo_ns = 216 * 216  # z-plane halo of the 7-point stencil
    northstar = {}
    for kind, passes in hbm_passes.items():
        for D in (1, 2, 4, 8, 16):
            t_c = passes * 4 * (n_ns // D) / v5e_hbm
            t_m = (2 * halo_ns * 4 / v5e_ici + psum_lat) if D > 1 else 0.0
            northstar[f"{kind}_{D}"] = round(t_c / (t_c + t_m), 4)

    artifact = {
        "harness": "benchmarks/weak_scaling.py",
        "northstar_10M_modeled_eff_by_devices": northstar,
        "northstar_note": (
            "analytic v5e model at BASELINE config 5 scale (216^3 rows, "
            "7-pt stencil): halo ppermute + 3 psums vs 14 (stored-DIA) or "
            "7 (matrix-free) vector passes over n/D rows, assuming halos do "
            "NOT overlap compute at all (worst case).  >= 0.80 target met "
            "for D <= 16 on the DIA path and D <= 8 matrix-free; the "
            "matrix-free path is 2x faster per iteration, so its lower "
            "efficiency percentage still wins on absolute time, and the "
            "interior/boundary split makes overlap (model best case, "
            "eff -> 1) available to the scheduler"
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
