"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (SURVEY §4:
'distributed without a cluster' via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iterativesolvers_tpu as its
from iterativesolvers_tpu.parallel.sharded import (
    HaloDIAOperator,
    row_mesh,
    shard_dia,
    shard_vector,
)
from iterativesolvers_tpu.utils.fixtures import laplace_dia


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return row_mesh(8)


def test_halo_spmv_matches_dense(mesh):
    A = laplace_dia(16, 2)  # n = 256 = 8 * 32
    op = HaloDIAOperator(A, mesh)
    rng = np.random.default_rng(0)
    x = shard_vector(jnp.asarray(rng.random(A.shape[0])), mesh)
    y = np.asarray(op.mv(x))
    y_ref = np.asarray(A.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12)


def test_halo_spmv_rmv_matches_dense(mesh):
    from iterativesolvers_tpu.utils.fixtures import advection_diffusion

    A, b = advection_diffusion(8)  # n = 512, nonsymmetric
    op = HaloDIAOperator(A, mesh)
    rng = np.random.default_rng(1)
    x = shard_vector(jnp.asarray(rng.random(A.shape[0])), mesh)
    y = np.asarray(op.rmv(x))
    y_ref = np.asarray(A.to_dense()).T @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)


def test_halo_spmm_matrix_input(mesh):
    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    rng = np.random.default_rng(2)
    X = jax.device_put(
        jnp.asarray(rng.random((A.shape[0], 3))),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rows", None)),
    )
    Y = np.asarray(op.mv(X))
    Y_ref = np.asarray(A.to_dense()) @ np.asarray(X)
    # interior/boundary split sums boundary terms last: not bitwise equal
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-10)


def test_cg_on_halo_operator(mesh):
    """Full CG solve with explicit halo SpMV + auto-psum dots."""
    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    b = shard_vector(jnp.ones(A.shape[0]), mesh)
    x, h = its.cg(op, b, reltol=1e-10, maxiter=500, log=True)
    assert h.isconverged
    res = np.linalg.norm(np.asarray(A.to_dense()) @ np.asarray(x) - 1.0)
    assert res / np.sqrt(A.shape[0]) < 1e-8


def test_cg_gspmd_auto_sharding(mesh):
    """GSPMD path: shard the DIA arrays + vectors, run the unmodified solver."""
    A = laplace_dia(16, 2)
    As = shard_dia(A, mesh)
    b = shard_vector(jnp.ones(A.shape[0]), mesh)
    x = its.cg(As, b, reltol=1e-10, maxiter=500)
    res = np.linalg.norm(np.asarray(A.to_dense()) @ np.asarray(x) - 1.0)
    assert res / np.sqrt(A.shape[0]) < 1e-8


def test_gmres_on_halo_operator(mesh):
    from iterativesolvers_tpu.utils.fixtures import advection_diffusion

    A, b = advection_diffusion(8)
    op = HaloDIAOperator(A, mesh)
    bs = shard_vector(jnp.asarray(b), mesh)
    x, h = its.gmres(op, bs, reltol=1e-8, restart=20, maxiter=400, log=True)
    assert h.isconverged
    r = np.asarray(A.to_dense()) @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_sharded_solution_matches_single_device(mesh):
    A = laplace_dia(16, 2)
    b = jnp.ones(A.shape[0])
    x_single = np.asarray(its.cg(A, b, reltol=1e-12, maxiter=600))
    op = HaloDIAOperator(A, mesh)
    x_shard = np.asarray(its.cg(op, shard_vector(b, mesh), reltol=1e-12, maxiter=600))
    np.testing.assert_allclose(x_shard, x_single, atol=1e-9)


def test_guards(mesh):
    with pytest.raises(ValueError):
        HaloDIAOperator(laplace_dia(3, 2), mesh)  # 9 rows not divisible by 8


def test_pipelined_cg_matches_cg(mesh, rng):
    """Pipelined CG converges to the same solution as CG on the sharded
    operator (single fused reduction per iteration)."""
    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    b = shard_vector(jnp.ones(A.shape[0]), mesh)
    x_cg = np.asarray(its.cg(op, b, reltol=1e-10, maxiter=600))
    x_pipe, h = its.pipelined_cg(op, b, reltol=1e-10, maxiter=600, log=True)
    assert h.isconverged
    np.testing.assert_allclose(np.asarray(x_pipe), x_cg, atol=1e-7)


def test_pipelined_cg_single_device(rng):
    n = 50
    M = rng.random((n, n))
    M = M @ M.T + n * np.eye(n)
    b = rng.random(n)
    x = np.asarray(its.pipelined_cg(M, b, reltol=1e-10))
    assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-8


# ---------------------------------------------------------------------------
# General-sparsity row partition (all-gather x)
# ---------------------------------------------------------------------------


def _random_ell(m, n, density, seed, with_adjoint=False):
    from iterativesolvers_tpu.utils.fixtures import random_sparse

    A = random_sparse(m, n, density, seed=seed)
    ell = A.to_ell()
    return ell.with_adjoint() if with_adjoint else ell


def test_rowsharded_ell_mv_matches_dense(mesh):
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator

    ell = _random_ell(256, 256, 0.05, seed=10)
    op = RowShardedELLOperator(ell, mesh)
    rng = np.random.default_rng(3)
    x = shard_vector(jnp.asarray(rng.random(256)), mesh)
    y = np.asarray(op.mv(x))
    y_ref = np.asarray(ell.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)


def test_rowsharded_ell_rmv_scatter_path(mesh):
    """rmv without a precomputed adjoint: segment-sum + psum_scatter."""
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator

    ell = _random_ell(256, 128, 0.05, seed=11)
    op = RowShardedELLOperator(ell, mesh)
    rng = np.random.default_rng(4)
    x = shard_vector(jnp.asarray(rng.random(256)), mesh)
    y = np.asarray(op.rmv(x))
    y_ref = np.asarray(ell.to_dense()).T @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)


def test_rowsharded_ell_rmv_adjoint_path(mesh):
    """rmv with ELLMatrix.with_adjoint: the fast gather kernel on A^H."""
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator

    ell = _random_ell(256, 128, 0.05, seed=12, with_adjoint=True)
    op = RowShardedELLOperator(ell, mesh)
    rng = np.random.default_rng(5)
    x = shard_vector(jnp.asarray(rng.random(256)), mesh)
    y = np.asarray(op.rmv(x))
    y_ref = np.asarray(ell.to_dense()).T @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)


def test_cg_on_rowsharded_ell(mesh):
    """Full CG solve through the all-gather SpMV (SPD sprand + shift)."""
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator
    from iterativesolvers_tpu.utils.fixtures import random_sparse

    n = 256
    A = random_sparse(n, n, 0.05, seed=13, symmetrize=True, shift=4.0)
    ell = A.to_ell()
    op = RowShardedELLOperator(ell, mesh)
    b = shard_vector(jnp.ones(n), mesh)
    x, h = its.cg(op, b, reltol=1e-10, maxiter=500, log=True)
    assert h.isconverged
    r = np.asarray(ell.to_dense()) @ np.asarray(x) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-8


def test_lsqr_on_rowsharded_ell(mesh):
    """LSQR through the sharded operator exercises mv + adjoint rmv."""
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator

    ell = _random_ell(512, 128, 0.05, seed=14, with_adjoint=True)
    op = RowShardedELLOperator(ell, mesh)
    rng = np.random.default_rng(6)
    x_true = rng.random(128)
    b = jnp.asarray(np.asarray(ell.to_dense()) @ x_true)
    x, h = its.lsqr(op, shard_vector(b, mesh), atol=1e-10, btol=1e-10, maxiter=300, log=True)
    r = np.asarray(ell.to_dense()) @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_gspmd_shard_ell(mesh):
    """GSPMD path: shard the ELL panels, run the unmodified solver."""
    from iterativesolvers_tpu.parallel.sharded import shard_ell
    from iterativesolvers_tpu.utils.fixtures import random_sparse

    n = 256
    A = random_sparse(n, n, 0.05, seed=15, symmetrize=True, shift=4.0)
    ells = shard_ell(A.to_ell(), mesh)
    b = shard_vector(jnp.ones(n), mesh)
    x = its.cg(ells, b, reltol=1e-10, maxiter=500)
    r = np.asarray(A.to_dense()) @ np.asarray(x) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-8


def test_rowsharded_ell_guards(mesh):
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator

    with pytest.raises(ValueError):
        RowShardedELLOperator(_random_ell(250, 250, 0.05, seed=16), mesh)


# ---------------------------------------------------------------------------
# Multi-slice (DCN) 2-D mesh: rows partitioned slice-major over (slice, chip)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh2d():
    from iterativesolvers_tpu.parallel.sharded import slice_mesh

    assert len(jax.devices()) >= 8
    return slice_mesh(2, 4)


def test_slice_mesh_halo_spmv_matches_dense(mesh2d):
    A = laplace_dia(16, 2, dtype=np.float64)
    op = HaloDIAOperator(A, mesh2d)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    y = op.mv(shard_vector(jnp.asarray(x), mesh2d))
    np.testing.assert_allclose(np.asarray(y), np.asarray(A.mv(jnp.asarray(x))),
                               rtol=1e-12, atol=1e-12)


def test_slice_mesh_cg_converges(mesh2d):
    A = laplace_dia(16, 2, dtype=np.float64)
    op = HaloDIAOperator(A, mesh2d)
    b = shard_vector(jnp.ones(A.shape[0]), mesh2d)
    x, h = its.cg(op, b, reltol=1e-10, maxiter=400, log=True)
    assert h.isconverged
    assert float(jnp.linalg.norm(A.mv(x) - 1.0)) < 1e-8


def test_slice_mesh_ell_adjoint(mesh2d):
    from iterativesolvers_tpu.parallel.sharded import RowShardedELLOperator
    from iterativesolvers_tpu.utils.fixtures import random_sparse

    C = random_sparse(256, 256, 0.05, seed=2, dtype=np.float64,
                      symmetrize=True, shift=1.0)
    E = RowShardedELLOperator(C.to_ell().with_adjoint(), mesh2d)
    x = np.random.default_rng(1).standard_normal(256)
    xv = shard_vector(jnp.asarray(x), mesh2d)
    np.testing.assert_allclose(np.asarray(E.mv(xv)),
                               np.asarray(C.mv(jnp.asarray(x))), atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.rmv(xv)),
                               np.asarray(C.rmv(jnp.asarray(x))), atol=1e-12)


def test_slice_mesh_gspmd_auto_sharding(mesh2d):
    from iterativesolvers_tpu.parallel.sharded import shard_dia as _shard_dia

    A = laplace_dia(16, 2, dtype=np.float64)
    As = _shard_dia(A, mesh2d)
    b = shard_vector(jnp.ones(A.shape[0]), mesh2d)
    x, h = its.cg(As, b, reltol=1e-10, maxiter=400, log=True)
    assert h.isconverged
    assert float(jnp.linalg.norm(A.mv(x) - 1.0)) < 1e-8


def test_halo_mv_rows_matches_dense(mesh):
    """Row-panel halo SpMM: (k, n) rows sharded over the minor axis — the
    layout distributed LOBPCG keeps its blocks in."""
    import jax as _jax

    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    rng = np.random.default_rng(7)
    Xr = jax.device_put(
        jnp.asarray(rng.random((3, A.shape[0]))),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "rows")),
    )
    got = np.asarray(op.mv_rows(Xr))
    want = (np.asarray(A.to_dense()) @ np.asarray(Xr).T).T
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_halo_spmv_bf16_values_exact(mesh):
    """compress_values composes with the distributed halo operator: bf16
    diagonal streams, f32 vectors, bit-identical results for the (bf16-exact)
    Laplacian — the multi-chip counterpart of the single-chip bandwidth
    optimization (tests/test_sparse.py::test_compress_values_exact_formats)."""
    A = laplace_dia(16, 2, dtype=np.float32)  # n = 256 = 8 * 32
    Ac = its.compress_values(A, dtype=jnp.bfloat16)
    assert Ac.dtype == jnp.bfloat16
    op = HaloDIAOperator(A, mesh)
    opc = HaloDIAOperator(Ac, mesh)
    assert opc.dtype == jnp.bfloat16
    rng = np.random.default_rng(7)
    x = shard_vector(jnp.asarray(rng.random(A.shape[0], dtype=np.float32)),
                     mesh)
    y32 = np.asarray(op.mv(x))
    yc = np.asarray(opc.mv(x))
    assert yc.dtype == np.float32
    np.testing.assert_array_equal(yc, y32)
    np.testing.assert_array_equal(np.asarray(opc.rmv(x)),
                                  np.asarray(op.rmv(x)))


# ---------------- distributed preconditioning (parallel/precond.py) --------


def _bj_mesh():
    assert len(jax.devices()) >= 8
    from iterativesolvers_tpu.parallel import row_mesh

    return row_mesh(8)


def test_sharded_block_jacobi_matches_single_device():
    """Shard-local block-Jacobi ILU(0) under shard_map is the SAME operator
    as ILUPreconditioner.block_jacobi(A, D) applied on one device: the
    preconditioned solves agree iterate-for-iterate (VERDICT r3 item 5)."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.preconditioners import ILUPreconditioner
    from iterativesolvers_tpu.parallel import HaloDIAOperator, shard_vector
    from iterativesolvers_tpu.parallel.precond import (
        ShardedBlockJacobiPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    mesh = _bj_mesh()
    A = laplace_dia(16, 2, dtype=np.float64)
    csr = A.to_csr()
    b = jnp.ones(A.shape[0])
    P1 = ILUPreconditioner.block_jacobi(csr, 8)
    Ps = ShardedBlockJacobiPreconditioner.ilu(csr, mesh)
    # the preconditioner application itself matches
    r = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    np.testing.assert_allclose(np.asarray(Ps.ldiv(shard_vector(r, mesh))),
                               np.asarray(P1.ldiv(r)), rtol=1e-12, atol=1e-12)
    # and a full preconditioned CG over the halo operator converges to the
    # same solution in the same number of iterations
    op = HaloDIAOperator(A, mesh)
    xs, hs = its.cg(op, shard_vector(b, mesh), Pl=Ps, reltol=1e-10,
                    maxiter=500, log=True)
    x1, h1 = its.cg(A, b, Pl=P1, reltol=1e-10, maxiter=500, log=True)
    assert hs.isconverged and hs.iters == h1.iters
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x1), atol=1e-9)


def test_sharded_block_jacobi_ic_multicolor():
    """IC(0) variant with per-block multicolor ordering: symmetric apply,
    per-shard level count collapses to the block color count, CG converges."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.parallel import HaloDIAOperator, shard_vector
    from iterativesolvers_tpu.parallel.precond import (
        ShardedBlockJacobiPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    mesh = _bj_mesh()
    A = laplace_dia(16, 2, dtype=np.float64)
    csr = A.to_csr()
    b = jnp.ones(A.shape[0])
    Pn = ShardedBlockJacobiPreconditioner.ic(csr, mesh)
    Pm = ShardedBlockJacobiPreconditioner.ic(csr, mesh, ordering="multicolor")
    assert Pm.nlevels == 2 and Pn.nlevels > Pm.nlevels
    # symmetric apply: <P^-1 u, v> == <u, P^-1 v>
    rng = np.random.default_rng(1)
    u = shard_vector(jnp.asarray(rng.standard_normal(A.shape[0])), mesh)
    v = shard_vector(jnp.asarray(rng.standard_normal(A.shape[0])), mesh)
    lhs = float(jnp.vdot(Pm.ldiv(u), v))
    rhs = float(jnp.vdot(u, Pm.ldiv(v)))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)
    op = HaloDIAOperator(A, mesh)
    x0, h0 = its.cg(op, shard_vector(b, mesh), reltol=1e-10, maxiter=500,
                    log=True)
    xm, hm = its.cg(op, shard_vector(b, mesh), Pl=Pm, reltol=1e-10,
                    maxiter=500, log=True)
    assert hm.isconverged and hm.iters < h0.iters
    r = np.linalg.norm(np.asarray(A.mv(jnp.asarray(np.asarray(xm)))) - 1.0)
    assert r < 1e-7


def test_gmres_dist_panel_on_halo_dia():
    """The sharded-panel GMRES path also dispatches for HaloDIAOperator
    (any mesh-carrying operator), matching the single-device solve."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.parallel import HaloDIAOperator, shard_vector
    from iterativesolvers_tpu.solvers.gmres import _dist_panel_setup
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    mesh = _bj_mesh()
    A = laplace_dia(16, 2, dtype=np.float64)
    op = HaloDIAOperator(A, mesh)
    assert _dist_panel_setup(op, A.shape[0], jnp.float64, "mgs") is not None
    b = jnp.ones(A.shape[0])
    x, h = its.gmres(op, shard_vector(b, mesh), restart=20, reltol=1e-9,
                     maxiter=500, log=True)
    xs, hs = its.gmres(A, b, restart=20, reltol=1e-9, maxiter=500, log=True)
    assert h.isconverged and hs.isconverged
    np.testing.assert_allclose(np.asarray(x), np.asarray(xs), atol=1e-7)


def test_gmres_dist_panel_nondivisible_n(mesh):
    """n % D != 0 rides the sharded-panel path via the zero-padded last
    shard (parallel/panel_ortho.panel_layout; VERDICT r4 item 5) instead of
    silently dropping to GSPMD orthogonalization."""
    from iterativesolvers_tpu.parallel.sharded import DenseMeshOperator
    from iterativesolvers_tpu.solvers.gmres import _dist_panel_setup

    n = 1003  # prime-ish: not divisible by 8
    rng = np.random.default_rng(7)
    A = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    op = DenseMeshOperator(jnp.asarray(A), mesh)
    dist = _dist_panel_setup(op, n, jnp.float64, "mgs")
    assert dist is not None, "non-divisible n must still dispatch"
    assert dist.layout.n_pad != n and dist.layout.n == n
    b = jnp.ones(n)
    x = its.gmres(op, b, reltol=1e-10, restart=20, maxiter=200)
    x_ref = its.gmres(jnp.asarray(A), b, reltol=1e-10, restart=20,
                      maxiter=200)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-8)
    r = A @ np.asarray(x) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-9


def test_gmres_dist_panel_dgks_fallback_warns(mesh):
    """orth_method='dgks' has no sharded-panel form: the solve must fall
    back to GSPMD orthogonalization, stay correct, AND say so (ADVICE r4)."""
    from iterativesolvers_tpu.solvers.gmres import _dist_panel_setup

    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    n = A.shape[0]
    assert _dist_panel_setup(op, n, jnp.float64, "dgks") is None
    b = shard_vector(jnp.ones(n), mesh)
    with pytest.warns(UserWarning, match="falling back to GSPMD"):
        x = its.gmres(op, b, orth_method="dgks", reltol=1e-10, restart=20,
                      maxiter=300)
    r = np.asarray(A.to_dense()) @ np.asarray(x) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-9


def test_gmres_dist_panel_substitution_warns(mesh):
    """Explicit 'cgs' on a mesh operator is upgraded to distributed CGS2 —
    with a warning naming the substitution (ADVICE r4)."""
    A = laplace_dia(16, 2)
    op = HaloDIAOperator(A, mesh)
    b = shard_vector(jnp.ones(A.shape[0]), mesh)
    with pytest.warns(UserWarning, match="subsumed by distributed CGS2"):
        its.gmres(op, b, orth_method="cgs", reltol=1e-8, restart=10,
                  maxiter=100)


def test_dist_panel_ortho_passes_validation(mesh):
    """passes=0 raises a clear error instead of a trace-time NameError."""
    import iterativesolvers_tpu.parallel.panel_ortho as po

    lay = po.panel_layout(8 * 512, 8)
    V = jnp.zeros((3, lay.D * lay.R, 512), jnp.float32)
    w = jnp.ones(8 * 512, jnp.float32)
    with pytest.raises(ValueError, match="passes >= 1"):
        po.dist_panel_ortho(V, w, jnp.int32(0), 3, mesh, ("rows",), lay,
                            passes=0)


def test_rb_reduced_to_dia_and_mesh_solve(mesh):
    """The explicit Schur DIA form of the RB reduced system equals the
    two-pass operator, and drops into HaloDIAOperator for a distributed
    preconditioned solve that matches the single-device one."""
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 16, 2
    A = variable_diffusion(side, dims, contrast=100, seed=4,
                           dtype=np.float64)
    R = its.RBReducedSystem.from_dia(A, side, dims)
    S = R.to_dia()
    nh = R.nh
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(nh))
    np.testing.assert_allclose(np.asarray(S.mv(v)), np.asarray(R.mv(v)),
                               atol=1e-12)
    # distributed: halo operator over the 8-device mesh (halo = side <=
    # nh/D = 16), same solve as single-device
    b = jnp.ones(A.shape[0])
    bb, br = R.reduce_rhs(b)
    xb_ref = its.cg(R, bb, reltol=1e-11, maxiter=2000)
    op = HaloDIAOperator(S, mesh)
    xb_mesh = its.cg(op, shard_vector(bb, mesh), reltol=1e-11, maxiter=2000)
    np.testing.assert_allclose(np.asarray(xb_mesh), np.asarray(xb_ref),
                               atol=1e-9)
    x = R.expand_solution(jnp.asarray(np.asarray(xb_mesh)), br)
    r = np.asarray(A.mv(x)) - 1.0
    assert np.linalg.norm(r) / np.sqrt(A.shape[0]) < 1e-9


def test_block_cg_on_halo_operator(mesh):
    """Multi-RHS batched CG rides the halo operators' mv_rows (block halo
    exchange) — distributed block solves with zero new code."""
    A = laplace_dia(16, 2)
    n = A.shape[0]
    op = HaloDIAOperator(A, mesh)
    rng = np.random.default_rng(6)
    B = jnp.asarray(rng.standard_normal((n, 4)))
    X, h = its.block_cg(op, B, reltol=1e-10, maxiter=600, log=True)
    assert h.isconverged
    Xs = its.block_cg(A, B, reltol=1e-10, maxiter=600)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-8)


def test_dense_mesh_operator_rmv_nondivisible(mesh):
    """Adjoint matvec of the padded DenseMeshOperator at n % D != 0."""
    from iterativesolvers_tpu.parallel.sharded import DenseMeshOperator

    n = 37
    rng = np.random.default_rng(9)
    A = rng.standard_normal((n, n))
    op = DenseMeshOperator(jnp.asarray(A), mesh)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(op.mv(x)), A @ np.asarray(x),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.rmv(x)), A.T @ np.asarray(x),
                               atol=1e-10)
