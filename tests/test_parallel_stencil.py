"""HaloStencilOperator: distributed matrix-free stencil on the 8-virtual-
device mesh — halo-exchange algebra vs dense ground truth, fused mv_dot,
shard-alignment guards, and solver equality with the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iterativesolvers_tpu as its
from iterativesolvers_tpu.operators.stencil import (
    StencilOperator,
    advection_diffusion_stencil,
    laplacian,
)
from iterativesolvers_tpu.parallel.sharded import (
    HaloStencilOperator,
    row_mesh,
    shard_vector,
    slice_mesh,
)
from iterativesolvers_tpu.utils.fixtures import laplace_dia


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return row_mesh(8)


def test_halo_stencil_mv_matches_dense(mesh):
    # n = 256 = 8 * 32; spans 16 | 32 and 256 = 8 * 32 — both constraints hit
    st = laplacian(16, 2, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    A = laplace_dia(16, 2, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = shard_vector(jnp.asarray(rng.random(st.n)), mesh)
    y = np.asarray(op.mv(x))
    y_ref = np.asarray(A.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12)


def test_halo_stencil_mv_3d(mesh):
    st = laplacian(8, 3, dtype=np.float64)  # n = 512, three span classes
    op = HaloStencilOperator(st, mesh)
    A = laplace_dia(8, 3, dtype=np.float64)
    rng = np.random.default_rng(1)
    x = shard_vector(jnp.asarray(rng.random(st.n)), mesh)
    np.testing.assert_allclose(
        np.asarray(op.mv(x)), np.asarray(A.to_dense()) @ np.asarray(x),
        rtol=1e-12)


def test_halo_stencil_rmv_nonsymmetric(mesh):
    st = advection_diffusion_stencil(8, dtype=np.float64)  # n = 512
    op = HaloStencilOperator(st, mesh)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random(st.n))
    y = np.asarray(op.rmv(shard_vector(x, mesh)))
    y_ref = np.asarray(st.rmv(x))  # single-device path (validated vs DIA)
    np.testing.assert_allclose(y, y_ref, rtol=1e-11)
    # and rmv really is the adjoint of mv
    w = jnp.asarray(rng.random(st.n))
    lhs = float(jnp.vdot(w, op.mv(shard_vector(x, mesh))))
    rhs = float(jnp.vdot(op.rmv(shard_vector(w, mesh)), x))
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)


def test_halo_stencil_mv_dot_fused(mesh):
    st = laplacian(8, 3, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    rng = np.random.default_rng(3)
    x = shard_vector(jnp.asarray(rng.random(st.n)), mesh)
    y, d = op.mv_dot(x)
    y_ref = np.asarray(st.mv(jnp.asarray(np.asarray(x))))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-12)
    np.testing.assert_allclose(
        float(d), float(np.dot(np.asarray(x), y_ref)), rtol=1e-12)


def test_halo_stencil_spmm_block_input(mesh):
    st = laplacian(16, 2, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    A = laplace_dia(16, 2, dtype=np.float64)
    rng = np.random.default_rng(4)
    X = jax.device_put(
        jnp.asarray(rng.random((st.n, 3))),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("rows", None)),
    )
    np.testing.assert_allclose(
        np.asarray(op.mv(X)), np.asarray(A.to_dense()) @ np.asarray(X),
        rtol=1e-11)


def test_cg_on_halo_stencil_matches_single_device(mesh):
    st = laplacian(16, 2, dtype=np.float64)
    b = jnp.ones(st.n)
    x_single = np.asarray(its.cg(st, b, reltol=1e-12, maxiter=600))
    op = HaloStencilOperator(st, mesh)
    x_shard = np.asarray(
        its.cg(op, shard_vector(b, mesh), reltol=1e-12, maxiter=600))
    np.testing.assert_allclose(x_shard, x_single, atol=1e-9)


def test_gmres_on_halo_stencil(mesh):
    st = advection_diffusion_stencil(8, dtype=np.float64)
    b = shard_vector(jnp.ones(st.n), mesh)
    x, h = its.gmres(HaloStencilOperator(st, mesh), b,
                     reltol=1e-8, restart=20, maxiter=400, log=True)
    assert h.isconverged
    r = np.asarray(st.mv(jnp.asarray(np.asarray(x)))) - 1.0
    assert np.linalg.norm(r) / np.sqrt(st.n) < 1e-6


def test_gmres_dist_panel_matches_single_device(mesh):
    """The sharded-panel path (parallel/panel_ortho.py, per-shard CGS2
    sweeps + psum'd partial dots) activates automatically on a mesh operator
    and must reproduce the single-device MGS solve to rounding (VERDICT r3
    item 1: the GMRES hot path is the same code path at 1 and D devices)."""
    from iterativesolvers_tpu.solvers.gmres import _dist_panel_setup

    st = advection_diffusion_stencil(8, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    # the dispatch gate must be live for this operator (else this test is
    # silently exercising the GSPMD fallback)
    assert _dist_panel_setup(op, st.n, jnp.float64, "mgs") is not None
    b = shard_vector(jnp.ones(st.n), mesh)
    x, h = its.gmres(op, b, reltol=1e-8, restart=20, maxiter=400, log=True)
    xs, hs = its.gmres(st, jnp.ones(st.n), reltol=1e-8, restart=20,
                       maxiter=400, log=True)
    assert h.isconverged and hs.isconverged
    # CGS2 vs MGS orthogonalization => same cycle count up to rounding; the
    # converged solutions agree far below the solve tolerance
    np.testing.assert_allclose(np.asarray(x), np.asarray(xs), atol=1e-8)
    assert abs(h.iters - hs.iters) <= 20  # at most one restart cycle apart


def test_dist_panel_ortho_pallas_matches_xla(mesh):
    """Per-shard Pallas panel sweeps (interpret mode) inside shard_map ==
    per-shard XLA gemv sweeps == f64 CGS2 ground truth."""
    import iterativesolvers_tpu.parallel.panel_ortho as po

    n, m1, k = 8 * 700, 6, 3
    lay = po.panel_layout(n, 8)
    assert lay is not None and lay.nloc == 700
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((n, k + 1)).astype(np.float32))
    D, R = lay.D, lay.R
    V = np.zeros((m1, D * R, 512), np.float32)
    for j in range(k + 1):
        col = np.zeros((D, R * 512), np.float32)
        col[:, : lay.nloc] = Q[:, j].reshape(D, lay.nloc)
        V[j] = col.reshape(D * R, 512)
    w = rng.standard_normal(n).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    Vj = jax.device_put(jnp.asarray(V), NamedSharding(mesh, P(None, "rows", None)))
    wj = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P("rows")))

    # f64 CGS2 reference
    wr = w.astype(np.float64).copy()
    href = np.zeros(m1)
    for _ in range(2):
        hh = Q.T.astype(np.float64) @ wr
        hh = np.concatenate([hh, np.zeros(m1 - (k + 1))])
        wr -= (Q.astype(np.float64) @ hh[: k + 1])
        href += hh
    nref = np.linalg.norm(wr)

    outs = {}
    for tag, flag in (("xla", False), ("pallas", True)):
        old = po._PALLAS_INTERPRET
        po._PALLAS_INTERPRET = flag
        try:
            w2d, h, nrm = po.dist_panel_ortho(
                Vj, wj, jnp.int32(k), m1, mesh, ("rows",), lay)
        finally:
            po._PALLAS_INTERPRET = old
        wn = np.asarray(w2d).reshape(D, R * 512)[:, : lay.nloc].reshape(-1)
        outs[tag] = (wn, np.asarray(h), float(nrm))
        np.testing.assert_allclose(outs[tag][1], href, rtol=2e-5, atol=2e-5)
        assert abs(outs[tag][2] - nref) < 1e-4 * nref
        np.testing.assert_allclose(wn, wr / nref, rtol=2e-4, atol=2e-5)
        # orthogonality after two passes
        assert np.abs(Q.T @ wn).max() < 1e-6
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                               rtol=1e-5, atol=1e-6)


def test_dist_panel_ortho_bf16_panel(mesh):
    """bf16 panel storage (GMRES-IR mode) through the distributed sweeps:
    arithmetic stays f32, coefficients within bf16 resolution of f32 truth."""
    import iterativesolvers_tpu.parallel.panel_ortho as po
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, m1, k = 8 * 512, 4, 2
    lay = po.panel_layout(n, 8)
    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.standard_normal((n, k + 1)).astype(np.float32))
    D, R = lay.D, lay.R
    V = np.zeros((m1, D * R, 512), np.float32)
    for j in range(k + 1):
        col = np.zeros((D, R * 512), np.float32)
        col[:, : lay.nloc] = Q[:, j].reshape(D, lay.nloc)
        V[j] = col.reshape(D * R, 512)
    w = rng.standard_normal(n).astype(np.float32)
    Vb = jax.device_put(jnp.asarray(V, jnp.bfloat16),
                        NamedSharding(mesh, P(None, "rows", None)))
    wj = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P("rows")))
    w2d, h, nrm = po.dist_panel_ortho(Vb, wj, jnp.int32(k), m1, mesh,
                                      ("rows",), lay)
    assert w2d.dtype == jnp.float32  # arithmetic/result stays f32
    href = Q.T @ w
    np.testing.assert_allclose(np.asarray(h)[: k + 1], href,
                               rtol=2e-2, atol=2e-2)
    wn = np.asarray(w2d).reshape(D, R * 512)[:, : lay.nloc].reshape(-1)
    # orthogonal against the bf16-rounded basis to bf16 resolution
    assert np.abs(Q.T @ wn).max() < 2e-2


def test_halo_stencil_single_device_mesh():
    """D = 1: wrap-around halo slices must be fully masked at the global
    boundary (no ppermutes issued)."""
    st = laplacian(8, 3, dtype=np.float64)
    op = HaloStencilOperator(st, row_mesh(1))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random(st.n))
    np.testing.assert_allclose(
        np.asarray(op.mv(x)), np.asarray(st.mv(x)), rtol=1e-12)


def test_halo_stencil_slice_mesh():
    st = laplacian(16, 2, dtype=np.float64)
    op = HaloStencilOperator(st, slice_mesh(2, 4))
    A = laplace_dia(16, 2, dtype=np.float64)
    rng = np.random.default_rng(6)
    x = shard_vector(jnp.asarray(rng.random(st.n)), slice_mesh(2, 4))
    np.testing.assert_allclose(
        np.asarray(op.mv(x)), np.asarray(A.to_dense()) @ np.asarray(x),
        rtol=1e-12)


def test_halo_stencil_guards(mesh):
    with pytest.raises(ValueError):  # 9 rows not divisible by 8
        HaloStencilOperator(laplacian(3, 2), mesh)
    # span neither divides nor is a multiple of n_local = 36:
    # term span = 24 -> locally-inner mask would misalign across shards
    bad = StencilOperator(288, 2.0, ((8, 8, 3), (-8, 8, 3)), (-1.0, -1.0))
    with pytest.raises(ValueError):
        HaloStencilOperator(bad, mesh)
    with pytest.raises(TypeError):
        HaloStencilOperator(laplace_dia(16, 2), mesh)


def test_halo_stencil_mv_rows_matches_dense(mesh):
    """Row-panel halo SpMM on the matrix-free stencil (distributed block
    solvers keep (k, n) panels sharded over the minor axis)."""
    st = laplacian(8, 3, dtype=np.float64)  # three span classes
    op = HaloStencilOperator(st, mesh)
    A = laplace_dia(8, 3, dtype=np.float64)
    rng = np.random.default_rng(9)
    Xr = jax.device_put(
        jnp.asarray(rng.random((3, st.n))),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "rows")),
    )
    got = np.asarray(op.mv_rows(Xr))
    want = (np.asarray(A.to_dense()) @ np.asarray(Xr).T).T
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_lobpcg_on_halo_stencil_mesh(mesh):
    """Distributed LOBPCG through the matrix-free stencil row-panel path."""
    import iterativesolvers_tpu as its

    st = laplacian(16, 2, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    rng = np.random.default_rng(4)
    X0 = jax.device_put(
        jnp.asarray(rng.standard_normal((st.n, 3))),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("rows", None)),
    )
    r = its.lobpcg(op, X0, largest=False, tol=1e-6, maxiter=400)
    rs = its.lobpcg(st, X0, largest=False, tol=1e-6, maxiter=400)
    assert r.converged
    np.testing.assert_allclose(np.asarray(r.lam), np.asarray(rs.lam),
                               rtol=1e-6)


def test_nonsymmetric_krylov_on_mesh(mesh):
    """BiCGStab(l) / IDR(s) / QMR drive the distributed halo stencil
    (GSPMD-partitioned loops, mv + rmv collectives) to the solution."""
    st = advection_diffusion_stencil(8, dtype=np.float64)
    op = HaloStencilOperator(st, mesh)
    b = shard_vector(jnp.ones(st.n), mesh)
    for name, run in (
        ("bicgstabl", lambda: its.bicgstabl(op, b, 2, reltol=1e-8,
                                            max_mv_products=2000, log=True)),
        ("idrs", lambda: its.idrs(op, b, s=4, reltol=1e-8, maxiter=500,
                                  log=True)),
        ("qmr", lambda: its.qmr(op, b, reltol=1e-8, maxiter=500, log=True)),
    ):
        x, h = run()
        assert h.isconverged, name
        r = np.linalg.norm(
            np.asarray(st.mv(jnp.asarray(np.asarray(x)))) - 1.0
        ) / np.sqrt(st.n)
        assert r < 1e-7, (name, r)


def test_gmres_dist_panel_bf16_ir_mode(mesh):
    """Sharded-panel GMRES with bf16 panel storage (GMRES-IR on a mesh):
    the distributed CGS2 sweeps run f32 arithmetic over the bf16 rows and
    convergence is decided on the true residual at cycle boundaries —
    reaches the same coarse tolerance as the f32-panel mesh solve."""
    st = advection_diffusion_stencil(8, dtype=np.float32)
    op = HaloStencilOperator(st, mesh)
    b = shard_vector(jnp.ones(st.n, jnp.float32), mesh)
    x16, h16 = its.gmres(op, b, reltol=1e-4, restart=20, maxiter=400,
                         panel_dtype=jnp.bfloat16, log=True)
    x32, h32 = its.gmres(op, b, reltol=1e-4, restart=20, maxiter=400,
                         panel_dtype=None, log=True)
    assert h16.isconverged and h32.isconverged
    for x in (x16, x32):
        r = np.asarray(st.mv(jnp.asarray(np.asarray(x)))) - 1.0
        assert np.linalg.norm(r) / np.sqrt(st.n) < 1e-3
