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
