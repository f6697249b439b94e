"""Sparse format kernels: mv/rmv vs dense ground truth (~ test/stationary.jl's
kernel-level unit tests, SURVEY §4.7)."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterativesolvers_tpu as its

from iterativesolvers_tpu import CSRMatrix, csr_from_dense
from iterativesolvers_tpu.utils.fixtures import (
    advection_diffusion,
    laplace_dia,
    random_sparse,
    sym_tridiagonal_dia,
)

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def dense_random(rng, n, m, dtype):
    a = rng.standard_normal((n, m))
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * rng.standard_normal((n, m))
    a[np.abs(a) < 0.7] = 0  # sparsify
    return a.astype(dtype)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", [(13, 13), (17, 9), (9, 17)])
def test_csr_mv_rmv(rng, dtype, shape):
    n, m = shape
    dense = dense_random(rng, n, m, dtype)
    A = csr_from_dense(dense)
    x = rng.standard_normal(m).astype(dtype)
    y = rng.standard_normal(n).astype(dtype)
    rtol = 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-12
    np.testing.assert_allclose(np.asarray(A.mv(x)), dense @ x, rtol=rtol, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(A.rmv(y)), dense.conj().T @ y, rtol=rtol, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=rtol)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ell_and_dia_roundtrip(rng, dtype):
    dense = dense_random(rng, 15, 15, dtype)
    csr = csr_from_dense(dense)
    ell = csr.to_ell()
    dia = csr.to_dia()
    x = rng.standard_normal(15).astype(dtype)
    for A in (ell, dia):
        np.testing.assert_allclose(np.asarray(A.mv(x)), dense @ x, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(A.rmv(x)), dense.conj().T @ x, rtol=1e-12
        )
        np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-12)


def test_csr_from_coo_merges_duplicates():
    A = CSRMatrix.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], (2, 2))
    expected = np.array([[0, 5.0], [4.0, 0]])
    np.testing.assert_allclose(np.asarray(A.to_dense()), expected)
    assert A.nnz == 2


def test_laplace_dia_matches_kron():
    n, dims = 4, 2
    D = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) + np.diag(
        np.full(n - 1, -1.0), -1
    )
    I = np.eye(n)
    expected = np.kron(D, I) + np.kron(I, D)  # kron-sum (test/laplace_matrix.jl)
    A = laplace_dia(n, dims)
    np.testing.assert_allclose(np.asarray(A.to_dense()), expected)


def test_laplace_dia_3d_row_sums():
    A = laplace_dia(3, 3)
    dense = np.asarray(A.to_dense())
    np.testing.assert_allclose(dense, dense.T)
    # interior rows sum to 0, diagonal is 2*dims
    assert np.allclose(np.diag(dense), 6.0)


def test_sym_tridiagonal():
    A = sym_tridiagonal_dia(2.1, -1.0, 5)
    dense = np.asarray(A.to_dense())
    expected = (
        np.diag(np.full(5, 2.1))
        + np.diag(np.full(4, -1.0), 1)
        + np.diag(np.full(4, -1.0), -1)
    )
    np.testing.assert_allclose(dense, expected)


def test_advection_diffusion_structure():
    A, b = advection_diffusion(N=4)
    assert A.shape == (64, 64)
    assert b.shape == (64,)
    dense = np.asarray(A.to_dense())
    # nonsymmetric due to advection
    assert not np.allclose(dense, dense.T)
    assert np.all(b > 0)


def test_random_sparse_shapes(rng):
    A = random_sparse(50, 30, 0.05, seed=3)
    assert A.shape == (50, 30)
    x = rng.standard_normal(30)
    np.testing.assert_allclose(
        np.asarray(A.mv(x)), np.asarray(A.to_dense()) @ x, rtol=1e-12
    )


def test_bsr_roundtrip_and_matvec(rng):
    """BSR block format: mv/rmv vs dense, vector and block inputs."""
    import numpy as np
    import jax.numpy as jnp
    from iterativesolvers_tpu.operators.sparse import BSRMatrix, csr_from_dense

    n, bs = 48, 4
    M = rng.random((n, n))
    M[M < 0.8] = 0.0
    M += np.eye(n)
    csr = csr_from_dense(M)
    bsr = BSRMatrix.from_csr(csr, bs)
    Md = np.asarray(bsr.to_dense())
    # block expansion only adds explicit zeros; values must match
    np.testing.assert_allclose(Md, M, rtol=1e-12)
    x = rng.random(n)
    np.testing.assert_allclose(np.asarray(bsr.mv(jnp.asarray(x))), M @ x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(bsr.rmv(jnp.asarray(x))), M.T @ x, rtol=1e-10)
    X = rng.random((n, 3))
    np.testing.assert_allclose(np.asarray(bsr.mv(jnp.asarray(X))), M @ X, rtol=1e-10)


def test_bsr_in_solver(rng):
    import numpy as np
    from iterativesolvers_tpu.operators.sparse import BSRMatrix, csr_from_dense
    import iterativesolvers_tpu as its

    n = 32
    M = rng.random((n, n))
    M = M @ M.T + n * np.eye(n)
    bsr = BSRMatrix.from_csr(csr_from_dense(M), 4)
    b = rng.random(n)
    x = np.asarray(its.cg(bsr, b, reltol=1e-10))
    assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-8


def test_ell_with_adjoint(rng):
    import numpy as np
    import jax, jax.numpy as jnp
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    M = rng.random((25, 18)).astype(np.complex128) * (1 + 1j)
    M[np.abs(M.real) < 0.6] = 0
    ell = csr_from_dense(M).to_ell().with_adjoint()
    x = rng.random(25) + 1j * rng.random(25)
    np.testing.assert_allclose(
        np.asarray(ell.rmv(jnp.asarray(x))), M.conj().T @ x, rtol=1e-10
    )
    # idempotent
    assert ell.with_adjoint() is ell


def test_hyb_mv_rmv_matches_dense(rng):
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    # skewed degrees: a few dense rows on a sparse background
    M = rng.random((60, 40))
    M[np.abs(M) < 0.8] = 0
    M[3, :] = rng.random(40)  # heavy row
    M[17, :30] = rng.random(30)
    hyb = csr_from_dense(M).to_hyb()
    assert hyb.tail_nnz > 0
    assert hyb.ell.row_width < int((M != 0).sum(axis=1).max())
    x = rng.random(40)
    y = rng.random(60)
    np.testing.assert_allclose(np.asarray(hyb.mv(jnp.asarray(x))), M @ x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hyb.rmv(jnp.asarray(y))), M.T @ y, rtol=1e-10)
    # precomputed-adjoint path
    hyb2 = hyb.with_adjoint()
    np.testing.assert_allclose(np.asarray(hyb2.rmv(jnp.asarray(y))), M.T @ y, rtol=1e-10)
    assert hyb2.with_adjoint() is hyb2


def test_hyb_block_input_and_roundtrip(rng):
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    M = rng.random((32, 32))
    M[np.abs(M) < 0.7] = 0
    M[5, :] = rng.random(32)
    hyb = csr_from_dense(M).to_hyb()
    X = rng.random((32, 3))
    np.testing.assert_allclose(np.asarray(hyb.mv(jnp.asarray(X))), M @ X, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hyb.to_dense()), M, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(hyb.to_csr().to_dense()), M, rtol=1e-12
    )


def test_hyb_empty_tail_and_solver(rng):
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    n = 48
    M = rng.random((n, n))
    M[np.abs(M) < 0.5] = 0
    M = M @ M.T + n * np.eye(n)  # SPD, fairly uniform degrees
    hyb = csr_from_dense(M).to_hyb(row_width=n)  # forced: no tail
    assert hyb.tail_nnz == 0
    b = rng.random(n)
    x = np.asarray(its.cg(hyb, b, reltol=1e-10))
    assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-8
    # auto width inside a solver too
    x2 = np.asarray(its.gmres(csr_from_dense(M).to_hyb(), b, reltol=1e-10, restart=30))
    assert np.linalg.norm(M @ x2 - b) / np.linalg.norm(b) < 1e-7


def test_stencil_laplacian_matches_dia(rng):
    from iterativesolvers_tpu.operators.stencil import laplacian
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    for side, dims in ((16, 2), (6, 3)):
        St = laplacian(side, dims, dtype=np.float64)
        A = laplace_dia(side, dims, dtype=np.float64)
        x = rng.random(side**dims)
        np.testing.assert_allclose(
            np.asarray(St.mv(jnp.asarray(x))), np.asarray(A.mv(jnp.asarray(x))),
            rtol=1e-13,
        )
        np.testing.assert_allclose(  # symmetric: rmv == mv
            np.asarray(St.rmv(jnp.asarray(x))), np.asarray(A.mv(jnp.asarray(x))),
            rtol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(St.to_dia().to_dense()), np.asarray(A.to_dense()),
            rtol=1e-13,
        )


def test_stencil_nonsymmetric_rmv(rng):
    """Advection-like stencil: rmv must transpose the shifts and masks."""
    from iterativesolvers_tpu.operators.stencil import StencilOperator

    side, dims = 8, 2
    n = side**dims
    # center 4, east -2, west -0.5 (nonsymmetric), north/south -1
    St = StencilOperator(
        n, 4.0,
        ((1, 1, side), (-1, 1, side), (side, side, side), (-side, side, side)),
        (-2.0, -0.5, -1.0, -1.0), dtype=np.float64,
    )
    M = np.asarray(St.to_dia().to_dense())
    x = rng.random(n)
    np.testing.assert_allclose(np.asarray(St.mv(jnp.asarray(x))), M @ x, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(St.rmv(jnp.asarray(x))), M.T @ x, rtol=1e-13)


def test_stencil_in_cg(rng):
    from iterativesolvers_tpu.operators.stencil import laplacian

    St = laplacian(16, 2, dtype=np.float64)
    b = np.ones(256)
    x, h = its.cg(St, b, reltol=1e-10, maxiter=600, log=True)
    assert h.isconverged
    from iterativesolvers_tpu.utils.fixtures import laplace_dia
    M = np.asarray(laplace_dia(16, 2, dtype=np.float64).to_dense())
    assert np.linalg.norm(M @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_advection_diffusion_stencil_matches_dia(rng):
    from iterativesolvers_tpu.operators.stencil import advection_diffusion_stencil
    from iterativesolvers_tpu.utils.fixtures import advection_diffusion

    N = 8
    A, b = advection_diffusion(N, dtype=np.float64)
    St = advection_diffusion_stencil(N, dtype=np.float64)
    x = rng.random(N**3)
    np.testing.assert_allclose(
        np.asarray(St.mv(jnp.asarray(x))), np.asarray(A.mv(jnp.asarray(x))),
        rtol=1e-12,
    )
    # adjoint of the nonsymmetric operator
    M = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(St.rmv(jnp.asarray(x))), M.T @ x, rtol=1e-12)


def test_from_coo_rejects_out_of_range_indices():
    # hostile/malformed COO input (e.g. a bad MatrixMarket file) must raise,
    # not corrupt memory in the native counting sort (ADVICE r1)
    with pytest.raises(ValueError):
        CSRMatrix.from_coo([0, 5], [0, 0], [1.0, 2.0], (3, 3))
    with pytest.raises(ValueError):
        CSRMatrix.from_coo([0, 1], [0, 7], [1.0, 2.0], (3, 3))
    with pytest.raises(ValueError):
        CSRMatrix.from_coo([-1], [0], [1.0], (3, 3))


def test_rcm_recovers_banded_structure(rng):
    """RCM on a randomly shuffled pentadiagonal matrix recovers bandwidth 2
    (the bandwidth-reducing preprocessing behind auto_format, VERDICT r1)."""
    n = 200
    band = np.zeros((n, n))
    for off in (-2, -1, 0, 1, 2):
        idx = np.arange(max(0, -off), min(n, n - off))
        band[idx, idx + off] = rng.random(idx.size) + (3.0 if off == 0 else 0.0)
    shuf = rng.permutation(n)
    A = csr_from_dense(band[np.ix_(shuf, shuf)])
    assert A.structure_stats()["bandwidth"] > 10
    perm, bw = A.rcm()
    assert bw <= 4  # RCM is heuristic; pentadiagonal should come back tiny
    B = A.permute(perm)
    assert B.structure_stats()["bandwidth"] == bw
    np.testing.assert_allclose(
        np.asarray(B.to_dense()),
        np.asarray(A.to_dense())[np.ix_(perm, perm)],
    )


def test_auto_format_picks_by_structure(rng):
    from iterativesolvers_tpu.operators.sparse import (
        BSRMatrix, DIAMatrix, HYBMatrix, ELLMatrix,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia, random_sparse

    # stencil -> DIA, no reordering
    op, p = laplace_dia(12, 2).to_csr().auto_format()
    assert isinstance(op, DIAMatrix) and p is None
    # random sparsity -> gather format (ELL/HYB), no reordering
    op2, p2 = random_sparse(256, 256, 0.02, seed=1).auto_format()
    assert isinstance(op2, (HYBMatrix, ELLMatrix)) and p2 is None
    # shuffled banded -> RCM + DIA, and the reordered solve is exact
    n = 200
    band = np.zeros((n, n))
    for off in (-1, 0, 1):
        idx = np.arange(max(0, -off), min(n, n - off))
        band[idx, idx + off] = rng.random(idx.size) + (3.0 if off == 0 else 0.0)
    shuf = rng.permutation(n)
    dense = band[np.ix_(shuf, shuf)]
    A = csr_from_dense(dense)
    op3, perm = A.auto_format()
    assert isinstance(op3, DIAMatrix) and perm is not None
    b = rng.random(n)
    y = its.gmres(op3, b[perm], reltol=1e-12, maxiter=600)
    x = np.empty(n)
    x[perm] = np.asarray(y)
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-9


def test_auto_format_block_structure(rng):
    """Block-structured matrices pick BSR."""
    from iterativesolvers_tpu.operators.sparse import BSRMatrix

    n, bs = 128, 4
    nb = n // bs
    dense = np.zeros((n, n))
    for bi in range(nb):
        for bj in (bi - 1, bi, bi + 1):
            if 0 <= bj < nb:
                dense[bi*bs:(bi+1)*bs, bj*bs:(bj+1)*bs] = rng.random((bs, bs)) + 0.1
    A = csr_from_dense(dense)
    op, p = A.auto_format(try_rcm=False)
    # dense blocks on a block-tridiagonal: DIA would stream 3*bs diagonals
    # (similar cost) — accept either structured pick, but never a gather fmt
    assert isinstance(op, (BSRMatrix,)) or type(op).__name__ == "DIAMatrix"


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64])
def test_mv_rows_matches_dense_all_formats(rng, dtype):
    """Row-panel SpMM contract: op.mv_rows((k, n) rows) == (A @ X).T for
    every format (block solvers keep panels as rows — CLAUDE.md layout)."""
    from iterativesolvers_tpu.operators.linear_operator import MatrixOperator
    from iterativesolvers_tpu.operators.stencil import laplacian
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(8, 2, dtype=dtype)
    Ad = np.asarray(A.to_dense())
    Xr = jnp.asarray(
        (rng.random((3, 64)) + (1j * rng.random((3, 64))
         if np.issubdtype(dtype, np.complexfloating) else 0)).astype(dtype))
    want = (Ad @ np.asarray(Xr).T).T
    ops = [A, A.to_csr(), A.to_csr().to_ell(), A.to_csr().to_hyb(),
           MatrixOperator(jnp.asarray(Ad))]
    if not np.issubdtype(dtype, np.complexfloating):
        ops.append(laplacian(8, 2, dtype=dtype))
    csr = A.to_csr()
    bsr = csr.to_bsr(2) if hasattr(csr, "to_bsr") else None
    if bsr is not None:
        ops.append(bsr)
    rt = 1e-5 if dtype in (np.float32, np.complex64) else 1e-12
    for op in ops:
        got = np.asarray(op.mv_rows(Xr))
        np.testing.assert_allclose(got, want, rtol=rt, atol=1e-6,
                                   err_msg=type(op).__name__)


def test_ell_chunked_gather_matches_monolithic(rng):
    """with_chunked_gather splits the SpMV row gather into bounded chunks
    (backend-fault mitigation knob, BENCH_NOTES round 2) — same math up to
    f32 summation order, adjoint included, stable under jit/pytree."""
    import jax
    import jax.numpy as jnp

    from iterativesolvers_tpu.utils.fixtures import random_sparse

    A = random_sparse(300, 200, 0.05, seed=1, dtype=np.float32)
    ell = A.to_ell().with_adjoint()
    ellc = ell.with_chunked_gather(64)
    x = rng.standard_normal(200).astype(np.float32)
    z = rng.standard_normal(300).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ellc.mv(x)), np.asarray(ell.mv(x)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ellc.rmv(z)), np.asarray(ell.rmv(z)),
                               rtol=1e-4, atol=1e-6)
    # jit via the pytree path (chunking must ride the aux, not the trace)
    f = jax.jit(lambda op, v: op.mv(v))
    np.testing.assert_allclose(np.asarray(f(ellc, jnp.asarray(x))),
                               np.asarray(ell.mv(x)), rtol=1e-4, atol=1e-6)
    # chunk >= n degenerates to the monolithic gather
    assert np.array_equal(np.asarray(ell.with_chunked_gather(4096).mv(x)),
                          np.asarray(ell.mv(x)))


def test_compress_values_exact_formats(rng):
    """compress_values narrows the stored-value stream when (and only
    when) every value round-trips exactly; matvec results are bit-identical
    for exactly-representable matrices because each product promotes to the
    vector dtype before accumulating (TPU bandwidth optimization — no
    reference analogue)."""
    A = laplace_dia(6, 3, dtype=np.float32)  # values in {6, -1, 0}: bf16-exact
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    for op in [A, A.to_csr(), A.to_csr().to_ell().with_adjoint(),
               A.to_csr().to_hyb(), its.BSRMatrix.from_csr(A.to_csr(), 2)]:
        assert its.values_representable(op, jnp.bfloat16)
        opc = its.compress_values(op, dtype=jnp.bfloat16)
        assert opc.dtype == jnp.bfloat16
        # default = auto ladder: this matrix is integer-valued -> int8
        assert its.compress_values(op).dtype == jnp.int8
        y32 = np.asarray(op.mv(x))
        yc = np.asarray(opc.mv(x))
        assert yc.dtype == np.float32  # promotes, never degrades the solve
        np.testing.assert_array_equal(yc, y32)
        np.testing.assert_array_equal(np.asarray(opc.rmv(x)),
                                      np.asarray(op.rmv(x)))


def test_compress_values_refuses_inexact(rng):
    """Random values don't round-trip bf16; compress_values returns the
    operator unchanged unless the caller opts into the perturbation."""
    A = random_sparse(60, 60, 0.1, seed=3, dtype=np.float32)
    assert not its.values_representable(A, jnp.bfloat16)
    assert its.compress_values(A) is A
    forced = its.compress_values(A, dtype=jnp.bfloat16, require_exact=False)
    assert forced.dtype == jnp.bfloat16
    x = rng.standard_normal(60).astype(np.float32)
    # perturbed matrix: close but not equal
    np.testing.assert_allclose(np.asarray(forced.mv(x)), np.asarray(A.mv(x)),
                               rtol=2e-2, atol=1e-2)


def test_compress_values_cg_identical_iterates():
    """CG on the bf16-compressed Laplacian must behave identically to f32
    storage (same history, same solution) — the compression is exact for this
    matrix family, so the solver sees the same operator."""
    A = laplace_dia(8, 2, dtype=np.float32)
    Ac = its.compress_values(A)
    b = np.ones(A.shape[0], dtype=np.float32)
    x1, h1 = its.cg(A, b, reltol=1e-6, maxiter=200, log=True)
    x2, h2 = its.cg(Ac, b, reltol=1e-6, maxiter=200, log=True)
    assert h1.niters() == h2.niters()
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_compress_values_complex_never_exact(rng):
    """Complex-to-real narrowing drops imaginary parts in numpy casts —
    values_representable must refuse it even when every imag part is 0."""
    dense = np.zeros((8, 8), dtype=np.complex64)
    dense[np.diag_indices(8)] = 2.0 + 0.0j  # real parts bf16-exact, imag 0
    A = csr_from_dense(dense)
    assert not its.values_representable(A, jnp.bfloat16)
    assert its.compress_values(A) is A


def test_compress_values_int8_exact(rng):
    """Second compression rung: integer-valued matrices are exact in int8
    (quarter the f32 value stream); products still promote to f32."""
    A = laplace_dia(6, 3, dtype=np.float32)
    assert its.values_representable(A, jnp.int8)
    Ai = its.compress_values(A, dtype=jnp.int8)
    assert Ai.dtype == jnp.int8
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    y = np.asarray(Ai.mv(x))
    assert y.dtype == np.float32
    np.testing.assert_array_equal(y, np.asarray(A.mv(x)))
    # non-integer values are refused
    B = sym_tridiagonal_dia(2.01, -1.0, 32)
    assert not its.values_representable(B, jnp.int8)
    assert its.compress_values(B, dtype=jnp.int8) is B


def test_gradient_operator_matches_csr_and_adjoint():
    """GradientOperator (matrix-free rectangular gradient, zero gathers)
    equals its materialized CSR on mv and rmv, and rmv is the true adjoint."""
    import jax.numpy as jnp

    from iterativesolvers_tpu.operators.stencil import GradientOperator

    G = GradientOperator((4, 5, 6), dtype=np.float64)
    C = G.to_csr()
    assert G.shape == (3 * 120, 120) == C.shape
    rng = np.random.default_rng(0)
    x = rng.standard_normal(G.n)
    y = rng.standard_normal(G.shape[0])
    np.testing.assert_allclose(np.asarray(G.mv(jnp.asarray(x))),
                               np.asarray(C.mv(x)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G.rmv(jnp.asarray(y))),
                               np.asarray(C.rmv(y)), atol=1e-12)
    lhs = float(jnp.vdot(jnp.asarray(y), G.mv(jnp.asarray(x))))
    rhs = float(jnp.vdot(G.rmv(jnp.asarray(y)), jnp.asarray(x)))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)
