"""ILU(0) / IC(0) preconditioners: host factorization (native C++ pass,
numpy fallback for complex) + device level-scheduled triangular applies.
The reference ships no incomplete factorizations (docs point to external
packages; its tests build an inexact LU via lu(droptol!), test/idrs.jl:54-60)
— these are the TPU-native equivalent capability."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterativesolvers_tpu as its
from iterativesolvers_tpu import ICPreconditioner, ILUPreconditioner
from iterativesolvers_tpu.utils.fixtures import advection_diffusion, laplace_dia


def test_ilu0_exact_when_no_fill():
    """Tridiagonal: the exact LU has zero fill, so ILU(0) IS the exact
    factorization and the preconditioned solve converges in one iteration."""
    T = laplace_dia(256, 1, dtype=np.float64).to_csr()
    P = ILUPreconditioner.from_operator(T)
    y = np.asarray(P.ldiv(jnp.ones(256)))
    y_exact = np.linalg.solve(np.asarray(T.to_dense()), np.ones(256))
    np.testing.assert_allclose(y, y_exact, rtol=1e-12)
    x, h = its.gmres(T, jnp.ones(256), Pl=P, reltol=1e-12, maxiter=20, log=True)
    assert h.isconverged and h.iters <= 2


def test_ilu0_gmres_advection_diffusion():
    A, b = advection_diffusion(12)  # n = 1728, nonsymmetric
    csr = A.to_csr()
    bb = jnp.asarray(b)
    _, h0 = its.gmres(csr, bb, reltol=1e-8, restart=20, maxiter=600, log=True)
    P = ILUPreconditioner.from_operator(csr)
    x, h1 = its.gmres(csr, bb, Pl=P, reltol=1e-8, restart=20, maxiter=600,
                      log=True)
    assert h1.isconverged
    assert h1.iters < max(h0.iters, 100) * 0.5
    r = np.asarray(csr.mv(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_ic0_cg_spd():
    A = laplace_dia(24, 2, dtype=np.float64).to_csr()  # n = 576 SPD
    b = jnp.ones(A.shape[0])
    _, h0 = its.cg(A, b, reltol=1e-10, maxiter=2000, log=True)
    P = ICPreconditioner.from_operator(A)
    x, h1 = its.cg(A, b, Pl=P, reltol=1e-10, maxiter=2000, log=True)
    assert h1.isconverged
    assert h1.iters < h0.iters * 0.7  # observed ~0.4
    res = np.linalg.norm(np.asarray(A.mv(x)) - 1.0) / np.sqrt(A.shape[0])
    assert res < 1e-8


def test_ic0_exact_when_no_fill():
    T = laplace_dia(200, 1, dtype=np.float64).to_csr()
    P = ICPreconditioner.from_operator(T)
    y = np.asarray(P.ldiv(jnp.ones(200)))
    y_exact = np.linalg.solve(np.asarray(T.to_dense()), np.ones(200))
    np.testing.assert_allclose(y, y_exact, rtol=1e-12)


def test_ilu0_complex_fallback():
    """Complex dtypes take the dtype-generic numpy factorization."""
    T = laplace_dia(64, 1, dtype=np.complex128).to_csr()
    P = ILUPreconditioner.from_operator(T)
    rhs = jnp.asarray(np.ones(64) + 1j * np.arange(64))
    y = np.asarray(P.ldiv(rhs))
    y_exact = np.linalg.solve(np.asarray(T.to_dense()), np.asarray(rhs))
    np.testing.assert_allclose(y, y_exact, rtol=1e-12)


def test_ic0_breakdown_raises():
    """Indefinite matrix: IC(0) hits a non-positive pivot and raises."""
    from iterativesolvers_tpu.operators.sparse import csr_from_dense

    A = csr_from_dense(jnp.asarray(np.diag([1.0, -1.0, 1.0])))
    with pytest.raises(ZeroDivisionError):
        ICPreconditioner.from_operator(A)


def test_ilu0_missing_diagonal_raises():
    from iterativesolvers_tpu.operators.sparse import CSRMatrix

    A = CSRMatrix.from_coo(
        np.array([0, 1]), np.array([1, 0]), np.array([1.0, 1.0]), (2, 2))
    with pytest.raises(ZeroDivisionError):
        ILUPreconditioner.from_operator(A)


def test_ic0_lobpcg_preconditioner():
    """IC(0) through LOBPCG's P kwarg (symmetric apply)."""
    A = laplace_dia(20, 2, dtype=np.float64)
    P = ICPreconditioner.from_operator(A.to_csr())
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((400, 3)))
    r0 = its.lobpcg(A, X0, largest=False, tol=1e-6, maxiter=500)
    r1 = its.lobpcg(A, X0, P=P, largest=False, tol=1e-6, maxiter=500)
    assert r1.converged
    assert r1.iterations <= r0.iterations
    np.testing.assert_allclose(np.asarray(r1.lam), np.asarray(r0.lam),
                               rtol=1e-5)


def test_block_jacobi_ilu():
    """Block-Jacobi ILU(0): decoupled blocks collapse the level count to the
    largest block's depth, converging slower than global ILU(0) but still
    far faster than unpreconditioned."""
    A, b = advection_diffusion(12)
    csr = A.to_csr()
    bb = jnp.asarray(b)
    Pbj = ILUPreconditioner.block_jacobi(csr, 8)
    Pg = ILUPreconditioner.from_operator(csr)
    # decoupled blocks => strictly fewer levels than the global factorization
    assert Pbj.lower_solve.nlevels < Pg.lower_solve.nlevels
    _, h0 = its.gmres(csr, bb, reltol=1e-8, restart=20, maxiter=600, log=True)
    x, h = its.gmres(csr, bb, Pl=Pbj, reltol=1e-8, restart=20, maxiter=600,
                     log=True)
    assert h.isconverged
    assert h.iters < max(h0.iters, 100)
    r = np.asarray(csr.mv(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_incomplete_factorizations_on_compressed_operators():
    """ILU(0)/IC(0) factors are NOT representable in narrowed value dtypes:
    ilu0/ic0 must promote int8/bf16 (compress_values) input to float factors
    instead of truncating back to the input dtype (regression: factors were
    cast to the data dtype, silently corrupting the preconditioner)."""
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.preconditioners import (
        ICPreconditioner, ILUPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(8, 2, dtype=np.float32)
    b = np.ones(A.shape[0], np.float32)
    x_ref, h_ref = its.cg(A, b, Pl=ICPreconditioner.from_operator(A.to_csr()),
                          reltol=1e-8, log=True, maxiter=100)
    for op in (its.compress_values(A),                       # int8
               its.compress_values(A, dtype=jnp.bfloat16)):  # bf16
        P = ICPreconditioner.from_operator(op.to_csr())
        assert P.lower_solve.vals.dtype == jnp.float32
        x, h = its.cg(op, b, Pl=P, reltol=1e-8, log=True, maxiter=100)
        assert h.niters() == h_ref.niters()
        np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))
        Pi = ILUPreconditioner.from_operator(op.to_csr())
        x2 = its.gmres(op, b, Pl=Pi, reltol=1e-8, restart=20)
        r2 = np.linalg.norm(np.asarray(A.mv(x2)) - b) / np.linalg.norm(b)
        assert r2 < 1e-6


def test_multicolor_ic0_level_collapse_and_convergence():
    """ordering="multicolor": the IC(0) apply's level schedule collapses to
    the color count (2 for red-black stencil grids) while preconditioned CG
    convergence stays in the same class as natural ordering (VERDICT r3
    item 4: the apply must be wall-clock-parallel, not depth-bound)."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.preconditioners import ICPreconditioner
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(12, 3, dtype=np.float64).to_csr()   # 1728 rows, 7-point
    b = np.ones(A.shape[0])
    Pn = ICPreconditioner.from_operator(A)
    Pm = ICPreconditioner.from_operator(A, ordering="multicolor")
    assert Pm.nlevels == 2                     # red-black
    assert Pn.nlevels > 5 * Pm.nlevels         # natural is depth-bound
    x0, h0 = its.cg(A, b, reltol=1e-8, maxiter=2000, log=True)
    xm, hm = its.cg(A, b, Pl=Pm, reltol=1e-8, maxiter=2000, log=True)
    xn, hn = its.cg(A, b, Pl=Pn, reltol=1e-8, maxiter=2000, log=True)
    assert hm.isconverged
    # still a real preconditioner (beats unpreconditioned), and within 1.5x
    # of natural-order IC iterations (the known multicolor quality tax)
    assert hm.iters < h0.iters
    assert hm.iters <= 1.5 * hn.iters + 2
    r = np.linalg.norm(np.asarray(A.mv(xm)) - b) / np.linalg.norm(b)
    assert r < 1e-7


def test_multicolor_ilu0_gmres_nonsymmetric():
    """Multicolor ILU(0) on the advection-diffusion operator accelerates
    GMRES; the permuted apply is algebraically a preconditioner of A itself
    (solution matches the unpreconditioned solve)."""
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.operators.preconditioners import ILUPreconditioner
    from iterativesolvers_tpu.utils.fixtures import advection_diffusion

    A, b = advection_diffusion(12, dtype=np.float64)
    csr = A.to_csr()
    P = ILUPreconditioner.from_operator(csr, ordering="multicolor")
    assert P.nlevels <= 4
    x, h = its.gmres(csr, jnp.asarray(b), Pl=P, restart=20, reltol=1e-9,
                     maxiter=500, log=True)
    x0, h0 = its.gmres(csr, jnp.asarray(b), restart=20, reltol=1e-9,
                       maxiter=500, log=True)
    assert h.isconverged and h.iters < h0.iters
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0),
                               rtol=1e-5, atol=1e-8)


def test_multicolor_unknown_ordering_raises():
    from iterativesolvers_tpu.operators.preconditioners import (
        ICPreconditioner, ILUPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import laplace_dia

    A = laplace_dia(6, 2, dtype=np.float64).to_csr()
    with pytest.raises(ValueError):
        ILUPreconditioner.from_operator(A, ordering="rainbow")
    with pytest.raises(ValueError):
        ICPreconditioner.from_operator(A, ordering="rainbow")


def test_redblack_ic_exact_vs_native_ic0():
    """RedBlackICPreconditioner (gather-free closed form) IS the IC(0) of
    the red-black-ordered matrix: equality with the native sequential ic0
    factorization to machine epsilon, on odd AND even grid sides."""
    from iterativesolvers_tpu.operators.preconditioners import (
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.operators.stencil import laplacian

    rng = np.random.default_rng(0)
    for side, dims in ((9, 3), (8, 2)):
        st = laplacian(side, dims, dtype=np.float64)
        n = st.n
        P = RedBlackICPreconditioner.from_stencil(st)
        csr = laplace_dia(side, dims, dtype=np.float64).to_csr()
        red = np.asarray(P.red)
        perm = np.concatenate([np.where(red)[0], np.where(~red)[0]])
        Pic = ICPreconditioner.from_operator(csr.permute(perm))
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        x = rng.standard_normal(n)
        ours = np.asarray(P.ldiv(jnp.asarray(x)))
        ref = np.asarray(Pic.ldiv(jnp.asarray(x[perm])))[inv]
        np.testing.assert_allclose(ours, ref, atol=1e-14)


def test_redblack_ic_symmetric_accelerates_and_vmaps():
    import jax

    from iterativesolvers_tpu.operators.preconditioners import (
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.operators.stencil import laplacian

    st = laplacian(9, 3, dtype=np.float64)
    P = RedBlackICPreconditioner.from_stencil(st)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(st.n)
    v = rng.standard_normal(st.n)
    lhs = float(u @ np.asarray(P.ldiv(jnp.asarray(v))))
    rhs = float(v @ np.asarray(P.ldiv(jnp.asarray(u))))
    assert abs(lhs - rhs) < 1e-12 * abs(lhs)
    b = jnp.ones(st.n)
    x0, h0 = its.cg(st, b, reltol=1e-10, maxiter=2000, log=True)
    xp, hp = its.cg(st, b, Pl=P, reltol=1e-10, maxiter=2000, log=True)
    assert hp.isconverged and hp.iters < h0.iters
    assert float(jnp.linalg.norm(st.mv(xp) - b)) < 1e-8
    blk = jnp.asarray(rng.standard_normal((3, st.n)))
    out = np.asarray(jax.vmap(P.ldiv)(blk))
    ref = np.stack([np.asarray(P.ldiv(blk[i])) for i in range(3)])
    np.testing.assert_allclose(out, ref, atol=1e-14)


def test_redblack_ic_guards():
    from iterativesolvers_tpu.operators.preconditioners import (
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.operators.stencil import (
        StencilOperator, advection_diffusion_stencil,
    )

    # non-unit step (|offset| != stride)
    bad = StencilOperator(64, 4.0, ((2, 1, 64), (-2, 1, 64)), (-1.0, -1.0),
                          dtype=np.float64)
    with pytest.raises(ValueError):
        RedBlackICPreconditioner.from_stencil(bad)
    # nonsymmetric coefficients (advection)
    with pytest.raises(ValueError):
        RedBlackICPreconditioner.from_stencil(
            advection_diffusion_stencil(8, dtype=np.float64))
    with pytest.raises(TypeError):
        RedBlackICPreconditioner.from_stencil(laplace_dia(8, 2))


def test_redblack_ic_from_dia_variable_coeff_exact_vs_native():
    """The variable-coefficient closed form (from_dia) IS the IC(0) of the
    RB-ordered matrix — equality with the native sequential ic0 on the
    variable_diffusion fixture (per-row centers exercise the
    neighbor-center pivot term), odd AND even sides, 2-D and 3-D."""
    from iterativesolvers_tpu.operators.preconditioners import (
        ICPreconditioner,
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    rng = np.random.default_rng(2)
    for side, dims, aniso in ((9, 3, (1, 1, 30)), (8, 2, None)):
        A = variable_diffusion(side, dims, contrast=1e3, aniso=aniso,
                               seed=3, dtype=np.float64)
        n = A.shape[0]
        P = RedBlackICPreconditioner.from_dia(A, side, dims)
        csr = A.to_csr()
        red = np.asarray(P.red)
        perm = np.concatenate([np.where(red)[0], np.where(~red)[0]])
        Pic = ICPreconditioner.from_operator(csr.permute(perm))
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        x = rng.standard_normal(n)
        ours = np.asarray(P.ldiv(jnp.asarray(x)))
        ref = np.asarray(Pic.ldiv(jnp.asarray(x[perm])))[inv]
        np.testing.assert_allclose(ours, ref, atol=1e-12, rtol=1e-12)


def test_redblack_ic_from_dia_accelerates_cg():
    """PCG with the variable-coefficient RB-IC cuts iterations vs
    unpreconditioned CG on a high-contrast variable_diffusion problem."""
    from iterativesolvers_tpu.operators.preconditioners import (
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 24, 2
    A = variable_diffusion(side, dims, contrast=1e4, seed=1,
                           dtype=np.float64)
    n = A.shape[0]
    b = jnp.ones(n)
    P = RedBlackICPreconditioner.from_dia(A, side, dims)
    x0, h0 = its.cg(A, b, reltol=1e-8, maxiter=3000, log=True)
    xp, hp = its.cg(A, b, Pl=P, reltol=1e-8, maxiter=3000, log=True)
    assert h0.isconverged and hp.isconverged
    assert hp.iters < h0.iters / 2, (hp.iters, h0.iters)
    r = np.asarray(A.mv(xp)) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-6


def test_redblack_ic_from_dia_guards():
    from iterativesolvers_tpu.operators.preconditioners import (
        RedBlackICPreconditioner,
    )
    from iterativesolvers_tpu.operators.sparse import DIAMatrix
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    with pytest.raises(ValueError, match="side"):
        RedBlackICPreconditioner.from_dia(
            variable_diffusion(8, 2, dtype=np.float64), 7, 2)
    # non-unit-step offsets rejected
    n = 16
    d = np.ones(n)
    bad = DIAMatrix(np.stack([d * 4, -d, -d]), (0, 3, -3), (n, n))
    with pytest.raises(ValueError, match="unit grid steps"):
        RedBlackICPreconditioner.from_dia(bad, 16, 1)
    # asymmetric values rejected
    off = -np.arange(1, n + 1, dtype=np.float64)
    bad2 = DIAMatrix(np.stack([np.full(n, 40.0), off,
                               np.roll(off * 2, 1)]), (0, 1, -1), (n, n))
    with pytest.raises(ValueError, match="not symmetric"):
        RedBlackICPreconditioner.from_dia(bad2, 16, 1)


def test_eisenstat_operator_algebra():
    """Ahat == (I+E)^{-1} Atilde (I+E^T)^{-1} verified against the dense
    algebra, and the transform pipeline solves the original system."""
    from iterativesolvers_tpu.operators.preconditioners import (
        EisenstatSSOROperator,
    )
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 7, 2
    A = variable_diffusion(side, dims, contrast=100, seed=5,
                           dtype=np.float64)
    n = A.shape[0]
    Ah = EisenstatSSOROperator.from_dia(A, side, dims)
    D = np.asarray(A.to_dense())
    s = 1.0 / np.sqrt(np.diag(D))
    At = s[:, None] * D * s[None, :]
    red = np.asarray(Ah.red)
    # E = strictly-lower block in RB ordering: rows black, cols red
    E = np.where(~red[:, None] & red[None, :], At, 0.0)
    IE = np.eye(n) + E
    Ahat_dense = np.linalg.solve(IE, At @ np.linalg.solve(IE.T, np.eye(n)))
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(Ah.mv(jnp.asarray(v))),
                               Ahat_dense @ v, atol=1e-11)
    # end-to-end: transform, CG on Ahat, untransform == direct solve
    b = rng.standard_normal(n)
    bhat = Ah.rhs_transform(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(bhat),
                               np.linalg.solve(IE, s * b), atol=1e-11)
    xhat = its.cg(Ah, bhat, reltol=1e-12, maxiter=2000)
    x = Ah.solution_transform(xhat)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(D, b),
                               rtol=1e-8, atol=1e-10)


def test_eisenstat_cuts_iterations_vs_jacobi():
    """CG on the Eisenstat operator converges in fewer iterations than
    Jacobi-scaled CG (SSOR quality) on a high-contrast fixture — and each
    iteration costs ~2 shift passes instead of SpMV + apply."""
    from iterativesolvers_tpu.operators.preconditioners import (
        EisenstatSSOROperator,
    )
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 24, 2
    A = variable_diffusion(side, dims, contrast=1e4, seed=1,
                           dtype=np.float64)
    n = A.shape[0]
    b = jnp.ones(n)
    d, _ = A.diagonal()
    _, hj = its.cg(A, b, Pl=its.DiagonalPreconditioner(d), reltol=1e-8,
                   maxiter=3000, log=True)
    Ah = EisenstatSSOROperator.from_dia(A, side, dims)
    bhat = Ah.rhs_transform(b)
    xhat, he = its.cg(Ah, bhat, reltol=1e-8, maxiter=3000, log=True)
    x = Ah.solution_transform(xhat)
    assert hj.isconverged and he.isconverged
    assert he.iters < hj.iters, (he.iters, hj.iters)
    r = np.asarray(A.mv(x)) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-6


def test_rb_reduced_system_algebra_and_solve():
    """Cyclic reduction of the RB-scaled system: the half-size operator
    equals the black block of I - E E^T (dense check), and
    reduce -> half-size CG -> expand solves the original system."""
    from iterativesolvers_tpu.operators.rb_reduce import RBReducedSystem
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    rng = np.random.default_rng(0)
    for side, dims in ((8, 2), (6, 3)):
        A = variable_diffusion(side, dims, contrast=100, seed=5,
                               dtype=np.float64)
        n = A.shape[0]
        R = RBReducedSystem.from_dia(A, side, dims)
        D = np.asarray(A.to_dense())
        s = 1.0 / np.sqrt(np.diag(D))
        At = s[:, None] * D * s[None, :]
        # parity masks in global numbering
        i = np.arange(n)
        p = np.zeros(n, np.int64)
        for k in range(dims):
            p += (i // side**k) % side
        red = (p % 2) == 0
        E = np.where(~red[:, None] & red[None, :], At, 0.0)
        Ahat = np.eye(n) - E @ E.T           # black-block Schur system
        # compact black ordering == global order of black elements
        bidx = i[~red]
        v = rng.standard_normal(n)
        _, vb = R.split(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(vb), v[bidx], atol=0)
        # mv equality on the black block
        out = np.asarray(R.mv(jnp.asarray(v[bidx])))
        ref = (Ahat @ np.where(red, 0, v))[bidx]
        np.testing.assert_allclose(out, ref, atol=1e-12)
        # split/merge roundtrip
        r_, b_ = R.split(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(R.merge(r_, b_)), v, atol=0)
        # end-to-end solve
        b = rng.standard_normal(n)
        bb, br = R.reduce_rhs(jnp.asarray(b))
        xb = its.cg(R, bb, reltol=1e-13, maxiter=2000)
        x = R.expand_solution(xb, br)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(D, b),
                                   rtol=1e-8, atol=1e-9)


def test_rb_reduced_matches_eisenstat_iterations():
    """The reduced half-size CG takes (about) the same iteration count as
    full-space Eisenstat CG (same preconditioned spectrum on the black
    block; red rows are identity) while touching half the data."""
    from iterativesolvers_tpu.operators.preconditioners import (
        EisenstatSSOROperator,
    )
    from iterativesolvers_tpu.operators.rb_reduce import RBReducedSystem
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 24, 2
    A = variable_diffusion(side, dims, contrast=1e4, seed=1,
                           dtype=np.float64)
    n = A.shape[0]
    b = jnp.ones(n)
    Ah = EisenstatSSOROperator.from_dia(A, side, dims)
    _, he = its.cg(Ah, Ah.rhs_transform(b), reltol=1e-9, maxiter=3000,
                   log=True)
    R = RBReducedSystem.from_dia(A, side, dims)
    bb, br = R.reduce_rhs(b)
    xb, hr = its.cg(R, bb, reltol=1e-9, maxiter=3000, log=True)
    assert he.isconverged and hr.isconverged
    assert abs(hr.iters - he.iters) <= max(3, 0.2 * he.iters), (
        hr.iters, he.iters)
    x = R.expand_solution(xb, br)
    r = np.asarray(A.mv(x)) - 1.0
    assert np.linalg.norm(r) / np.sqrt(n) < 1e-7


def test_rb_reduced_guards():
    from iterativesolvers_tpu.operators.rb_reduce import RBReducedSystem
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    with pytest.raises(ValueError, match="even side"):
        RBReducedSystem.from_dia(
            variable_diffusion(9, 2, dtype=np.float64), 9, 2)


def test_eisenstat_from_dia_guards():
    from iterativesolvers_tpu.operators.preconditioners import (
        EisenstatSSOROperator,
    )
    from iterativesolvers_tpu.operators.sparse import DIAMatrix
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    with pytest.raises(ValueError, match="side"):
        EisenstatSSOROperator.from_dia(
            variable_diffusion(8, 2, dtype=np.float64), 7, 2)
    n = 16
    off = -np.arange(1, n + 1, dtype=np.float64)
    bad = DIAMatrix(np.stack([np.full(n, 40.0), off,
                              np.roll(off * 2, 1)]), (0, 1, -1), (n, n))
    with pytest.raises(ValueError, match="not symmetric"):
        EisenstatSSOROperator.from_dia(bad, 16, 1)


def test_rb_reduced_multi_rhs():
    """mv on (nh, k) operands and block_cg on the reduced system."""
    from iterativesolvers_tpu.operators.rb_reduce import RBReducedSystem
    from iterativesolvers_tpu.utils.fixtures import variable_diffusion

    side, dims = 8, 2
    A = variable_diffusion(side, dims, contrast=50, seed=6,
                           dtype=np.float64)
    R = RBReducedSystem.from_dia(A, side, dims)
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.standard_normal((R.nh, 3)))
    cols = np.stack([np.asarray(R.mv(V[:, j])) for j in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(R.mv(V)), cols, atol=1e-13)
    # two rhs through reduce -> block_cg -> expand
    B = rng.standard_normal((A.shape[0], 2))
    outs = []
    parts = [R.reduce_rhs(jnp.asarray(B[:, j])) for j in range(2)]
    BB = jnp.stack([p[0] for p in parts], axis=1)
    XB = its.block_cg(R, BB, reltol=1e-12, maxiter=1000)
    D = np.asarray(A.to_dense())
    for j in range(2):
        x = R.expand_solution(XB[:, j], parts[j][1])
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(D, B[:, j]),
                                   rtol=1e-8, atol=1e-9)
