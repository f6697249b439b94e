"""Pallas kernel tests (interpret mode on CPU): DIA SpMV, windowed stencil
SpMV (+fused dot), and VMEM-resident panel MGS.

Compiled-path evidence on real TPU (BENCH_NOTES.md): the stencil and
panel-MGS kernels are in ``bench.py``'s hot paths; the DIA kernel is
correct-but-slower than XLA's own DIA fusion (head-to-head in
``benchmarks/tpu_spmv_bench.py``) and is NOT in any solver dispatch —
kept as the measured negative result."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativesolvers_tpu.ops.pallas_spmv import dia_spmv, dia_spmv_dot
from iterativesolvers_tpu.utils.fixtures import advection_diffusion, laplace_dia


def test_spmv_matches_reference(rng):
    A = laplace_dia(16, 2, dtype=np.float32)  # n = 256
    x = jnp.asarray(rng.random(A.shape[0]).astype(np.float32))
    y = dia_spmv(A.diags, A.offsets, x, block_rows=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.mv(x)), rtol=1e-5, atol=1e-6
    )


def test_spmv_nonsymmetric_and_unaligned_n(rng):
    A, _ = advection_diffusion(8)  # n = 512, nonsymmetric stencil
    A = type(A)(tuple(d.astype(np.float32) for d in A.diags), A.offsets, A.shape)
    x = jnp.asarray(rng.random(A.shape[0]).astype(np.float32))
    # block larger than n exercises the padded tail
    y = dia_spmv(A.diags, A.offsets, x, block_rows=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.mv(x)), rtol=1e-4, atol=1e-4
    )


def test_spmv_dot_fused(rng):
    A = laplace_dia(16, 2, dtype=np.float32)
    n = A.shape[0]
    x = jnp.asarray(rng.random(n).astype(np.float32))
    u = jnp.asarray(rng.random(n).astype(np.float32))
    y, d = dia_spmv_dot(A.diags, A.offsets, x, u, block_rows=1024, interpret=True)
    y_ref = A.mv(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5)
    assert abs(float(d) - float(jnp.sum(u * y_ref))) < 1e-3


def test_spmv_dot_multiblock_accumulation(rng):
    # nb > 1 exercises the sequential-grid accumulate into the (1,1) SMEM slot
    A = laplace_dia(16, 3, dtype=np.float32)  # n = 4096, 4 blocks of 1024
    n = A.shape[0]
    x = jnp.asarray(rng.random(n).astype(np.float32))
    u = jnp.asarray(rng.random(n).astype(np.float32))
    y, d = dia_spmv_dot(A.diags, A.offsets, x, u, block_rows=1024, interpret=True)
    y_ref = A.mv(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                               atol=1e-4)
    ref = float(jnp.sum(u * y_ref))
    assert abs(float(d) - ref) < 1e-2 * max(1.0, abs(ref))


# ---------------- windowed stencil kernel (ops/pallas_stencil.py) ----------


def _stencil_check(St, conj=False, with_dot=True, seed=3):
    from iterativesolvers_tpu.ops.pallas_stencil import stencil_apply, stencil_plan

    plan = stencil_plan(St.n, St.terms, conj=conj)
    assert plan is not None
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal(St.n).astype(np.float32))
    inner = [St.coeffs[i] for i in plan.inner_idx]
    outer = [St.coeffs[i] for i in plan.outer_idx]
    out = stencil_apply(plan, St.center, inner, outer, x,
                        with_dot=with_dot, interpret=True)
    y, d = out if with_dot else (out, None)
    y_ref = St._apply(x, conj=conj)
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5 * scale)
    if with_dot:
        dref = float(jnp.sum(x * y_ref))
        assert abs(float(d) - dref) <= 1e-5 * max(1.0, abs(dref)) * St.n ** 0.5
    return plan


def test_stencil_kernel_laplace_2d():
    import iterativesolvers_tpu as its

    _stencil_check(its.laplacian(48, 2, dtype=np.float32))


def test_stencil_kernel_laplace_3d_single_block():
    import iterativesolvers_tpu as its

    plan = _stencil_check(its.laplacian(24, 3, dtype=np.float32))
    assert plan.nb == 1


def test_stencil_kernel_multiblock_partial_tail():
    import iterativesolvers_tpu as its

    # 72^3 = 373248: two blocks, ragged last interior block
    plan = _stencil_check(its.laplacian(72, 3, dtype=np.float32))
    assert plan.nb == 2 and plan.nb * plan.block > plan.n


def test_stencil_kernel_nonsymmetric_and_adjoint():
    from iterativesolvers_tpu.operators.stencil import advection_diffusion_stencil

    Ad = advection_diffusion_stencil(24)
    _stencil_check(Ad, conj=False)
    _stencil_check(Ad, conj=True)


def test_stencil_plan_infeasible_cases():
    from iterativesolvers_tpu.ops.pallas_stencil import stencil_plan

    # tiny n: no kernel
    assert stencil_plan(512, ((1, 1, 512),)) is None
    # odd prime-ish side whose period lcm with 1024 explodes past the cap
    side = 1021  # prime -> lcm(side^2, 1024) = 1024 * side^2 >> cap
    terms = ((1, 1, side), (-1, 1, side),
             (side, side, side), (-side, side, side),
             (side * side, side * side, side), (-side * side, side * side, side))
    assert stencil_plan(side ** 3, terms) is None


def test_stencil_kernel_inside_shard_map():
    """pallas_call under jax.shard_map: per-shard kernel launch on the
    mesh-varying local block.  Interpret mode must run under
    ``check_vma=False`` (the JAX <= 0.9 interpret lowering replays the
    kernel jaxpr with raw binds that trip the vma checker — see
    ops/pallas_stencil.py); the compiled Mosaic path keeps the check on.
    The problem is sized so n_loc = 16384/8 = 2048 >= stencil_plan's
    2*_LANE feasibility minimum (was 288: committed never-passing)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.ops.pallas_stencil import stencil_apply, stencil_plan

    side = 128
    St = its.laplacian(side, 2, dtype=np.float32)  # n = 16384 = 8 * 2048
    ndev = min(len(jax.devices()), 8)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    n_loc = St.n // ndev
    plan = stencil_plan(n_loc, ((-1, 1, side), (1, 1, side)))
    assert plan is not None
    inner = [St.coeffs[0], St.coeffs[1]]

    def local(x_loc):
        y, d = stencil_apply(plan, St.center, inner, [], x_loc,
                             with_dot=True, interpret=True)
        return y, jax.lax.psum(d, "rows")

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal(St.n).astype(np.float32))
    y, d = jax.shard_map(local, mesh=mesh, in_specs=P("rows"),
                         out_specs=(P("rows"), P()), check_vma=False)(x)
    # algebraic check: each shard applied the tridiagonal part locally
    # (zero-halo); verify one interior shard row against the direct formula
    y = np.asarray(y)
    xh = np.asarray(x)
    i = n_loc + 5  # interior of shard 1
    expect = (float(St.center) * xh[i]
              + float(inner[0]) * (xh[i - 1] if (i % side) else 0.0)
              + float(inner[1]) * (xh[i + 1] if ((i + 1) % side) else 0.0))
    # shard-local indexing: i-1 and i+1 are inside shard 1 here
    np.testing.assert_allclose(y[i], expect, rtol=1e-5)
    assert np.isfinite(float(d))


def test_halo_stencil_pallas_interior_inside_shard_map():
    """End-to-end: HaloStencilOperator's per-shard Pallas interior actually
    executes inside shard_map at a realistic per-shard size (216^3 / 8 =
    1,259,712 rows/shard — the BASELINE north-star decomposition), matching
    the XLA interior path exactly.  VERDICT r2 item 3: the same kernel code
    path must be active at 1 and 8 devices."""
    import jax
    from jax.sharding import Mesh

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu import parallel as par
    from iterativesolvers_tpu.ops.pallas_stencil import stencil_plan

    side = 72  # 72^3 = 373,248 rows -> 46,656/shard; same plan structure as
    # 216^3 (period = lcm(side, side^2)), CPU-interpret tractable
    St = its.laplacian(side, 3, dtype=np.float32)
    ndev = min(len(jax.devices()), 8)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    n_loc = St.n // ndev
    # the per-shard plan must exist at this size (else the interior silently
    # falls back to XLA and this test is vacuous)
    eff = tuple((o, s, e) for (o, s, e) in St.terms)
    assert stencil_plan(n_loc, eff) is not None

    H = par.HaloStencilOperator(St, mesh)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal(St.n).astype(np.float32))
    y_ref = np.asarray(St.mv(x))

    # force the Pallas interior (interpret mode) despite the CPU backend
    import iterativesolvers_tpu.parallel.sharded as sh
    old = sh._PALLAS_INTERPRET
    sh._PALLAS_INTERPRET = True
    try:
        y = np.asarray(H.mv(x))
        yd, dot = H.mv_dot(x)
    finally:
        sh._PALLAS_INTERPRET = old
    scale = float(np.abs(y_ref).max())
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(yd), y_ref, rtol=1e-5,
                               atol=1e-5 * scale)
    dref = float(x @ jnp.asarray(y_ref))
    assert abs(float(dot) - dref) <= 1e-5 * max(1.0, abs(dref)) * St.n ** 0.5


# ---------------- panel MGS kernel (ops/pallas_mgs.py) ---------------------


def _panel_mgs_check(n, m1, k, seed=0):
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad, panel_mgs

    n_pad = mgs_pad(n)
    r = np.random.default_rng(seed)
    V = np.zeros((m1, n_pad), np.float32)
    Q, _ = np.linalg.qr(r.standard_normal((n, k + 1)).astype(np.float32))
    V[: k + 1, :n] = Q.T
    w = r.standard_normal(n).astype(np.float32)

    y, h, nrm = panel_mgs(
        jnp.asarray(V.reshape(-1)), jnp.asarray(w), jnp.int32(k), m1,
        interpret=True,
    )
    y, h, nrm = np.asarray(y).reshape(-1), np.asarray(h), float(nrm)

    wr = w.astype(np.float64).copy()
    href = np.zeros(m1)
    for j in range(k + 1):
        href[j] = V[j, :n].astype(np.float64) @ wr
        wr -= href[j] * V[j, :n]
    nref = np.linalg.norm(wr)

    np.testing.assert_allclose(h, href, rtol=2e-5, atol=2e-5)
    assert abs(nrm - nref) <= 1e-5 * nref
    np.testing.assert_allclose(y[:n], wr / nref, rtol=2e-4, atol=2e-5)
    # pad region zero and inactive-row coefficients zero
    assert np.abs(y[n:]).max(initial=0.0) == 0.0
    assert np.abs(h[k + 1:]).max(initial=0.0) == 0.0
    # reconstruction: w = V^T h + nrm * y
    recon = V[:, :n].T @ h + nrm * y[:n]
    np.testing.assert_allclose(recon, w, rtol=1e-4, atol=1e-4)


def test_panel_mgs_ragged_tail():
    # n not a multiple of 1024 NOR of the chunk: exercises pad + tail paths
    _panel_mgs_check(n=4 * 262144 + 3000, m1=6, k=3)


def test_panel_mgs_full_and_single_row():
    _panel_mgs_check(n=4 * 262144, m1=4, k=2)   # aligned n, k = m-2
    _panel_mgs_check(n=5 * 262144 + 512, m1=5, k=0)  # one active row


def test_panel_mgs_plan_gates():
    from iterativesolvers_tpu.ops.pallas_mgs import panel_mgs_plan

    assert panel_mgs_plan(4 * 262144, jnp.float32) is not None
    assert panel_mgs_plan(1024, jnp.float32) is None          # too small
    assert panel_mgs_plan(4 * 262144, jnp.float64) is None    # f32 only
    assert panel_mgs_plan(64 * 2**20, jnp.float32) is None    # w > VMEM


def test_panel_mgs_bf16_panel():
    """bf16 panel storage (GMRES-IR mode): f32 arithmetic against bf16-stored
    rows — coefficients accurate to ~bf16 eps, w still exactly normalized."""
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad, panel_mgs

    n, m1, k = 4 * 262144 + 1000, 5, 2
    n_pad = mgs_pad(n)
    r = np.random.default_rng(3)
    V = np.zeros((m1, n_pad), np.float32)
    Q, _ = np.linalg.qr(r.standard_normal((n, k + 1)).astype(np.float32))
    V[: k + 1, :n] = Q.T
    Vb = jnp.asarray(V.reshape(-1)).astype(jnp.bfloat16)
    w = r.standard_normal(n).astype(np.float32)

    y, h, nrm = panel_mgs(Vb, jnp.asarray(w), jnp.int32(k), m1, interpret=True)
    y, h, nrm = np.asarray(y).reshape(-1), np.asarray(h), float(nrm)

    Vf = np.asarray(Vb.reshape(m1, n_pad), np.float32)
    wr = w.astype(np.float64).copy()
    href = np.zeros(m1)
    for j in range(k + 1):
        href[j] = Vf[j, :n].astype(np.float64) @ wr
        wr -= href[j] * Vf[j, :n]
    nref = np.linalg.norm(wr)
    np.testing.assert_allclose(h, href, rtol=1e-4, atol=1e-4)
    assert abs(nrm - nref) <= 1e-4 * nref
    assert abs(np.linalg.norm(y[:n]) - 1.0) < 1e-5


def test_gmres_ir_bf16_panel_converges():
    """GMRES-IR (panel_dtype=bfloat16, XLA path): the bf16 basis limits only
    per-cycle progress; restarts from the true f32 residual still reach an
    f32-level tolerance, and `converged` reflects the TRUE residual."""
    import iterativesolvers_tpu as its

    n = 600
    rng = np.random.default_rng(11)
    A = np.eye(n, dtype=np.float32) * 4.0
    A -= np.diag(np.ones(n - 1, np.float32), 1)
    A -= np.diag(np.ones(n - 1, np.float32), -1)
    b = rng.standard_normal(n).astype(np.float32)
    x, hist = its.gmres(jnp.asarray(A), jnp.asarray(b), restart=10,
                        reltol=1e-5, maxiter=300,
                        panel_dtype=jnp.bfloat16, log=True)
    r = float(np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b))
    assert hist.isconverged
    assert r <= 2e-5  # true residual matches the claimed convergence

    # f32 panel on the same problem: same answer, possibly fewer restarts
    xf = its.gmres(jnp.asarray(A), jnp.asarray(b), restart=10,
                   reltol=1e-5, maxiter=300)
    rf = float(np.linalg.norm(A @ np.asarray(xf) - b) / np.linalg.norm(b))
    assert rf <= 2e-5


def test_gmres_panel_dtype_validation():
    import iterativesolvers_tpu as its

    A = np.eye(8, dtype=np.float64)
    b = np.ones(8, np.float64)
    with pytest.raises(ValueError):
        its.gmres(jnp.asarray(A), jnp.asarray(b), panel_dtype=jnp.bfloat16)


def test_gmres_panel_mgs_integration(monkeypatch):
    """GMRES with the 3-D (m+1, rows, 512) Pallas panel layout (interpreted)
    matches the XLA row-MGS path end-to-end."""
    import iterativesolvers_tpu as its
    import iterativesolvers_tpu.ops.pallas_mgs as pm
    import iterativesolvers_tpu.solvers.gmres as g

    n = 4 * 262144
    # 1-D Laplacian + shift: well-conditioned, converges in a few iters
    main = np.full(n, 4.0, np.float32)
    up = np.full(n, -1.0, np.float32); up[-1] = 0.0
    lo = np.full(n, -1.0, np.float32); lo[0] = 0.0
    A = its.DIAMatrix((main, up, lo), (0, 1, -1), (n, n))
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    monkeypatch.setattr(pm, "_INTERPRET", True)
    monkeypatch.setattr(g, "_use_panel_mgs", lambda *a: True)
    x = its.gmres(A, b, restart=4, maxiter=8, reltol=1e-6)
    r = float(jnp.linalg.norm(b - A.mv(x)) / jnp.linalg.norm(b))
    # 8 iterations of GMRES(4) on this operator: a panel-layout or padding
    # bug would stall at O(1); the healthy rate lands ~1e-4.
    assert r < 2e-4


# ---------------- fused Arnoldi kernel (ops/pallas_arnoldi.py) -------------


def _fused_ref(St, V, k, n):
    """NumPy reference: w = A V[k]; MGS against rows 0..k; normalize."""
    Vf = np.asarray(V, np.float64).reshape(V.shape[0], -1)
    v = Vf[k, :n].astype(np.float32)  # stored precision
    w = np.asarray(St.mv(jnp.asarray(v)), np.float64)
    m1 = V.shape[0]
    h = np.zeros(m1)
    for j in range(k + 1):
        h[j] = Vf[j, :n] @ w
        w -= h[j] * Vf[j, :n]
    nrm = np.linalg.norm(w)
    return w / nrm, h, nrm


def _make_fused_problem(side=1024, m1=5, k=2, seed=7):
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.ops.pallas_arnoldi import fused_arnoldi_plan
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad

    St = its.laplacian(side, 2, dtype=np.float32)  # n = 1,048,576
    n = St.n
    plan = fused_arnoldi_plan(n, St.terms, jnp.float32)
    assert plan is not None
    n_pad = mgs_pad(n)
    r = np.random.default_rng(seed)
    V = np.zeros((m1, n_pad), np.float32)
    Q, _ = np.linalg.qr(r.standard_normal((n, k + 1)).astype(np.float32))
    V[: k + 1, :n] = Q.T
    return St, plan, V, n, n_pad


def test_fused_arnoldi_matches_reference():
    from iterativesolvers_tpu.ops.pallas_arnoldi import fused_arnoldi

    m1, k = 5, 2
    St, plan, V, n, n_pad = _make_fused_problem(m1=m1, k=k)
    Vj = jnp.asarray(V.reshape(m1, n_pad // 512, 512))
    Vp, h, nrm = fused_arnoldi(plan, Vj, jnp.int32(k), jnp.int32(1),
                               St.center,
                               [St.coeffs[i] for i in plan.inner_idx],
                               [St.coeffs[i] for i in plan.outer_idx],
                               m1, interpret=True)
    w_ref, h_ref, nrm_ref = _fused_ref(St, V.reshape(m1, -1), k, n)
    h, nrm = np.asarray(h), float(nrm)
    scale = max(1.0, float(np.abs(h_ref).max()))
    np.testing.assert_allclose(h, h_ref, rtol=3e-4, atol=3e-4 * scale)
    assert abs(nrm - nrm_ref) <= 3e-4 * nrm_ref
    Vp = np.asarray(Vp).reshape(m1, n_pad)
    # rows 0..k untouched
    np.testing.assert_array_equal(Vp[: k + 1], V[: k + 1])
    # row k+1 = normalized w, pad region zero
    np.testing.assert_allclose(Vp[k + 1, :n], w_ref, rtol=2e-3, atol=2e-4)
    assert np.abs(Vp[k + 1, n:]).max(initial=0.0) == 0.0
    # rows beyond k+1 untouched (zero)
    assert np.abs(Vp[k + 2:]).max(initial=0.0) == 0.0


def test_fused_arnoldi_masked_step_writes_zeros():
    from iterativesolvers_tpu.ops.pallas_arnoldi import fused_arnoldi

    m1, k = 4, 1
    St, plan, V, n, n_pad = _make_fused_problem(m1=m1, k=k, seed=9)
    Vj = jnp.asarray(V.reshape(m1, n_pad // 512, 512))
    Vp, h, nrm = fused_arnoldi(plan, Vj, jnp.int32(k), jnp.int32(0),
                               St.center,
                               [St.coeffs[i] for i in plan.inner_idx],
                               [St.coeffs[i] for i in plan.outer_idx],
                               m1, interpret=True)
    Vp = np.asarray(Vp).reshape(m1, n_pad)
    np.testing.assert_array_equal(Vp[: k + 1], V[: k + 1])
    assert np.abs(Vp[k + 1:]).max(initial=0.0) == 0.0


def test_gmres_fused_arnoldi_integration(monkeypatch):
    """GMRES routed through the fused Arnoldi kernel (interpreted) matches
    the plain XLA path end-to-end on a stencil operator."""
    from functools import partial

    import iterativesolvers_tpu as its
    import iterativesolvers_tpu.ops.pallas_arnoldi as pa
    import iterativesolvers_tpu.solvers.gmres as g

    St = its.laplacian(1024, 2, dtype=np.float32)
    # shifted so GMRES(4) converges quickly (pure Laplacian stalls restarted
    # GMRES; this test checks the kernel plumbing, not the algorithm)
    St = type(St)(St.n, 5.0, St.terms, St.coeffs)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(St.n).astype(np.float32))

    x_ref = its.gmres(St, b, restart=4, maxiter=8, reltol=1e-6)  # XLA path
    monkeypatch.setattr(pa, "_INTERPRET", True)
    monkeypatch.setattr(g, "_fused_setup", partial(g._fused_setup, force=True))
    x = its.gmres(St, b, restart=4, maxiter=8, reltol=1e-6)
    # both paths execute the same algebra: iterates agree to f32 roundoff
    # (measured: residual histories match to 6 digits)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    r = float(jnp.linalg.norm(b - St.mv(x)) / jnp.linalg.norm(b))
    r_ref = float(jnp.linalg.norm(b - St.mv(x_ref)) / jnp.linalg.norm(b))
    assert r <= 1.05 * r_ref + 1e-6


# ---------------- panel-native stencil SpMV (stencil_panel_mv) -------------


@pytest.mark.parametrize("panel_dtype", [np.float32, "bfloat16"],
                         ids=["f32", "bf16"])
def test_stencil_panel_mv_matches_operator(panel_dtype):
    """w = A V[k] straight from the (rows, 512) panel, both panel dtypes;
    pad region zero, f32 output."""
    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.ops.pallas_arnoldi import (
        fused_arnoldi_plan, stencil_panel_mv,
    )
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad

    pd = jnp.bfloat16 if panel_dtype == "bfloat16" else jnp.float32
    St = its.laplacian(1024, 2, dtype=np.float32)  # n = 1,048,576
    n = St.n
    plan = fused_arnoldi_plan(n, St.terms, jnp.float32, pd)
    assert plan is not None
    n_pad = mgs_pad(n)
    m1, k = 4, 2
    r = np.random.default_rng(3)
    V = np.zeros((m1, n_pad), np.float32)
    V[: k + 1, :n] = r.standard_normal((k + 1, n)).astype(np.float32)
    Vj = jnp.asarray(V.reshape(m1, n_pad // 512, 512)).astype(pd)
    w2d = stencil_panel_mv(
        plan, Vj, jnp.int32(k), St.center,
        [St.coeffs[i] for i in plan.inner_idx],
        [St.coeffs[i] for i in plan.outer_idx],
        m1, interpret=True)
    assert w2d.dtype == jnp.float32
    w = np.asarray(w2d).reshape(-1)
    vk = np.asarray(Vj[k]).reshape(-1)[:n].astype(np.float32)
    w_ref = np.asarray(St.mv(jnp.asarray(vk)))
    np.testing.assert_allclose(w[:n], w_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(w_ref).max())
    assert np.abs(w[n:]).max(initial=0.0) == 0.0


def test_gmres_panel_mv_integration(monkeypatch):
    """bf16-panel GMRES routed through stencil_panel_mv + padded-w
    panel_mgs (interpreted) matches the plain XLA bf16-panel path."""
    from functools import partial

    import iterativesolvers_tpu as its
    import iterativesolvers_tpu.ops.pallas_arnoldi as pa
    import iterativesolvers_tpu.ops.pallas_mgs as pm
    import iterativesolvers_tpu.solvers.gmres as g
    from iterativesolvers_tpu.ops.pallas_mgs import panel_mgs_plan

    St = its.laplacian(1024, 2, dtype=np.float32)
    St = type(St)(St.n, 5.0, St.terms, St.coeffs)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(St.n).astype(np.float32))

    x_ref = its.gmres(St, b, restart=4, maxiter=8, reltol=1e-6,
                      panel_dtype=jnp.bfloat16)  # XLA path
    monkeypatch.setattr(pa, "_INTERPRET", True)
    monkeypatch.setattr(pm, "_INTERPRET", True)
    monkeypatch.setattr(g, "_fused_setup", lambda *a, **k: None)
    monkeypatch.setattr(g, "_stencil_panel_setup",
                        partial(g._stencil_panel_setup, force=True))
    monkeypatch.setattr(
        g, "_use_panel_mgs",
        lambda n, dtype, om, pd=None: (
            om == "mgs" and panel_mgs_plan(n, dtype, pd) is not None))
    x = its.gmres(St, b, restart=4, maxiter=8, reltol=1e-6,
                  panel_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-3, atol=1e-4)
    r = float(jnp.linalg.norm(b - St.mv(x)) / jnp.linalg.norm(b))
    r_ref = float(jnp.linalg.norm(b - St.mv(x_ref)) / jnp.linalg.norm(b))
    assert r <= 1.1 * r_ref + 1e-6


def test_panel_mgs_modes_agree():
    """The single-pass rowbuf sweep (round 5: half the panel HBM traffic)
    and the two-pass chunk sweep produce identical results."""
    import iterativesolvers_tpu.ops.pallas_mgs as pm
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad, panel_mgs

    n, m1, k = 4 * 262144 + 3000, 6, 3
    n_pad = mgs_pad(n)
    r = np.random.default_rng(7)
    V = np.zeros((m1, n_pad), np.float32)
    Q, _ = np.linalg.qr(r.standard_normal((n, k + 1)).astype(np.float32))
    V[: k + 1, :n] = Q.T
    w = r.standard_normal(n).astype(np.float32)
    outs = {}
    for mode in ("rowbuf", "chunk"):
        old = pm._FORCE_MODE
        pm._FORCE_MODE = mode
        try:
            assert pm.panel_mgs_plan(n, jnp.float32)["mode"] == mode
            y, h, nrm = panel_mgs(jnp.asarray(V.reshape(-1)),
                                  jnp.asarray(w), jnp.int32(k), m1,
                                  interpret=True)
        finally:
            pm._FORCE_MODE = old
        outs[mode] = (np.asarray(y).reshape(-1), np.asarray(h), float(nrm))
    np.testing.assert_array_equal(outs["rowbuf"][0], outs["chunk"][0])
    np.testing.assert_array_equal(outs["rowbuf"][1], outs["chunk"][1])
    assert outs["rowbuf"][2] == outs["chunk"][2]


def test_fused_arnoldi_mgs_modes_agree():
    """Fused kernel: the single-pass rowbuf sweep equals the two-pass
    chunk sweep bit-for-bit."""
    import iterativesolvers_tpu.ops.pallas_arnoldi as pa
    from iterativesolvers_tpu.ops.pallas_arnoldi import (
        fused_arnoldi, fused_arnoldi_plan,
    )

    m1, k = 5, 2
    outs = {}
    for mode in ("rowbuf", "chunk"):
        old = pa._FORCE_MGS_MODE
        pa._FORCE_MGS_MODE = mode
        try:
            St, plan, V, n, n_pad = _make_fused_problem(m1=m1, k=k)
            assert plan.mgs_mode == mode
            Vj = jnp.asarray(V.reshape(m1, n_pad // 512, 512))
            Vp, h, nrm = fused_arnoldi(
                plan, Vj, jnp.int32(k), jnp.int32(1), St.center,
                [St.coeffs[i] for i in plan.inner_idx],
                [St.coeffs[i] for i in plan.outer_idx],
                m1, interpret=True)
        finally:
            pa._FORCE_MGS_MODE = old
        outs[mode] = (np.asarray(Vp), np.asarray(h), float(nrm))
    np.testing.assert_array_equal(outs["rowbuf"][0], outs["chunk"][0])
    np.testing.assert_array_equal(outs["rowbuf"][1], outs["chunk"][1])
    assert outs["rowbuf"][2] == outs["chunk"][2]


def test_fused_arnoldi_bf16_panel():
    """Fused kernel on a bfloat16-stored panel (the GMRES-IR headline
    path, enabled by the r5 rowbuf sweep): f32 arithmetic against the
    bf16 rows, matches the two-kernel pipeline (stencil_panel_mv +
    panel_mgs) on identical inputs."""
    from iterativesolvers_tpu.ops.pallas_arnoldi import (
        fused_arnoldi, fused_arnoldi_plan, stencil_panel_mv,
    )
    from iterativesolvers_tpu.ops.pallas_mgs import mgs_pad, panel_mgs

    import iterativesolvers_tpu as its

    side, m1, k = 1024, 5, 2
    St = its.laplacian(side, 2, dtype=np.float32)
    n = St.n
    plan = fused_arnoldi_plan(n, St.terms, jnp.float32, jnp.bfloat16)
    assert plan is not None and plan.mgs_mode == "rowbuf"
    n_pad = mgs_pad(n)
    r = np.random.default_rng(11)
    V = np.zeros((m1, n_pad), np.float32)
    Q, _ = np.linalg.qr(r.standard_normal((n, k + 1)).astype(np.float32))
    V[: k + 1, :n] = Q.T
    Vb = jnp.asarray(V.reshape(m1, n_pad // 512, 512)).astype(jnp.bfloat16)
    ic = [St.coeffs[i] for i in plan.inner_idx]
    oc = [St.coeffs[i] for i in plan.outer_idx]
    Vp, h, nrm = fused_arnoldi(plan, Vb, jnp.int32(k), jnp.int32(1),
                               St.center, ic, oc, m1, interpret=True)
    # two-kernel reference on the same bf16 panel
    w2d = stencil_panel_mv(plan, Vb, jnp.int32(k), St.center, ic, oc, m1,
                           interpret=True)
    y_ref, h_ref, nrm_ref = panel_mgs(Vb, w2d, jnp.int32(k), m1, n=n,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-6, atol=1e-6)
    assert abs(float(nrm) - float(nrm_ref)) <= 1e-6 * float(nrm_ref)
    row = np.asarray(Vp)[k + 1].reshape(-1)
    ref_row = np.asarray(y_ref.astype(jnp.bfloat16)).reshape(-1)
    np.testing.assert_array_equal(row, ref_row)
    # rows 0..k untouched, rows beyond k+1 zero
    np.testing.assert_array_equal(np.asarray(Vp)[: k + 1],
                                  np.asarray(Vb)[: k + 1])
    assert np.abs(np.asarray(Vp)[k + 2:].astype(np.float32)).max(
        initial=0.0) == 0.0
