"""Pallas DIA SpMV kernel tests (interpret mode on CPU).

The compiled path is exercised on real TPU by ``benchmarks/tpu_spmv_bench.py``
(results in BENCH_NOTES.md) and by ``bench.py`` when the Pallas path wins the
operator dispatch."""

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
