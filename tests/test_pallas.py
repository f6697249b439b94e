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
