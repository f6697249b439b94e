"""Benchmark / test problem generators.

Re-implementations (not translations) of the reference's fixtures:
  * ``laplace_dia``        ~ test/laplace_matrix.jl:1-13 — dims-D Laplacian as a
    Kronecker sum of the 1-D [-1, 2, -1] stencil.  Built directly in DIA form:
    offsets {0, ±n^k} with boundary masking — the TPU-native stencil layout.
  * ``advection_diffusion`` ~ benchmark/advection_diffusion.jl:3-31 — 3-D
    Δu + β·u_x with 2nd-order central differences, Dirichlet boundaries.
  * ``random_sparse``       ~ Julia ``sprand`` as used by the GMRES/stationary
    benchmarks (benchmark/benchmark-linear-systems.jl:47-101).
"""

from __future__ import annotations

import numpy as np

from ..operators.sparse import CSRMatrix, DIAMatrix

__all__ = [
    "laplace_dia",
    "laplace_matrix_coo",
    "advection_diffusion",
    "random_sparse",
    "sym_tridiagonal_dia",
    "variable_diffusion",
]


def laplace_dia(n: int, dims: int, dtype=np.float64) -> DIAMatrix:
    """dims-D Laplacian on an n^dims grid (Kronecker-sum of [-1, 2, -1]).

    Index convention matches the reference's column-major kron order: axis 0
    (x) is the fastest-varying index, so offset n^0 couples along x, n^1 along
    y, etc.
    """
    N = n**dims
    offs = [0] + [n**k for k in range(dims)] + [-(n**k) for k in range(dims)]
    offsets = tuple(sorted(set(offs)))
    data = np.zeros((len(offsets), N), dtype=dtype)
    i = np.arange(N)
    for idx, off in enumerate(offsets):
        if off == 0:
            data[idx] = 2 * dims
        else:
            stride = abs(off)
            pos = (i // stride) % n
            if off > 0:
                mask = pos < n - 1
            else:
                mask = pos > 0
            data[idx] = np.where(mask, -np.ones(N, dtype=dtype), 0)
    return DIAMatrix(data, offsets, (N, N))


def laplace_matrix_coo(n: int, dims: int, dtype=np.float64):
    """The same dims-D Laplacian as :func:`laplace_dia` in COO triplet form —
    for exercising IO (MatrixMarket) and host-side format-conversion paths.
    Returns ``(rows, cols, vals, N)`` with 0-based (row, col)-sorted indices."""
    csr = laplace_dia(n, dims, dtype=dtype).to_csr()
    return (
        np.asarray(csr.row_ids),
        np.asarray(csr.indices),
        np.asarray(csr.data),
        csr.shape[0],
    )


def sym_tridiagonal_dia(diag_val, off_val, n: int, dtype=np.float64) -> DIAMatrix:
    """SymTridiagonal(diag_val, off_val) — the CG/MINRES benchmark matrices
    (benchmark/benchmark-linear-systems.jl:24-45,82-88)."""
    data = np.zeros((3, n), dtype=dtype)
    data[0, 1:] = off_val      # offset -1: rows 1..n-1
    data[1, :] = diag_val      # offset 0
    data[2, : n - 1] = off_val  # offset +1: rows 0..n-2
    return DIAMatrix(data, (-1, 0, 1), (n, n))


def advection_diffusion(N: int = 50, beta: float = 1000.0, dtype=np.float64):
    """3-D advection-dominated problem Δu + β·u_x = f on (0,1)^3, N^3 interior
    points, central differences.  Returns (A: DIAMatrix, b: ndarray)."""
    n = N**3
    h = 1.0 / (N + 1)
    lap = laplace_dia(N, 3, dtype=dtype)
    # A = lap / (-h^2) + ∂x  with ∂x = ±β/(2h) at offsets ±1 along x (fastest).
    data = np.asarray(lap.data) / (-h * h)
    offsets = lap.offsets
    i = np.arange(n)
    posx = i % N
    scale = beta / (2 * h)
    for idx, off in enumerate(offsets):
        if off == 1:
            data[idx] = data[idx] + np.where(posx < N - 1, scale, 0.0)
        elif off == -1:
            data[idx] = data[idx] + np.where(posx > 0, -scale, 0.0)
    A = DIAMatrix(data, offsets, (n, n))
    xs = np.linspace(0.0, 1.0, N + 2)[1 : N + 1]
    # x fastest, then y, then z (reference column-major comprehension order)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    F = np.exp(X * Y * Z) * np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
    b = F.reshape(n, order="F").astype(dtype)
    return A, b


def random_sparse(
    n: int,
    m: int,
    density: float,
    seed: int = 0,
    dtype=np.float64,
    symmetrize: bool = False,
    shift: float = 0.0,
) -> CSRMatrix:
    """~ ``sprand(n, m, density)``; with ``symmetrize`` returns
    (A + A')/2-style structure plus ``shift * I`` (GMRES benchmark,
    benchmark/benchmark-linear-systems.jl:47-68)."""
    rng = np.random.default_rng(seed)
    nnz = max(1, int(density * n * m))
    rows = rng.integers(0, n, size=nnz)
    cols = rng.integers(0, m, size=nnz)
    vals = rng.random(nnz).astype(dtype)
    if symmetrize:
        rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
        vals = np.concatenate([vals, vals]) / 2
    if shift:
        d = np.arange(min(n, m))
        rows = np.concatenate([rows, d])
        cols = np.concatenate([cols, d])
        vals = np.concatenate([vals, np.full(d.size, shift, dtype=dtype)])
    return CSRMatrix.from_coo(rows, cols, vals, (n, m))


def variable_diffusion(n: int, dims: int = 3, contrast: float = 1e4,
                       aniso=None, smooth: int = 0, seed: int = 0,
                       dtype=np.float64) -> DIAMatrix:
    """dims-D FD discretization of ``-div(kappa(x) grad u)`` on an n^dims
    grid with a log-uniform random cell coefficient field — the
    hard-spectrum fixture family preconditioners exist for (the reference's
    preconditioning contract, docs/src/preconditioning.md:5-10; the
    constant-coefficient fixtures above structurally cannot reward them,
    BENCH_NOTES r4 "RB-IC economics").

    * ``contrast``: kappa ranges over [1, contrast) (log-uniform).  The
      unpreconditioned CG iteration count scales with sqrt of the effective
      kappa contrast across neighboring cells.
    * ``aniso``: per-axis scaling of the face transmissibilities, e.g.
      ``(1, 1, 100)`` for a strongly coupled z-axis.
    * ``smooth``: rounds of separable 3-point box smoothing of the
      log-coefficient field (0 = fully rough, i.i.d. per cell; a few rounds
      give the correlated "channelized" fields where IC-class
      preconditioners shine).

    Face coefficients are harmonic means of the adjacent cells (the
    standard conservative FD scheme), so the matrix is SPD with the same
    unit-step DIA structure as :func:`laplace_dia` (axis 0 = offset 1
    fastest-varying).
    """
    N = n**dims
    if aniso is None:
        aniso = (1.0,) * dims
    if len(aniso) != dims:
        raise ValueError(f"aniso needs {dims} entries, got {len(aniso)}")
    rng = np.random.default_rng(seed)
    # numpy shape (n,..,n) with C-order ravel => LAST axis fastest; grid
    # axis k (DIA stride n^k) is numpy axis dims-1-k
    lk = rng.random((n,) * dims)
    for _ in range(smooth):
        for ax in range(dims):
            lk = (np.roll(lk, 1, axis=ax) + lk + np.roll(lk, -1, axis=ax)) / 3
    kappa = np.exp(np.log(contrast) * lk).astype(np.float64)

    offsets = sorted({n**k for k in range(dims)} | {-(n**k) for k in range(dims)} | {0})
    data = {o: np.zeros(N, np.float64) for o in offsets}
    for k in range(dims):
        ax = dims - 1 - k
        s = n**k
        kl = kappa
        kr = np.roll(kappa, -1, axis=ax)  # neighbor at +1 along grid axis k
        t = 2.0 * kl * kr / (kl + kr) * float(aniso[k])
        # zero the face past the boundary (pos == n-1 along this axis)
        hi = [slice(None)] * dims
        hi[ax] = n - 1
        lo = [slice(None)] * dims
        lo[ax] = 0
        t[tuple(hi)] = 0.0
        tf = t.ravel()
        data[s] -= tf                      # A[i, i+s]
        data[-s] -= np.roll(tf, s)         # A[i, i-s] = A[i-s, i] (0-pad ok:
        # rolled-in entries land at pos==0 rows whose -s column is off-grid
        # and tf there is the zeroed boundary face)
        # diagonal: interior faces on both sides plus the DIRICHLET boundary
        # faces (ghost cell at the wall, same kappa) — without these the row
        # sums are zero and the operator is the singular Neumann one
        bnd = np.zeros_like(t)
        bnd[tuple(hi)] += kappa[tuple(hi)] * float(aniso[k])
        bnd[tuple(lo)] += kappa[tuple(lo)] * float(aniso[k])
        data[0] += tf + np.roll(tf, s) + bnd.ravel()
    arr = np.stack([data[o] for o in offsets]).astype(dtype)
    return DIAMatrix(arr, tuple(offsets), (N, N))
