"""Generate the vendored MatrixMarket workload matrices.

The reference benchmarks run on downloaded NIST/SuiteSparse matrices
(benchmark/matrixmarket.jl:1-32 — cylshell s3dkq4m2, UF ACUSIM
Pres_Poisson; benchmark/benchmark-svd-florida.jl — the Florida
collection).  This build environment has zero network egress, so those
exact files cannot be fetched; the matrices here are **generated,
physically-meaningful stand-ins of the same problem classes**, written as
real .mtx files and loaded through the full MatrixMarket path (native
parser, symmetry expansion) so the I/O + solver pipeline matches the
reference workloads end to end:

  fem_poisson.mtx     SPD P1 finite-element stiffness of -div(grad u) on an
                      unstructured Delaunay triangulation of the unit square
                      (+ mass regularization): the Pres_Poisson class
                      (irregular SPD FEM pressure-Poisson).  Stored
                      symmetric (lower triangle), exercising expansion.
  mesh_gradient_ls.mtx  Rectangular weighted edge-node incidence (discrete
                      gradient) of the same mesh: an overdetermined,
                      rank-(n-1)-per-component least-squares problem — the
                      well1850/illc1850 class used by test/lsqr.jl-style
                      workloads and svdl.
  elasticity_2d.mtx   2-D linear elasticity (plane stress, 2 dof/node) on a
                      structured quad mesh: SPD with natural 2x2 block
                      structure — the cylshell (shell/elasticity) class at
                      committable size, and the BSR showcase.

Deterministic (fixed seeds).  Run:  python benchmarks/matrices/generate.py
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write_mtx(path, rows, cols, vals, shape, symmetric=False, comment=""):
    """Write a COO matrix as MatrixMarket coordinate real (1-based)."""
    with open(path, "w") as f:
        sym = "symmetric" if symmetric else "general"
        f.write(f"%%MatrixMarket matrix coordinate real {sym}\n")
        for line in comment.strip().splitlines():
            f.write(f"% {line}\n")
        f.write(f"{shape[0]} {shape[1]} {len(vals)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r + 1} {c + 1} {v:.10e}\n")


def fem_poisson(n_points=8000, seed=2026):
    """P1 stiffness + eps*mass on a Delaunay triangulation (SPD)."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((n_points, 2))
    tri = Delaunay(pts)
    simplices = tri.simplices  # (ntri, 3)

    rows, cols, vals = [], [], []
    p = pts[simplices]  # (ntri, 3, 2)
    # element stiffness for P1: K_ij = (grad phi_i . grad phi_j) * area
    b = p[:, [1, 2, 0], :] - p[:, [2, 0, 1], :]   # opposite-edge vectors
    # grad phi_i = rot90(edge_i) / (2 * area)
    cross = (b[:, 0, 0] * b[:, 1, 1] - b[:, 0, 1] * b[:, 1, 0])
    area = np.abs(cross) / 2.0
    good = area > 1e-12
    simplices, b, area = simplices[good], b[good], area[good]
    grads = np.stack([-b[:, :, 1], b[:, :, 0]], axis=-1)  # (ntri, 3, 2)
    grads = grads / (2.0 * area)[:, None, None]
    Ke = np.einsum("tic,tjc,t->tij", grads, grads, area)  # (ntri, 3, 3)
    for i in range(3):
        for j in range(3):
            rows.append(simplices[:, i])
            cols.append(simplices[:, j])
            vals.append(Ke[:, i, j])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    # assemble (dedup) + small mass-lumped shift to make it definite
    n = n_points
    from iterativesolvers_tpu.operators.sparse import CSRMatrix

    A = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    indptr = A._host("indptr")
    idx = A._host("indices")
    dat = A._host("data").copy()
    diag_shift = 1e-3
    for r in range(n):
        seg = slice(indptr[r], indptr[r + 1])
        hit = np.where(idx[seg] == r)[0]
        dat[indptr[r] + hit[0]] += diag_shift
    # store lower triangle only (symmetric format)
    rr = np.repeat(np.arange(n), np.diff(indptr))
    keep = idx <= rr
    return rr[keep], idx[keep].astype(np.int64), dat[keep], (n, n), simplices, pts


def mesh_gradient(simplices, pts, seed=2027):
    """Weighted unique-edge incidence matrix (m_edges x n_nodes)."""
    rng = np.random.default_rng(seed)
    e = np.concatenate([simplices[:, [0, 1]], simplices[:, [1, 2]],
                        simplices[:, [2, 0]]])
    e.sort(axis=1)
    e = np.unique(e, axis=0)
    m = e.shape[0]
    w = 0.5 + rng.random(m)  # edge weights (conductances)
    rows = np.concatenate([np.arange(m), np.arange(m)])
    cols = np.concatenate([e[:, 0], e[:, 1]])
    vals = np.concatenate([w, -w])
    return rows, cols, vals, (m, pts.shape[0])


def elasticity_2d(nx=40, ny=40, seed=2028):
    """Plane-stress Q4 elasticity on an nx x ny quad grid (2 dof/node, SPD
    after pinning the left edge).  Natural 2x2 block structure."""
    E, nu = 1.0, 0.3
    # Q4 element stiffness via 2x2 Gauss quadrature
    C = E / (1 - nu**2) * np.array(
        [[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]]
    )
    gp = [(-1 / np.sqrt(3), -1 / np.sqrt(3)), (1 / np.sqrt(3), -1 / np.sqrt(3)),
          (1 / np.sqrt(3), 1 / np.sqrt(3)), (-1 / np.sqrt(3), 1 / np.sqrt(3))]
    Ke = np.zeros((8, 8))
    for xi, eta in gp:
        dN = 0.25 * np.array([
            [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)],
            [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)],
        ])  # (2, 4) — unit square element, J = I/ (2/ nx)... use unit h
        B = np.zeros((3, 8))
        B[0, 0::2] = dN[0]
        B[1, 1::2] = dN[1]
        B[2, 0::2] = dN[1]
        B[2, 1::2] = dN[0]
        Ke += B.T @ C @ B
    nnode = (nx + 1) * (ny + 1)
    node = lambda i, j: i * (ny + 1) + j
    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            nd = [node(i, j), node(i + 1, j), node(i + 1, j + 1), node(i, j + 1)]
            dofs = np.array([[2 * q, 2 * q + 1] for q in nd]).ravel()
            for a in range(8):
                for bb in range(8):
                    rows.append(dofs[a])
                    cols.append(dofs[bb])
                    vals.append(Ke[a, bb])
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    n = 2 * nnode
    # pin left-edge dofs by a large diagonal penalty (keeps shape/blocks)
    from iterativesolvers_tpu.operators.sparse import CSRMatrix

    A = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    indptr = A._host("indptr")
    idx = A._host("indices")
    dat = A._host("data").copy()
    pinned = set()
    for j in range(ny + 1):
        pinned.add(2 * node(0, j))
        pinned.add(2 * node(0, j) + 1)
    for r in range(n):
        seg = slice(indptr[r], indptr[r + 1])
        hit = np.where(idx[seg] == r)[0]
        dat[indptr[r] + hit[0]] += 1e3 if r in pinned else 1e-6
    rr = np.repeat(np.arange(n), np.diff(indptr))
    keep = idx <= rr
    return rr[keep], idx[keep].astype(np.int64), dat[keep], (n, n)


def fd_band9(n=8192, seed=2029):
    """4th-order 1-D FD diffusion + drift: 9 diagonals, banded — the DIA
    showcase (skew-free, bandwidth 4).  Symmetric part dominates; stored
    lower triangle of the symmetrized operator."""
    rng = np.random.default_rng(seed)
    offs = [0, 1, 2, 3, 4]
    base = {0: 2.8472222, 1: -1.6, 2: 0.2, 3: -0.02539683, 4: 0.00178571}
    rows, cols, vals = [], [], []
    jitter = 0.02 * rng.standard_normal(n)
    for off in offs:
        i = np.arange(off, n)
        rows.append(i)
        cols.append(i - off)
        v = np.full(i.size, base[off])
        if off == 0:
            v = v + np.abs(jitter)
        vals.append(v)
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals), (n, n))


def powerlaw_graph(n=6000, m_edges=24000, seed=2030):
    """Preferential-attachment graph Laplacian: power-law degree skew (hub
    rows hundreds wide, median ~4) — the HYB showcase; the reference's
    Florida web/social-class matrices have exactly this profile."""
    rng = np.random.default_rng(seed)
    # preferential attachment: endpoint sampled from the current edge list
    src = np.empty(m_edges, np.int64)
    dst = np.empty(m_edges, np.int64)
    src[0], dst[0] = 0, 1
    pool = [0, 1]
    for k in range(1, m_edges):
        a = int(rng.integers(0, min(n, 2 + k)))
        b = pool[int(rng.integers(0, len(pool)))]
        if a == b:
            b = (b + 1) % n
        src[k], dst[k] = a, b
        pool.append(a)
        pool.append(b)
    e = np.stack([np.minimum(src, dst), np.maximum(src, dst)], axis=1)
    e = np.unique(e, axis=0)
    # graph Laplacian + shift (SPD)
    deg = np.bincount(np.concatenate([e[:, 0], e[:, 1]]), minlength=n)
    rows = np.concatenate([e[:, 1], np.arange(n)])   # lower triangle
    cols = np.concatenate([e[:, 0], np.arange(n)])
    vals = np.concatenate([-np.ones(e.shape[0]), deg + 0.5])
    return rows, cols, vals, (n, n)


def uniform_scatter(n=4096, deg=9, seed=2031):
    """Exactly-uniform row degree, random columns: no banded structure
    (ndiag ~ n) and zero tail — the ELL showcase (circuit/device-matrix
    class: constant valence, unstructured connectivity)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), deg)
    cols = np.empty((n, deg), np.int64)
    for r in range(n):
        picks = rng.choice(n - 1, size=deg - 1, replace=False)
        picks = picks + (picks >= r)  # off-diagonals != r
        cols[r, : deg - 1] = picks
        cols[r, deg - 1] = r
    vals = rng.standard_normal(n * deg) * 0.1
    # diagonal dominance for solver tests
    vals = vals.reshape(n, deg)
    vals[:, deg - 1] = deg + 1.0
    return rows, cols.ravel(), vals.ravel(), (n, n)


def main():
    os.makedirs(HERE, exist_ok=True)
    note = ("generated stand-in (zero-egress build environment): "
            "class-matched to the reference benchmark workloads, "
            "see generate.py for provenance")

    r, c, v, shape, simplices, pts = fem_poisson()
    write_mtx(os.path.join(HERE, "fem_poisson.mtx"), r, c, v, shape,
              symmetric=True,
              comment=f"SPD P1 FEM Poisson (Pres_Poisson class)\n{note}")
    print("fem_poisson.mtx", shape, len(v), "stored entries")

    r, c, v, shape2 = mesh_gradient(simplices, pts)
    write_mtx(os.path.join(HERE, "mesh_gradient_ls.mtx"), r, c, v, shape2,
              comment=f"weighted mesh gradient, rectangular LS "
                      f"(well1850/illc1850 class)\n{note}")
    print("mesh_gradient_ls.mtx", shape2, len(v), "stored entries")

    r, c, v, shape3 = elasticity_2d()
    write_mtx(os.path.join(HERE, "elasticity_2d.mtx"), r, c, v, shape3,
              symmetric=True,
              comment=f"2-D plane-stress elasticity, 2 dof/node "
                      f"(cylshell class, BSR block structure)\n{note}")
    print("elasticity_2d.mtx", shape3, len(v), "stored entries")

    r, c, v, shape4 = fd_band9()
    write_mtx(os.path.join(HERE, "fd_band9.mtx"), r, c, v, shape4,
              symmetric=True,
              comment=f"4th-order 1-D FD band (9 diagonals): DIA class\n{note}")
    print("fd_band9.mtx", shape4, len(v), "stored entries")

    r, c, v, shape5 = powerlaw_graph()
    write_mtx(os.path.join(HERE, "powerlaw_graph.mtx"), r, c, v, shape5,
              symmetric=True,
              comment=f"preferential-attachment graph Laplacian, power-law "
                      f"degree skew: HYB class\n{note}")
    print("powerlaw_graph.mtx", shape5, len(v), "stored entries")

    r, c, v, shape6 = uniform_scatter()
    write_mtx(os.path.join(HERE, "uniform_scatter.mtx"), r, c, v, shape6,
              comment=f"uniform-degree unstructured scatter: ELL class\n{note}")
    print("uniform_scatter.mtx", shape6, len(v), "stored entries")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
    # host-side generation only — never attach the TPU backend
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
