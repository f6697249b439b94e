"""A/B the Hessenberg least-squares implementations on real TPU.

VERDICT r4 item 7: the Givens-scan ``hessenberg_lstsq`` loses to
``jnp.linalg.lstsq`` at every m in 10..100 — pick the dense formulation
that wins and make the library entry point dispatch to it.
Candidates: current Givens scan, jnp.linalg.lstsq (SVD), Householder QR +
triangular solve, normal equations (Cholesky).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import iterativesolvers_tpu as its
from iterativesolvers_tpu.ops.hessenberg import back_substitute

K = 200


def loop_time(solver, Hj, rj, seed):
    @jax.jit
    def loop(H, rhs):
        def body(i, acc):
            y = solver(H, rhs + acc * jnp.float32(1e-9))
            return acc + y[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(seed) * 1e-6)

    def shift(r, k):
        return r + jnp.float32(k) * 1e-7

    loop(Hj, shift(rj, 0)).block_until_ready()
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        float(loop(Hj, shift(rj, rep + 1)))  # scalar readback fences
        best = min(best, time.perf_counter() - t0)
    return best


def solve_qr(H, rhs):
    Q, R = jnp.linalg.qr(H, mode="reduced")
    g = Q.T @ rhs
    return jax.scipy.linalg.solve_triangular(R, g, lower=False)


def solve_normal(H, rhs):
    G = H.T @ H
    c = H.T @ rhs
    L = jnp.linalg.cholesky(G)
    y = jax.scipy.linalg.solve_triangular(L, c, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def solve_qr_backsub(H, rhs):
    Q, R = jnp.linalg.qr(H, mode="reduced")
    g = Q.T @ rhs
    return back_substitute(R, g)


def main():
    rng = np.random.default_rng(5)
    print("m, library_us, givens_us, lstsq_us, qr_us, qr_backsub_us, normal_us")
    for m in (10, 20, 40, 60, 80, 100):
        H = np.triu(rng.standard_normal((m + 1, m)).astype(np.float32), -1)
        H[:m, :] += 4.0 * np.eye(m, dtype=np.float32)
        rhs = rng.standard_normal((m + 1,)).astype(np.float32)
        Hj, rj = jnp.asarray(H), jnp.asarray(rhs)
        rows = {}
        # "library" = its.hessenberg_lstsq auto dispatch (dense QR since r5);
        # "givens" = the reference-shaped sequential scan, forced
        rows["library"] = loop_time(
            lambda A, c: its.hessenberg_lstsq(A, c)[0], Hj, rj, 0)
        rows["givens"] = loop_time(
            lambda A, c: its.hessenberg_lstsq(A, c, method="givens")[0],
            Hj, rj, 1)
        rows["lstsq"] = loop_time(
            lambda A, c: jnp.linalg.lstsq(A, c)[0], Hj, rj, 2)
        rows["qr"] = loop_time(lambda A, c: solve_qr(A, c), Hj, rj, 3)
        rows["qrb"] = loop_time(lambda A, c: solve_qr_backsub(A, c), Hj, rj, 4)
        rows["normal"] = loop_time(lambda A, c: solve_normal(A, c), Hj, rj, 5)
        y_ref = jnp.linalg.lstsq(Hj, rj)[0]
        errs = {}
        for name, fn in (("qr", solve_qr), ("normal", solve_normal)):
            y = fn(Hj, rj)
            errs[name] = float(jnp.linalg.norm(y - y_ref)
                               / jnp.linalg.norm(y_ref))
        print(f"{m}, " + ", ".join(
            f"{1e6 * rows[k] / K:.1f}" for k in
            ("library", "givens", "lstsq", "qr", "qrb", "normal")),
            " errs:", {k: f"{v:.2e}" for k, v in errs.items()})


if __name__ == "__main__":
    main()
