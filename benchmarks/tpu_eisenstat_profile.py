"""Component profile of the EisenstatSSOROperator matvec at 216^3:
where do the 3.56 ms/iter (vs ~1.3 ms roofline estimate) go?
In-jit chained repeats (K=8, perturbed), scalar-readback fenced."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import iterativesolvers_tpu as its
from iterativesolvers_tpu.utils.fixtures import variable_diffusion

K = 8


def timeit(f, op, x, tag):
    """f(op, v) -> array; op is a pytree jit ARGUMENT (a closure would bake
    its 40 MB streams into the HLO as constants -> remote-compile 413)."""
    @jax.jit
    def loop(op, v):
        def body(i, u):
            # full-vector carry: every output element feeds the next rep,
            # so nothing is DCE-able; scale keeps values bounded
            return u * jnp.float32(0.25) + f(op, u) * jnp.float32(1e-4)
        return jax.lax.fori_loop(0, K, body, v).reshape(-1)[0]

    float(loop(op, x))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(op, x + jnp.float32(1e-6 * (r + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {1e6 * best / K:.1f} us")
    return best / K


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    A = variable_diffusion(side, 3, contrast=1e4, smooth=2, seed=7,
                           dtype=np.float32)
    n = A.shape[0]
    Ah = its.EisenstatSSOROperator.from_dia(A, side, 3)
    Prb = its.RedBlackICPreconditioner.from_dia(A, side, 3)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    print(f"n = {n}")
    timeit(lambda op, u: op.mv(u), A, v, "dia_mv_f32 (7 streams)")
    timeit(lambda op, u: op.mv_dot(u)[0] + op.mv_dot(u)[1], A, v,
           "dia_mv_dot")
    timeit(lambda op, u: op._shift_sum(u), Ah, v,
           "one shift_sum (6 scaled streams)")
    timeit(lambda op, u: op.mv(u), Ah, v, "eisenstat_mv (2 passes)")
    timeit(lambda op, u: op.ldiv(u), Prb, v, "rbic_ldiv")

    def pass1(op, u):
        return jnp.where(op.red, u - op._shift_sum(jnp.where(op.red, 0, u)),
                         u)

    timeit(pass1, Ah, v, "eis pass1 alone")
    timeit(lambda op, u: op._shift_sum(op._shift_sum(u)), Ah, v,
           "2 chained shift_sums, no selects")


if __name__ == "__main__":
    main()
